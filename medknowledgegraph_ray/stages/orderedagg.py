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
        # re-sort the gathered rows, then fold once driver-side
        rep = fold(edf.sort_values([key, *order_cols], kind="mergesort"))
        return _literal_union(interior, rep)

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

    def edge_first(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(order_cols, kind="mergesort").head(k)
        if count_col:
            out = out.assign(**{count_col: pd.array([len(g)] * len(out), dtype="int64")})
        return out

    return interior.union(
        edge_src.groupby(group_col).map_groups(edge_first, batch_format="pandas")
    )


def seg_dedup(docs: rd.Dataset, seg_words: int = 15) -> rd.Dataset:
    """Corpus-wide segment-level exact dedup: split each document's text
    into `seg_words`-word segments, keep only each distinct segment's first
    occurrence (min (doc_id, seg_idx) across the corpus), re-assemble the
    survivors per document.  Documents whose every segment appeared earlier
    vanish; the rest shrink.  Returns (doc_id, n_kept, text)."""

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

    segs = docs.select_columns(["doc_id", "text"]).map_batches(
        segments, batch_format="pandas", batch_size=None
    )
    firsts = keep_first(segs, "seg", "packed")

    def unpack(batch: pd.DataFrame) -> pd.DataFrame:
        p = batch["packed"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": pd.array(p >> _PACK_BITS, dtype="int64"),
                "seg_idx": pd.array(p & ((1 << _PACK_BITS) - 1), dtype="int64"),
                "seg": batch["seg"],
            }
        )

    kept = firsts.map_batches(unpack, batch_format="pandas")
    return ordered_concat(
        kept, "doc_id", ["seg_idx"], "seg", " ", out_col="text", count_col="n_kept"
    )


def dup_span_coverage(docs: rd.Dataset, win_words: int = 10) -> rd.Dataset:
    """Per-document duplicated-span coverage — the ExactSubstr diagnostic of
    suffix-array training-data dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"), re-expressed on the repo's
    exchanges: emit every OVERLAPPING `win_words`-token window, find the
    windows whose text occurs ≥2 times anywhere in the corpus (one
    string-keyed ordered scan — the global sort is the suffix-array analog),
    then per document take the interval UNION of its duplicated windows
    [pos, pos + W) (equal-length sweep line: positions ascend, so an island
    breaks exactly when the gap to the previous start is ≥ W, and covers
    last − first + W tokens).  Returns one row per document
    (doc_id, n_tokens, dup_tokens) — all-integer exact, any block split.

    Scale notes: the window exchange is corpus × W bytes — the inherent
    ExactSubstr blow-up; at 100 TB you'd sort 64-bit window fingerprints and
    re-verify the string per run (identical semantics, ~W× fewer exchange
    bytes).  Both scans ride _sorted_user_op's size-gated edge repair;
    nothing ever materializes per group, and the final per-doc attach is the
    unique-keyed sorted-merge join."""
    import pyarrow.compute as pc

    from .join import equi_join
    from .windows import _run_firsts, _sorted_user_op

    def windows_of(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        poss: list[int] = []
        wins: list[str] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = text.split(" ")
            for j in range(len(toks) - win_words + 1):
                ids.append(int(doc_id))
                poss.append(j + 1)  # 1-based, mirrors the SQL list index
                wins.append(" ".join(toks[j : j + win_words]))
        return pd.DataFrame(
            {
                "win": pd.Series(wins, dtype="object"),
                "doc_id": pd.array(ids, dtype="int64"),
                "pos": pd.array(poss, dtype="int64"),
            }
        )

    wins = docs.select_columns(["doc_id", "text"]).map_batches(
        windows_of, batch_format="pandas", batch_size=None
    )

    def dup_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64"),
                 "pos": pd.array([], dtype="int64")}
            )
        new, _ = _run_firsts(df["win"].to_numpy())
        idx = np.cumsum(new) - 1
        sizes = np.bincount(idx)
        keep = sizes[idx] >= 2
        return pd.DataFrame(
            {
                "doc_id": pd.array(df["doc_id"].to_numpy()[keep], dtype="int64"),
                "pos": pd.array(df["pos"].to_numpy()[keep], dtype="int64"),
            }
        )

    dup = _sorted_user_op(
        wins, ["win", "doc_id", "pos"], ["win", "doc_id", "pos"],
        [False, False, False], dup_kernel,
        {"doc_id": "int64", "pos": "int64"}, key="win",
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

    cov = _sorted_user_op(
        dup, ["doc_id", "pos"], ["doc_id", "pos"], [False, False],
        cov_kernel, {"doc_id": "int64", "dup_tokens": "int64"}, key="doc_id",
    )

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
