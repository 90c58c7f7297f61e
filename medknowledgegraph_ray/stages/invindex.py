"""Inverted-index build: token → sorted posting list of doc ids.

The search-index / lexical-retrieval sink of a training-data pipeline.
Scale shape — the same sorted exchange every distinct/grouped operator here
rides, with the posting CONCATENATION done per block, not per group:

- per input block, emit the distinct (tok, doc_id) pairs (a set per doc —
  duplicate occurrences never leave the map task);
- ONE global sort on (tok, doc_id);
- per sorted block, drop adjacent duplicate pairs and fold every interior
  token's run into its posting string in a single pandas groupby-agg (work
  is per BLOCK and parallel — no per-group task overhead);
- only the ≤2 tokens straddling a block edge are re-folded per token.

Postings are comma-joined ascending doc ids (deterministic, SQL-checkable
via string_agg); a production variant would emit list<int64> + delta
encoding, same exchange.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


from ..functions import text as textfn

_OUT = ["tok", "n_docs", "postings"]

# every block in this plan is Arrow with this exact metadata-free schema —
# pandas-format blocks here would re-enter Arrow via pa.Table.from_pandas
# inside the groupby/sort reduce, whose b'pandas' metadata makes pa.Schema
# unhashable and logs a schema-dedup warning per reduce task
_OUT_SCHEMA = pa.schema(
    [("tok", pa.string()), ("n_docs", pa.int64()), ("postings", pa.string())]
)


def _out_table(df: pd.DataFrame) -> pa.Table:
    return pa.table(
        {
            "tok": pa.array(df["tok"], pa.string()),
            "n_docs": pa.array(df["n_docs"].to_numpy(), pa.int64()),
            "postings": pa.array(df["postings"], pa.string()),
        }
    )


def _sort_blocks() -> int:
    from .. import config

    return config.sort_blocks()


def _fold_sorted(df: pd.DataFrame) -> pd.DataFrame:
    """Fold a frame sorted by (tok, doc_id), already pair-deduped, into one
    row per token."""
    g = df.groupby("tok", sort=False)["doc_id"]
    out = g.agg(lambda s: ",".join(map(str, s))).rename("postings").reset_index()
    out["n_docs"] = g.size().to_numpy().astype("int64")
    return out[_OUT]


def inverted_index(docs: rd.Dataset) -> rd.Dataset:
    """documents(doc_id, text) → (tok, n_docs, postings) — one row per
    distinct token with its ascending doc-id posting list."""

    def pairs(batch: pd.DataFrame) -> pa.Table:
        toks: list[str] = []
        ids: list[int] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            uniq = set(textfn.TOKEN_RE.findall(text.lower()))
            toks.extend(uniq)
            ids.extend([int(doc_id)] * len(uniq))
        return pa.table(
            {"tok": pa.array(toks, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )

    s = docs.map_batches(pairs, batch_format="pandas", batch_size=None).repartition(
        _sort_blocks()
    ).sort(["tok", "doc_id"])

    _flag_schema = pa.schema(
        list(_OUT_SCHEMA)
        + [pa.field("doc_id", pa.int64()), pa.field("is_edge", pa.bool_())]
    )

    def split(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _flag_schema.empty_table()
        # adjacent-duplicate drop (global sort ⇒ equal pairs are adjacent
        # within a block; cross-block duplicates belong to edge tokens,
        # which are re-folded from raw pairs anyway)
        t = df["tok"].to_numpy()
        d = df["doc_id"].to_numpy()
        keep = pd.Series([True] * len(df))
        keep[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
        df = df[keep.to_numpy()]
        t = df["tok"].to_numpy()
        edge_mask = (t == t[0]) | (t == t[-1])
        interior = _fold_sorted(df[~edge_mask])
        n_i, n_e = len(interior), int(edge_mask.sum())
        edge = df[edge_mask]
        return pa.table(
            {
                "tok": pa.array(
                    list(interior["tok"]) + list(edge["tok"]), pa.string()
                ),
                "n_docs": pa.array(
                    list(interior["n_docs"]) + [0] * n_e, pa.int64()
                ),
                "postings": pa.array(
                    list(interior["postings"]) + [""] * n_e, pa.string()
                ),
                "doc_id": pa.array(
                    [0] * n_i + list(edge["doc_id"]), pa.int64()
                ),
                "is_edge": pa.array([False] * n_i + [True] * n_e, pa.bool_()),
            }
        )

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    interior = flagged.filter(expr="is_edge == False").select_columns(_OUT)

    def edge_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["tok", "doc_id"]).sort_values("doc_id", kind="mergesort")
        return _fold_sorted(g)

    from .windows import EDGE_REPAIR_DRIVER_MAX

    edge_src = (
        flagged.filter(expr="is_edge == True")
        .select_columns(["tok", "doc_id"])
        .materialize()
    )
    if edge_src.count() <= EDGE_REPAIR_DRIVER_MAX:
        # size-gated driver-side repair — saves the groupby exchange
        # (windows._sorted_user_op pattern)
        edf = edge_src.to_pandas()
        outs = [edge_fold(g) for _, g in edf.groupby("tok", sort=False)] if len(edf) else []
        outs = [o for o in outs if len(o)]
        if not outs:
            return interior
        rep = pd.concat(outs, ignore_index=True)
        return interior.union(rd.from_arrow(_out_table(rep)))
    edges = edge_src.groupby("tok").map_groups(
        lambda g: _out_table(edge_fold(g)), batch_format="pandas"
    )
    return interior.union(edges)


def top_bigrams(docs: rd.Dataset, k: int = 20) -> pd.DataFrame:
    """Corpus-wide top-k token bigrams by count (ties broken by bigram
    text) — the n-gram language-model / collocation-mining primitive.

    Scale shape: per-batch bigram emission (pandas explode + within-doc
    shift, no per-row Python), the algebraic grouped_agg exchange for the
    global counts (one row per bigram per block crosses the wire), then a
    per-block partial top-k under the same (count desc, bigram asc) total
    order before a driver merge of the O(blocks·k) survivors — the
    top_customers pushdown shape, never a whole-vocabulary pull."""
    import re

    import numpy as np

    token_run = re.compile(r"\S+", re.ASCII)

    def bigram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("").str.lower()
        toks = text.str.findall(token_run)
        n = toks.str.len().to_numpy()
        reps = np.maximum(n - 1, 0)
        if not int(reps.sum()):
            return pd.DataFrame({"bigram": pd.Series([], dtype="object"),
                                 "one": pd.array([], dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
        starts = np.cumsum(np.concatenate([[0], n[:-1]]))
        idx = np.concatenate(
            [np.arange(s, s + r) for s, r in zip(starts, reps) if r]
        )
        lefts = flat[idx]
        rights = flat[idx + 1]
        big = pd.Series(lefts, dtype="object") + " " + pd.Series(rights, dtype="object")
        return pd.DataFrame(
            {"bigram": big, "one": pd.array(np.ones(len(big), dtype=np.int64), dtype="int64")}
        )

    from .groupagg import grouped_agg

    counts = grouped_agg(
        docs.select_columns(["doc_id", "text"]).map_batches(
            bigram_rows, batch_format="pandas", batch_size=None
        ),
        ["bigram"],
        [("one", "sum", "n")],
    )

    from .skew import partial_topk_pandas

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "bigram"], ascending=[False, True],
                             kind="mergesort").head(k)

    return partial_topk_pandas(counts, pick)


def collocations(docs: rd.Dataset, min_count: int = 5, k: int = 50) -> pd.DataFrame:
    """Top-k corpus bigrams by count with integer-exact PMI inputs and
    pmi_e6 = round(ln((n_xy·N) / (n_x·n_y)) · 1e6) — the collocation-
    extraction primitive (Church & Hanks pointwise mutual information)
    over whitespace tokens.

    Scale shape: ONE tokenization pass emits bigram rows, unigram rows and
    per-block token totals; bigram and unigram counts ride separate
    algebraic grouped_agg exchanges (vocab-sized, never driver-pulled);
    the top-k pick is the restriction-exact partial funnel; only the ≤2k
    winner tokens' unigram counts are gathered (a distributed isin filter,
    then a ≤2k-row pull).  The ln argument is formed as
    float(int)/float(int) — the same double-division DuckDB performs — and
    math.log is the same libm call as DuckDB ln(), so pmi_e6 is
    oracle-exact (the doc_tfidf idf precedent)."""
    import math
    import re

    import numpy as np

    from .groupagg import grouped_agg
    from .skew import partial_topk_pandas

    token_run = re.compile(r"\S+", re.ASCII)

    def token_rows(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("").str.lower()
        toks = text.str.findall(token_run)
        n = toks.str.len().to_numpy()
        total = int(n.sum())
        if not total:
            return pd.DataFrame({
                "key": pd.Series([], dtype="object"),
                "kind": pd.array([], dtype="int8"),
                "one": pd.array([], dtype="int64"),
            })
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
        reps = np.maximum(n - 1, 0)
        starts = np.cumsum(np.concatenate([[0], n[:-1]]))
        idx = np.concatenate(
            [np.arange(s, s + r) for s, r in zip(starts, reps) if r]
        ) if int(reps.sum()) else np.array([], dtype=np.int64)
        big = (
            pd.Series(flat[idx], dtype="object")
            + " "
            + pd.Series(flat[idx + 1], dtype="object")
        )
        keys = np.concatenate([flat, np.asarray(big, dtype=object),
                               np.array(["\x00total"], dtype=object)])
        kind = np.concatenate([
            np.zeros(len(flat), dtype=np.int8),        # unigram
            np.ones(len(big), dtype=np.int8),          # bigram
            np.full(1, 2, dtype=np.int8),              # block token total
        ])
        one = np.concatenate([
            np.ones(len(flat) + len(big), dtype=np.int64),
            np.array([total], dtype=np.int64),
        ])
        return pd.DataFrame({
            "key": pd.Series(keys, dtype="object"),
            "kind": pd.array(kind, dtype="int8"),
            "one": pd.array(one, dtype="int64"),
        })

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        token_rows, batch_format="pandas", batch_size=None
    )
    counts = grouped_agg(rows, ["key", "kind"], [("one", "sum", "n")]).materialize()
    n_tokens = int(
        counts.filter(expr="kind == 2").to_pandas()["n"].sum()  # 1 row
    )
    big = counts.filter(expr="kind == 1").filter(expr=f"n >= {int(min_count)}")

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "key"], ascending=[False, True],
                             kind="mergesort").head(k)

    top = partial_topk_pandas(big, pick)
    if len(top) == 0:
        return pd.DataFrame({
            "bigram": pd.Series([], dtype="object"),
            "n_xy": pd.array([], dtype="int64"),
            "n_x": pd.array([], dtype="int64"),
            "n_y": pd.array([], dtype="int64"),
            "n_tokens": pd.array([], dtype="int64"),
            "pmi_e6": pd.array([], dtype="int64"),
        })
    want = sorted({t for bg in top["key"] for t in bg.split(" ", 1)})
    uni = counts.filter(expr="kind == 0").map_batches(
        lambda b: b[b["key"].isin(want)], batch_format="pandas", batch_size=None
    ).to_pandas()  # ≤ 2k rows survive the distributed filter
    ucnt = dict(zip(uni["key"], uni["n"].astype("int64")))
    n_xy = top["n"].astype("int64").to_numpy()
    n_x = np.array([ucnt[bg.split(" ", 1)[0]] for bg in top["key"]], dtype=np.int64)
    n_y = np.array([ucnt[bg.split(" ", 1)[1]] for bg in top["key"]], dtype=np.int64)
    # double products, not int64 (n_xy·N overflows int64 at corpus scale);
    # op order mirrors the oracle's CAST(..AS DOUBLE) multiply/divide chain
    pmi = [
        int(round(math.log((float(a) * float(n_tokens)) / (float(b) * float(c))) * 1e6))
        for a, b, c in zip(n_xy.tolist(), n_x.tolist(), n_y.tolist())
    ]
    return pd.DataFrame({
        "bigram": pd.Series(list(top["key"]), dtype="object"),
        "n_xy": pd.array(n_xy, dtype="int64"),
        "n_x": pd.array(n_x, dtype="int64"),
        "n_y": pd.array(n_y, dtype="int64"),
        "n_tokens": pd.array(np.full(len(top), n_tokens, dtype=np.int64), dtype="int64"),
        "pmi_e6": pd.array(pmi, dtype="int64"),
    })
