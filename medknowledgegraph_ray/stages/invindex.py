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
import ray.data as rd

from ..functions import text as textfn

_OUT = ["tok", "n_docs", "postings"]


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

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        ids: list[int] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            uniq = set(textfn.TOKEN_RE.findall(text.lower()))
            toks.extend(uniq)
            ids.extend([int(doc_id)] * len(uniq))
        return pd.DataFrame(
            {"tok": pd.Series(toks, dtype="object"), "doc_id": pd.array(ids, dtype="int64")}
        )

    s = docs.map_batches(pairs, batch_format="pandas", batch_size=None).sort(
        ["tok", "doc_id"]
    )

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "tok": pd.Series([], dtype="object"),
                    "n_docs": pd.array([], dtype="int64"),
                    "postings": pd.Series([], dtype="object"),
                    "doc_id": pd.array([], dtype="int64"),
                    "is_edge": pd.array([], dtype="bool"),
                }
            )
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
        interior = _fold_sorted(df[~edge_mask]).assign(
            doc_id=lambda x: pd.array([0] * len(x), dtype="int64"),
            is_edge=lambda x: pd.array([False] * len(x), dtype="bool"),
        )
        edge = df[edge_mask].assign(
            n_docs=pd.array([0] * int(edge_mask.sum()), dtype="int64"),
            postings=pd.Series([""] * int(edge_mask.sum()), dtype="object", index=df[edge_mask].index),
            is_edge=pd.array([True] * int(edge_mask.sum()), dtype="bool"),
        )
        cols = _OUT + ["doc_id", "is_edge"]
        return pd.concat([interior[cols], edge[cols]], ignore_index=True)

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda b: b[_OUT], batch_format="pandas"
    )

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
        import pyarrow as pa
        import ray.data as _rd

        edf = edge_src.to_pandas()
        outs = [edge_fold(g) for _, g in edf.groupby("tok", sort=False)] if len(edf) else []
        outs = [o for o in outs if len(o)]
        if not outs:
            return interior
        rep = pd.concat(outs, ignore_index=True)
        return interior.union(_rd.from_arrow(
            pa.Table.from_pandas(rep, preserve_index=False).replace_schema_metadata(None)
        ))
    edges = edge_src.groupby("tok").map_groups(edge_fold, batch_format="pandas")
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
