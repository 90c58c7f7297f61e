"""Misra-Gries heavy hitters: EXACT top-k token counts without a
vocabulary-wide shuffle.

At 100 TB the corpus vocabulary is billions of distinct tokens; an exact
top-k via ``groupby(token)`` ships every one of them through an all-to-all
exchange.  The Misra-Gries / Space-Saving summary replaces that exchange
with a MAP-ONLY candidate pass (Misra & Gries 1982; Agarwal et al.,
"Mergeable Summaries", PODS 2012):

1. each block folds its tokens into an exact per-block counter, then
   PRUNES it to the summary capacity C — subtract the (C+1)-th largest
   count from every entry and keep the positives (the mergeable-MG prune);
2. the per-block summaries (≤ C entries each, O(blocks × C) total driver
   volume — bounded by block count, never by vocabulary) fold together on
   the driver by counter addition, re-pruning whenever the fold exceeds
   2C; every prune's subtracted amount accumulates into ``err``;
3. the MG guarantee after any prune sequence: ``true(t) − err ≤ stored(t)
   ≤ true(t)``, so every token whose true count exceeds ``err`` SURVIVES —
   the survivors are a superset of every sufficiently-frequent token;
4. a second map-only pass recounts ONLY the survivors exactly (per-block
   counter restricted to the broadcast candidate list → one int64 vector
   per block, driver-summed), and the SEPARATION CHECK proves the result:
   the k-th exact candidate count must exceed ``err`` (the maximum
   possible true count of any non-candidate).  A corpus too flat for the
   capacity fails the check LOUDLY and falls back to the exact
   sorted-exchange groupby (`top_bigrams`' shape) — never a silently
   wrong top-k.

The sketch only nominates candidates; the published counts are exact, so
the operator is oracle-checked against a plain GROUP BY top-k
(reference analog: the entity-frequency funnel,
pymedgraph/dataextraction/datastruct/graph.py's count-then-rank — here
made shuffle-free).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions import text as textfn

MG_CAPACITY = 4096


def _prune(cnt: Counter, cap: int) -> tuple[Counter, int]:
    """Mergeable-MG prune: keep the top `cap` entries after subtracting the
    (cap+1)-th largest count from all.  Returns (pruned, subtracted)."""
    if len(cnt) <= cap:
        return cnt, 0
    counts = sorted(cnt.values(), reverse=True)
    d = counts[cap]
    pruned = Counter({t: c - d for t, c in cnt.items() if c > d})
    return pruned, d


class _BlockSummary:
    """Per-block exact counter → MG prune; emits ONE summary row per block
    (token list, residual-count list, subtracted amount)."""

    def __init__(self, cap: int = MG_CAPACITY):
        self.cap = cap

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for text in batch["text"].fillna(""):
            cnt.update(textfn.TOKEN_RE.findall(text.lower()))
        pruned, d = _prune(cnt, self.cap)
        toks = sorted(pruned)
        return pd.DataFrame(
            {
                "toks": [toks],
                "counts": [np.array([pruned[t] for t in toks], dtype=np.int64)],
                "subtracted": pd.array([d], dtype="int64"),
            }
        )


class _CandidateRecount:
    """Exact per-block counts restricted to the broadcast candidate list —
    one int64 vector per block crosses the wire (O(blocks × C), not
    O(vocabulary))."""

    def __init__(self, cand_ref):
        self.cand_ref = cand_ref
        self._index: dict[str, int] | None = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._index is None:
            cand = ray.get(self.cand_ref)  # plasma-cached after first batch
            self._index = {t: i for i, t in enumerate(cand)}
        vec = np.zeros(len(self._index), dtype=np.int64)
        cnt: Counter = Counter()
        for text in batch["text"].fillna(""):
            cnt.update(textfn.TOKEN_RE.findall(text.lower()))
        for tok, c in cnt.items():
            i = self._index.get(tok)
            if i is not None:
                vec[i] += c
        return pd.DataFrame({"partial": [vec]})


def _exact_topk(docs: rd.Dataset, k: int) -> pd.DataFrame:
    """Exact fallback: token rows → algebraic grouped count → partial
    top-k merge (the `top_bigrams` shape) — correct at any flatness, at
    the cost of the vocabulary-wide exchange the sketch path avoids."""
    from .groupagg import grouped_agg
    from .skew import partial_topk_pandas

    def token_rows(batch: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for text in batch["text"].fillna(""):
            cnt.update(textfn.TOKEN_RE.findall(text.lower()))
        toks = sorted(cnt)
        return pd.DataFrame(
            {
                "token": pd.Series(toks, dtype="object"),
                "one": pd.array([cnt[t] for t in toks], dtype="int64"),
            }
        )

    counts = grouped_agg(
        docs.select_columns(["text"]).map_batches(
            token_rows, batch_format="pandas", batch_size=None
        ),
        ["token"],
        [("one", "sum", "n")],
    )

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "token"], ascending=[False, True],
                             kind="mergesort").head(k)

    return partial_topk_pandas(counts, pick).reset_index(drop=True)


def top_tokens_mg(docs: rd.Dataset, k: int = 20, cap: int = MG_CAPACITY) -> pd.DataFrame:
    """Exact top-k (token, n) by corpus frequency, candidates via a
    Misra-Gries sketch — two map-only passes, no token shuffle.

    Falls back to the exact distributed groupby when the separation check
    cannot prove the sketch's candidate set covers the true top-k."""
    # consumed twice: the two passes re-execute the (column-pruned) read
    # rather than materialize() — pinning the corpus text column in the
    # object store is the wrong trade at 100 TB
    docs = docs.select_columns(["text"])
    summaries = docs.map_batches(
        _BlockSummary(cap), batch_format="pandas", batch_size=None
    ).take_all()

    merged: Counter = Counter()
    err = 0
    for row in summaries:
        err += int(row["subtracted"])
        for t, c in zip(row["toks"], row["counts"]):
            merged[t] += int(c)
        if len(merged) > 2 * cap:
            merged, d = _prune(merged, cap)
            err += d

    cand = sorted(merged)
    if len(cand) < k:
        return _exact_topk(docs, k)

    cand_ref = ray.put(cand)
    partials = docs.map_batches(
        _CandidateRecount(cand_ref), batch_format="pandas", batch_size=None
    ).take_all()
    total = np.zeros(len(cand), dtype=np.int64)
    for row in partials:
        total += np.asarray(row["partial"], dtype=np.int64)

    exact = pd.DataFrame({"token": pd.Series(cand, dtype="object"),
                          "n": pd.array(total, dtype="int64")})
    exact = exact.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
    kth = int(exact["n"].iloc[k - 1])
    if kth <= err:
        # a non-candidate could have true count up to `err` ≥ kth —
        # the sketch cannot certify this top-k; pay the exact exchange
        return _exact_topk(docs, k)
    return exact.head(k).reset_index(drop=True)
