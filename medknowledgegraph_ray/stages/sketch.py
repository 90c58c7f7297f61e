"""Mergeable-sketch operators: cardinality estimation without a shuffle.

At 100 TB an exact corpus-wide distinct count (vocabulary size, unique
users, unique URLs) costs a full all-to-all exchange of every key.  A
HyperLogLog sketch replaces that with a MAP-ONLY pass: each block folds its
tokens into a 2^p-byte register array, the per-block partials flow to the
driver (block-count rows × 16 KB at p=14 — bounded by block count, not
data), and an elementwise max merges them.  Standard error ≈ 1.04/√(2^p)
(~0.8 % at p=14); the estimate is DETERMINISTIC (md5 token hashing, no
seed), so runs/partitionings/cluster sizes all report the same number.

The exact companion (`distinct_token_count`) runs the sorted-exchange
distinct (stages/distinct.py) and is the DuckDB-oracle-checked baseline;
tests assert the sketch lands within its error envelope of the exact count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import text as textfn
from .. import config


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction; no large-range correction needed for 64-bit hashes."""
    m = regs.size
    e = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return float(e)


class HllTokenSketch:
    """Per-batch HLL partial over the distinct tokens of `text` rows.

    Emits ONE row per batch: the 2^p uint8 register array.  Token → (register
    index, rank) is cached per worker instance (the Fingerprinter pattern);
    duplicate tokens within a batch cost one set lookup, not a hash."""

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self._cache: dict[str, tuple[int, int]] = {}

    # Cache insertions stop here: a long-lived worker otherwise accumulates
    # a vocabulary-sized dict (unbounded per-worker growth at corpus scale);
    # past the cap, misses just hash — same 2M-entry gating idea as
    # config.VOCAB_BROADCAST_MAX.
    CACHE_MAX = 2_000_000

    def _slot(self, tok: str) -> tuple[int, int]:
        s = self._cache.get(tok)
        if s is None:
            h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
            idx = h >> (64 - self.p)
            w = h & ((1 << (64 - self.p)) - 1)
            rho = (64 - self.p) - w.bit_length() + 1
            s = (idx, rho)
            if len(self._cache) < self.CACHE_MAX:
                self._cache[tok] = s
        return s

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(self.m, dtype=np.uint8)
        toks: set[str] = set()
        for text in batch["text"].fillna(""):
            toks.update(textfn.TOKEN_RE.findall(text.lower()))
        for tok in toks:
            idx, rho = self._slot(tok)
            if rho > regs[idx]:
                regs[idx] = rho
        return pd.DataFrame({"regs": [regs.astype(np.int64)]})


def distinct_token_count_hll(docs: rd.Dataset, p: int = 14) -> pd.DataFrame:
    """Approximate corpus vocabulary size — one map pass, no shuffle.

    Returns a 1-row frame {n_distinct_tokens_hll, n_registers}; rows-only
    checked (approximate by design) with the error-envelope pytest."""
    partials = docs.map_batches(
        HllTokenSketch(p=p), batch_format="pandas", batch_size=None
    ).take_all()
    regs = np.zeros(1 << p, dtype=np.uint8)
    for row in partials:
        np.maximum(regs, np.asarray(row["regs"], dtype=np.uint8), out=regs)
    return pd.DataFrame(
        {
            "n_distinct_tokens_hll": pd.array([int(round(hll_estimate(regs)))], dtype="int64"),
            "n_registers": pd.array([1 << p], dtype="int64"),
        }
    )


def distinct_token_count(docs: rd.Dataset) -> pd.DataFrame:
    """Exact vocabulary size: per-block distinct tokens (flat map) → the
    sorted-exchange distinct → count.  The oracle-checked baseline the HLL
    sketch is judged against."""
    from .distinct import distinct

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        out: set[str] = set()
        for text in batch["text"].fillna(""):
            out.update(textfn.TOKEN_RE.findall(text.lower()))
        return pd.DataFrame({"tok": sorted(out)})

    uniq = distinct(
        docs.map_batches(toks, batch_format="pandas", batch_size=None), ["tok"]
    )
    return pd.DataFrame(
        {"n_distinct_tokens": pd.array([uniq.count()], dtype="int64")}
    )


# flat driver gathers above this many summary points route through one
# hierarchical re-compaction pass (costing one extra N/compactor of
# one-sided rank error) so driver state stays bounded at any block count
DRIVER_SUMMARY_MAX = config.gate(1_000_000)


def quantile_sketch(
    ds: rd.Dataset, col: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    compactor: int = 512,
) -> pd.DataFrame:
    """Approximate global quantiles in ONE map-only pass — the shuffle-free
    companion to the exact distributed-selection quantiles
    (stages/selection.exact_quantiles), for when one pass over 100 TB is
    the budget.

    Per block: sort locally, keep `compactor` evenly-spaced order
    statistics, each carrying weight n_block/compactor (max always kept,
    weight-exact: the weights sum to exactly n_block).  Driver: weighted
    lower-quantile over the O(blocks × compactor) summary points.  Each
    statistic is the MAXIMUM of the rank range it covers, so the rank error
    is one-sided and ≤ n_block/compactor per block → ≤ N/compactor
    globally — a ≤0.2 % rank band at compactor=512.
    Deterministic for a fixed partitioning; across partitionings the
    estimate moves only within the band (tested against the exact
    selection)."""

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(b[col].to_numpy())
        n = len(v)
        if n == 0:
            return pd.DataFrame(
                {"v": pd.array([], dtype="float64"),
                 "w": pd.array([], dtype="int64")}
            )
        c = min(compactor, n)
        idx = np.minimum((np.arange(1, c + 1) * n) // c - 1, n - 1)
        # weights = rank gaps between kept statistics: sum is exactly n,
        # and statistic i covers exactly the rows ranked (idx[i-1], idx[i]]
        w = np.diff(np.concatenate([[-1], idx])).astype(np.int64)
        return pd.DataFrame(
            {
                "v": pd.array(v[idx].astype(np.float64), dtype="float64"),
                "w": pd.array(w, dtype="int64"),
            }
        )

    def compact(b: pd.DataFrame) -> pd.DataFrame:
        """Re-compact a batch of weighted summary points to `compactor`
        points — the hierarchical combine step.  Same one-sided rule: each
        kept point is the max of the weight range it absorbs, adding at
        most (batch weight)/compactor of one-sided rank error."""
        if len(b) <= compactor:
            return b
        b = b.sort_values("v", kind="mergesort")
        cw = b["w"].to_numpy().cumsum()
        total = cw[-1]
        targets = np.minimum((np.arange(1, compactor + 1) * total) // compactor, total)
        idx = np.searchsorted(cw, targets, side="left")
        idx = np.unique(idx)
        kept_cw = cw[idx]
        w = np.diff(np.concatenate([[0], kept_cw])).astype(np.int64)
        return pd.DataFrame(
            {
                "v": pd.array(b["v"].to_numpy()[idx], dtype="float64"),
                "w": pd.array(w, dtype="int64"),
            }
        )

    summaries = ds.map_batches(
        summarize, batch_format="pandas", batch_size=None
    ).materialize()  # small (blocks × compactor rows); count() is metadata
    # hierarchical combine: at 100 TB the flat gather is blocks × compactor
    # rows (10⁵ blocks → ~5·10⁷ points) — too much driver state.  One
    # repartition + per-partition re-compaction bounds the gather at
    # partitions × compactor for one extra N/compactor of one-sided error.
    if summaries.count() > DRIVER_SUMMARY_MAX:
        summaries = summaries.repartition(32).map_batches(
            compact, batch_format="pandas", batch_size=None
        )
    summ = summaries.to_pandas()
    if len(summ) == 0:
        return pd.DataFrame(
            {"q": pd.array(list(qs), dtype="float64"),
             "estimate": pd.array([np.nan] * len(qs), dtype="float64")}
        )
    summ = summ.sort_values("v", kind="mergesort")
    cw = summ["w"].to_numpy().cumsum()
    total = int(cw[-1])
    vals = summ["v"].to_numpy()
    est = [float(vals[np.searchsorted(cw, max(1, int(np.ceil(q * total))))])
           for q in qs]
    return pd.DataFrame(
        {
            "q": pd.array(list(qs), dtype="float64"),
            "estimate": pd.array(est, dtype="float64"),
        }
    )


def grouped_distinct_hll(
    ds: rd.Dataset, group_col: str, val_col: str, p: int = 12
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT val) per group as a mergeable grouped
    HLL — distinct users per event type at corpus scale without shuffling
    the (group, user) key space.

    Scale shape: int64 values hash via the vectorized splitmix64 finalizer
    (no per-row Python); each block folds to AT MOST |groups|·2^p
    (group, register, rho) rows via one pandas groupby-max — bounded by
    group cardinality, never by data; the distributed merge is the
    algebraic grouped_agg MAX; the driver gathers |groups|·2^p final
    register rows and applies the standard estimator per group.
    Deterministic (unseeded mix), so every partitioning and cluster size
    reports the same numbers.  Intended for BOUNDED group cardinality
    (event types, languages, shards) — a corpus-cardinality group column
    belongs on the exact sorted-exchange distinct instead."""
    from .groupagg import grouped_agg
    from .shuffle import _mix64

    m = 1 << p
    shift = np.uint64(64 - p)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                group_col: pd.Series([], dtype="object"),
                "reg": pd.array([], dtype="int64"),
                "rho": pd.array([], dtype="int64"),
            })
        h = _mix64(b[val_col].to_numpy().astype(np.int64).astype(np.uint64))
        reg = (h >> shift).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad the tail
        # rho = exact leading-zero count + 1 (branchless binary CLZ —
        # float log2 misrounds just below powers of two)
        lead = np.zeros(len(rest), dtype=np.int64)
        cur = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            top_clear = cur < (np.uint64(1) << np.uint64(64 - s))
            lead[top_clear] += s
            cur[top_clear] = cur[top_clear] << np.uint64(s)
        rho = np.minimum(lead + 1, 64 - p + 1)
        df = pd.DataFrame({
            group_col: b[group_col].to_numpy(),
            "reg": pd.array(reg, dtype="int64"),
            "rho": pd.array(rho, dtype="int64"),
        })
        return df.groupby([group_col, "reg"], as_index=False, sort=False)["rho"].max()

    merged = grouped_agg(
        ds.select_columns([group_col, val_col]).map_batches(
            partial, batch_format="pandas", batch_size=None
        ),
        [group_col, "reg"], [("rho", "max", "rho")],
    ).to_pandas()  # ≤ |groups| · 2^p rows
    out_groups, out_counts = [], []
    for g, gdf in merged.groupby(group_col, sort=True):
        regs = np.zeros(m, dtype=np.uint8)
        regs[gdf["reg"].to_numpy()] = gdf["rho"].to_numpy().astype(np.uint8)
        out_groups.append(g)
        out_counts.append(int(round(hll_estimate(regs))))
    return pd.DataFrame({
        group_col: pd.Series(out_groups, dtype="object"),
        "approx_distinct": pd.array(out_counts, dtype="int64"),
    })
