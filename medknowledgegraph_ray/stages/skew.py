"""Explicit skew defenses (SURVEY.md §4.2, §7.3).

Two complementary techniques, chosen per operator shape:

1. **Partial pre-aggregation** (the default, used throughout): for
   algebraic aggregates (count/sum/min/distinct) a per-block combiner means
   the exchange moves one row per key per block — a hot key's reduce load is
   #blocks, not #rows, so no salt is needed.  See `distinct.distinct`,
   `canonicalize.entity_counts`, `graph.dedup_nodes`.

2. **Salted two-phase grouped top-k** (this module): for holistic grouped
   operators (top-k) where one group can be corpus-scale, a single reducer
   per key melts at 10^12 rows.  Phase 1 groups on (key, salt) — salt
   derived deterministically from a spread column — and reduces each
   subgroup to k rows; phase 2 groups on key alone over ≤ k × SALT_BUCKETS
   rows per key.  Used by `ann.brute_force_topk`, whose per-query merge
   otherwise funnels k × #blocks partials into one reducer per query.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from .. import config


def salted_grouped_topk(
    ds: rd.Dataset,
    key: str,
    salt_from: str,
    pick,
    *,
    final=None,
    salt_buckets: int = config.SALT_BUCKETS,
) -> rd.Dataset:
    """Two-phase grouped top-k with salted first phase.

    `pick(df) -> df` reduces one group's rows to its top-k (must be
    idempotent and associative-by-restriction: pick(pick(a)+pick(b)) ==
    pick(a+b), which any sorted head-k with a total order satisfies).
    `salt_from` is an int64 column whose modulo spreads the hot key.
    `final` (default `pick`) runs in phase 2 — use it to attach rank or
    other finalization to the winning rows.
    """
    final = final or pick

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_salt"] = (df[salt_from].astype("int64") % salt_buckets).astype("int32")
        return df

    def pick_drop_salt(df: pd.DataFrame) -> pd.DataFrame:
        return pick(df).drop(columns=["_salt"])

    phase1 = (
        ds.map_batches(add_salt, batch_format="pandas")
        .groupby([key, "_salt"])
        .map_groups(pick_drop_salt, batch_format="pandas")
    )
    return phase1.groupby(key).map_groups(final, batch_format="pandas")


def partial_topk_pandas(ds, pick):
    """Global top-k funnel: apply `pick` (a sorted head-k under a TOTAL
    order — restriction-exact, so pick(pick(a)+pick(b)) == pick(a+b)) per
    block, then once more over the O(blocks·k) survivors driver-side.
    The pushdown shape shared by top_customers / top_bigrams /
    sample_exact_k; never a whole-corpus sort or driver pull."""
    partial = ds.map_batches(pick, batch_format="pandas", batch_size=None).to_pandas()
    return pick(partial).reset_index(drop=True)
