"""Canonicalization & concept selection (the reference's `_select_cui`,
/root/reference/pymedgraph/dataextraction/medgen.py:136-163, made
deterministic and distributed).

- Entity frequency = number of conversations containing the surface (the
  reference counts per-document-deduped entity rows, value_counts at
  medgen.py:152-154).  Counting is TWO-PHASE: per-block partial counts via
  `map_batches`, then a groupby-sum over the (vocabulary-bounded, tiny)
  partials — the all-to-all exchange moves O(|vocab| × blocks) rows, not
  O(rows), which is what defuses the hot-entity skew at 10^12-turn scale.
- Top-15 surfaces and top-4 CUIs per surface use TOTAL orders with
  deterministic tiebreaks — (count desc, surface asc) and (score desc, cui
  asc) — because pandas' insertion-order tiebreak (medgen.py:152,159) is
  nondeterministic under partitioning (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from .. import config
from . import distinct as _distinct


def entity_counts(conv_entities: rd.Dataset, *, vocab_hint: int | None = None) -> rd.Dataset:
    """(norm_surface, label) → n_convs, via partial-count pre-aggregation.

    `vocab_hint` is the caller's distinct-surface upper bound (the alias
    catalog size).  Below config.VOCAB_FUNNEL_MAX the partials coalesce
    into ONE combine block (each partial is ≤ |vocab| rows, so the single
    block is tiny and beats a full exchange); above it — a production
    10^6-10^7-alias catalog — that block would receive |vocab| × blocks
    rows, so the count runs on the sorted-exchange `grouped_agg` instead.
    Both paths are row-identical (tests/test_stages.py)."""
    from .groupagg import grouped_agg, rename_after_groupby

    if vocab_hint is not None and vocab_hint > config.VOCAB_FUNNEL_MAX:
        return grouped_agg(
            conv_entities.select_columns(["norm_surface", "label", "conv_id"]),
            ["norm_surface", "label"],
            [("conv_id", "count", "n_convs")],
        )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["norm_surface", "label"]).aggregate([("conv_id", "count")])
        return rename_after_groupby(g, ["norm_surface", "label"], ["conv_id"], ["count"], ["n_convs"])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["norm_surface", "label"]).aggregate([("n_convs", "sum")])
        return rename_after_groupby(g, ["norm_surface", "label"], ["n_convs"], ["sum"], ["n_convs"])

    partials = conv_entities.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.repartition(1).map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def top_entities(counts: rd.Dataset, *, label: str = "DISEASE", k: int = config.TOP_ENTITIES) -> rd.Dataset:
    """Top-k surfaces of one label by (n_convs desc, norm_surface asc).

    The counts table is vocabulary-sized (tiny), so the global sort is a
    no-op at scale; determinism comes from the total order.
    """
    filtered = counts.filter(expr=f"label == '{label}'")

    # Per-block partial top-k FIRST: the global top-k under a total order
    # (n_convs desc, norm_surface asc) equals the top-k of the union of
    # per-block top-ks, so the single combine block receives ≤ k × #blocks
    # rows no matter how large the counts table (10^7-alias safe); the
    # final coalesced pick supplies the deterministic total order.
    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_convs", "norm_surface"], ascending=[False, True], kind="mergesort")
        return df.head(k)

    partial = filtered.map_batches(pick, batch_format="pandas", batch_size=None)
    return partial.repartition(1).map_batches(pick, batch_format="pandas", batch_size=None)


def top_cuis_per_surface(
    links: rd.Dataset,
    *,
    score_min: float = config.SCORE_MIN,
    k: int = config.TOP_CUIS,
    surfaces: rd.Dataset | None = None,
) -> rd.Dataset:
    """Per surface: top-k CUIs with score > score_min, order (score desc, cui asc).

    Mirrors medgen.py:156-161 (sort_values('kb_score')[:4] after the >0.85
    filter).  Optionally restricted to a set of selected surfaces (the
    top-15): then the filtered table is ≤ |surfaces| × per-surface
    candidates — a handful of rows — and a per-block partial head-k plus
    one single-block pick is exact and exchange-free.  UNRESTRICTED, the
    group count is the detected-surface vocabulary (10^6–10^7 with a
    production UMLS alias table), so the grouped top-k runs on the sorted
    exchange: one parallel sort on (norm_surface, score desc, cui),
    vectorized head-k over each block's interior surface runs, and the ≤2
    block-edge surfaces gathered once and picked driver-side — never
    `groupby().map_groups` (~0.5 ms of per-group Python per group, see
    stages/groupagg.py).
    """
    filtered = links.filter(expr=f"score > {score_min}")

    def headk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["norm_surface", "score", "cui"],
                            ascending=[True, False, True], kind="mergesort")
        s = df["norm_surface"].to_numpy()
        n = len(df)
        if n == 0:
            return df
        new = np.ones(n, dtype=bool)
        new[1:] = s[1:] != s[:-1]
        first_pos = np.where(new, np.arange(n), 0)
        np.maximum.accumulate(first_pos, out=first_pos)
        return df[(np.arange(n) - first_pos) < k]

    if surfaces is not None:
        keep = set(surfaces.to_pandas()["norm_surface"])  # tiny (k rows)
        filtered = filtered.map_batches(
            lambda t: t.filter(pc.is_in(t["norm_surface"], value_set=pa.array(sorted(keep), pa.string()))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # bounded input: partial head-k per block, exact single-block pick
        partial = filtered.map_batches(headk, batch_format="pandas", batch_size=None)
        return partial.repartition(1).map_batches(headk, batch_format="pandas", batch_size=None)

    s = filtered.repartition(config.sort_blocks()).sort(
        ["norm_surface", "score", "cui"], descending=[False, True, False]
    )

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(is_edge=pd.array([], dtype="bool"))
        first, last = df["norm_surface"].iloc[0], df["norm_surface"].iloc[-1]
        edge_mask = df["norm_surface"].isin({first, last}).to_numpy()
        interior = headk(df[~edge_mask])
        return pd.concat(
            [interior.assign(is_edge=False), df[edge_mask].assign(is_edge=True)],
            ignore_index=True,
        )

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    cols = ["norm_surface", "cui", "score", "name", "definition", "label"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )
    # edge surfaces: ≤ 2 per block × per-surface candidate count — gather
    # once, pick driver-side, append as a literal block (distinct.py shape)
    edge_df = pd.DataFrame(
        flagged.filter(expr="is_edge == True").take_all(), columns=cols + ["is_edge"]
    )[cols].drop_duplicates()
    if len(edge_df) == 0:
        return interior
    return interior.union(rd.from_pandas(headk(edge_df)))


def selected_cuis(top_links: rd.Dataset) -> rd.Dataset:
    """Distinct CUIs of the selected links (medgen.py:163 `list(set(cuis))`)."""
    return _distinct.distinct(top_links, ["cui"])
