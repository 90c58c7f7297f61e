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

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from .. import config
from . import distinct as _distinct


def entity_counts(conv_entities: rd.Dataset) -> rd.Dataset:
    """(norm_surface, label) → n_convs, via partial-count pre-aggregation."""
    from .groupagg import rename_after_groupby

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["norm_surface", "label"]).aggregate([("conv_id", "count")])
        return rename_after_groupby(g, ["norm_surface", "label"], ["conv_id"], ["count"], ["n_convs"])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["norm_surface", "label"]).aggregate([("n_convs", "sum")])
        return rename_after_groupby(g, ["norm_surface", "label"], ["n_convs"], ["sum"], ["n_convs"])

    partials = conv_entities.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # final combine is VOCABULARY-bounded (≤ |vocab| rows per input block
    # after the partial), so one tiny Arrow combine block beats a full
    # groupby exchange by an order of magnitude
    return partials.repartition(1).map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def top_entities(counts: rd.Dataset, *, label: str = "DISEASE", k: int = config.TOP_ENTITIES) -> rd.Dataset:
    """Top-k surfaces of one label by (n_convs desc, norm_surface asc).

    The counts table is vocabulary-sized (tiny), so the global sort is a
    no-op at scale; determinism comes from the total order.
    """
    filtered = counts.filter(expr=f"label == '{label}'")

    # The counts table is vocabulary-bounded (tiny), so coalescing to ONE
    # block is free — and required: a per-block head(k) + limit(k) would
    # depend on arbitrary block order.  The total order (n_convs desc,
    # norm_surface asc) makes the top-k exact and deterministic.
    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_convs", "norm_surface"], ascending=[False, True], kind="mergesort")
        return df.head(k)

    return filtered.repartition(1).map_batches(pick, batch_format="pandas", batch_size=None)


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
    top-15); the links table is surface-vocabulary-bounded so the grouped
    top-k is a small shuffle.
    """
    filtered = links.filter(expr=f"score > {score_min}")
    if surfaces is not None:
        keep = set(surfaces.to_pandas()["norm_surface"])  # tiny (k rows)
        filtered = filtered.map_batches(
            lambda t: t.filter(pc.is_in(t["norm_surface"], value_set=pa.array(sorted(keep), pa.string()))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "cui"], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return filtered.groupby("norm_surface").map_groups(topk, batch_format="pandas")


def selected_cuis(top_links: rd.Dataset) -> rd.Dataset:
    """Distinct CUIs of the selected links (medgen.py:163 `list(set(cuis))`)."""
    return _distinct.distinct(top_links, ["cui"])
