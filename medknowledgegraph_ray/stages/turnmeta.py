"""Operators over the transcript metadata columns (role / tool / ts) —
the analog of the reference's MeSH/keyword list extraction
(/root/reference/pymedgraph/dataextraction/parser.py:94-111,114-124): the
document-side attributes beyond the raw text that a transcript-KG user
asks for first.

- role-scoped mention detection (e.g. user-authored turns only),
- tool-usage aggregation + a Tool node/edge family,
- time-bucketed mention counts (hourly).

All counting follows the two-phase partial-aggregate pattern on the sorted
exchange (stages/groupagg.py); tool/role/hour cardinalities are tiny, so
the exchanges move O(keys × blocks) rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import config
from . import mentions as _mentions
from .distinct import distinct as _distinct
from .groupagg import grouped_agg


def role_mentions(turns: rd.Dataset, role: str = "user") -> rd.Dataset:
    """Mentions detected over one role's turns only (conv_id, turn_idx,
    norm_surface, label).  The role predicate runs before detection, so
    the detector scans only the scoped rows."""
    def pick(t: pa.Table) -> pa.Table:  # vectorized equality — no expression
        return t.filter(pc.equal(t["role"], role))  # string interpolation

    scoped = turns.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
    return _mentions.detect_mentions(scoped)


def tool_counts(turns: rd.Dataset) -> rd.Dataset:
    """Per tool (non-empty): number of tool turns and distinct conversations.

    n_uses is a plain partial count; n_convs needs a distinct (tool,
    conv_id) first — both exchanges are tool-cardinality-bounded after the
    per-block partials."""
    used = turns.filter(expr="tool != ''")
    uses = grouped_agg(
        used.select_columns(["tool", "conv_id"]),
        ["tool"],
        [("conv_id", "count", "n_uses")],
    )
    per_conv = _distinct(used.select_columns(["tool", "conv_id"]), ["tool", "conv_id"])
    convs = grouped_agg(per_conv, ["tool"], [("conv_id", "count", "n_convs")])

    # two tiny tables keyed on tool — zip driver-side (tool cardinality is
    # the catalog size, single digits here, bounded in any deployment)
    import pandas as pd

    a = uses.to_pandas().set_index("tool")
    b = convs.to_pandas().set_index("tool")
    out = a.join(b, how="outer").fillna(0).reset_index().sort_values("tool")
    out["n_uses"] = out["n_uses"].astype("int64")
    out["n_convs"] = out["n_convs"].astype("int64")
    return rd.from_pandas(out.reset_index(drop=True))


def tool_edges(turns: rd.Dataset) -> rd.Dataset:
    """Tool-usage edge family: (Conversation:<conv_id>, PRED, Tool:<tool>)
    distinct — the node-family shape of stages/graph.py applied to the
    `tool` column."""
    used = turns.filter(expr="tool != ''").select_columns(["conv_id", "tool"])
    pairs = _distinct(used, ["conv_id", "tool"])

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": pc.binary_join_element_wise(
                    pa.scalar("Conversation:"), t["conv_id"], ""
                ),
                "pred": pa.array([config.PRED] * len(t), pa.string()),
                "obj": pc.binary_join_element_wise(pa.scalar("Tool:"), t["tool"], ""),
            }
        )

    return pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)


def hourly_mention_counts(turns: rd.Dataset) -> rd.Dataset:
    """Mentions per (hour bucket, label): detection with `ts` passthrough,
    hour = epoch_us // 3.6e9, then the partial-count exchange."""
    det = _mentions.detect_mentions(turns, passthrough=["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table(
            {
                "hour_bucket": hour,
                "label": t["label"],
                "one": pa.array([1] * len(t), pa.int64()),
            }
        )

    bucketed = det.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg(bucketed, ["hour_bucket", "label"], [("one", "count", "n_mentions")])
