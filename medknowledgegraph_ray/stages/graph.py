"""Graph materialization: deduplicated node/edge Parquet tables.

Replaces the reference's Neo4j upload (/root/reference/pymedgraph/graph/
neo4jconnector.py:51-221).  Cypher `MERGE` on `id_attribute` becomes an
exact dedup keyed on the canonical node id (`drop_duplicates` analog at
neo4jconnector.py:127-129); the `(a)-[:CONTAINS]->(b)` edge MERGE
(:165-193) becomes a dedup on the full (subj, pred, obj) triple.  The edge
hierarchy mirrors the reference's 7-level map (neo4jconnector.py:275-284):

    Conversation → {DISEASE,CHEMICAL} → UMLS → Gene → Protein → GO
    UMLS → SnomedConcept,  UMLS → ClinicalFeature

Node identity is `<label>:<id>` so ids cannot collide across labels.
Dedup keys on the canonical id — attributes are functionally dependent on
the id, so keep-any equals the reference's keep-first (SURVEY.md §7.4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import config
from .distinct import distinct

_SEP = "\x1f"  # packs (node_label, name, definition) for the Min aggregate;
               # never occurs in our ASCII corpus/KB text


def schema_gate(expected: pa.Schema):
    """Stage-boundary validator (the §2.10 plugin correctness gate — the
    basepipe.py:137-180 output-type check, ported to Arrow): every batch
    crossing the boundary must carry exactly the declared schema.  Fails
    loudly; costs a name/type comparison per batch."""
    from ..schemas import TableSpecError

    exp_names = list(expected.names)

    def fn(t: pa.Table) -> pa.Table:
        if t.schema.names != exp_names:
            raise TableSpecError(
                f"schema gate: columns {t.schema.names} != declared {exp_names}"
            )
        for f in expected:
            actual = t.schema.field(f.name).type
            if actual != f.type:
                raise TableSpecError(
                    f"schema gate: column {f.name!r} is {actual}, declared {f.type}"
                )
        return t

    return fn


def node_id(label: str, col: pa.ChunkedArray | pa.Array):
    return pc.binary_join_element_wise(pa.scalar(label + ":"), col, "")


def edge_table(subj_label: str, subj, obj_label: str, obj) -> pa.Table:
    n = len(subj)
    return pa.table(
        {
            "subj": node_id(subj_label, subj),
            "pred": pa.array([config.PRED] * n, pa.string()),
            "obj": node_id(obj_label, obj),
        }
    )


def _edges_batch(subj_label: str, subj_col: str, obj_label_col_or_const, obj_col: str):
    """Build a map_batches fn emitting edge rows from a child table batch.

    `obj_label_col_or_const` is either a fixed label string or the name of a
    column holding per-row labels (the DISEASE/CHEMICAL entity case).
    """

    def fn(batch: pa.Table) -> pa.Table:
        subj = pc.binary_join_element_wise(pa.scalar(subj_label + ":"), batch[subj_col], "")
        if obj_label_col_or_const in batch.column_names:
            obj = pc.binary_join_element_wise(
                batch[obj_label_col_or_const], pa.scalar(":"), batch[obj_col], ""
            )
        else:
            obj = pc.binary_join_element_wise(
                pa.scalar(obj_label_col_or_const + ":"), batch[obj_col], ""
            )
        return pa.table(
            {
                "subj": subj,
                "pred": pa.array([config.PRED] * len(batch), pa.string()),
                "obj": obj,
            }
        )

    return fn


def dedup_triples(edges: rd.Dataset, *, blocks: int | None = None) -> rd.Dataset:
    """Exact (subj, pred, obj) dedup: per-block partial distinct, then a
    vectorized grouped distinct keyed on the composite triple (the composite
    key spreads hot subjects across reducers)."""
    return distinct(edges, ["subj", "pred", "obj"], blocks=blocks)


def dedup_nodes(nodes: rd.Dataset, *, blocks: int | None = None) -> rd.Dataset:
    """MERGE-on-id semantics: one row per canonical_id (neo4jconnector.py:
    127-129), keeping the lexicographic minimum of (node_label, name,
    definition) — deterministic under any partitioning.

    No per-group Python: the attribute triple is packed into one string so
    the keep-min is a single vectorized Min aggregate, unpacked after."""

    def pack(t: pa.Table) -> pa.Table:
        packed = pc.binary_join_element_wise(
            t["node_label"], t["name"], t["definition"], _SEP
        )
        # per-block partial min bounds the exchange to one row per id per block
        g = (
            pa.table({"canonical_id": t["canonical_id"], "packed": packed})
            .group_by("canonical_id")
            .aggregate([("packed", "min")])
        )
        from .groupagg import rename_after_groupby

        return rename_after_groupby(g, ["canonical_id"], ["packed"], ["min"], ["packed"])

    def unpack(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["packed"], _SEP)
        return pa.table(
            {
                "canonical_id": t["canonical_id"],
                "node_label": pc.list_element(parts, 0),
                "name": pc.list_element(parts, 1),
                "definition": pc.list_element(parts, 2),
            }
        )

    packed_ds = nodes.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    if blocks == 1:
        # KB-bounded family: one tiny Arrow combine block, no exchange
        def combine(t: pa.Table) -> pa.Table:
            g = t.group_by("canonical_id").aggregate([("packed", "min")])
            from .groupagg import rename_after_groupby

            return rename_after_groupby(g, ["canonical_id"], ["packed"], ["min"], ["packed"])

        merged = packed_ds.repartition(1).map_batches(
            combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    else:
        # corpus/vocab-scale family: algebraic min on the parallel sorted
        # exchange (stages/groupagg.py) — no per-group reducer
        from .groupagg import grouped_agg

        merged = grouped_agg(packed_ds, ["canonical_id"], [("packed", "min", "packed")])
    return merged.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)


def dedup_nodes_table(tab: pa.Table) -> pa.Table:
    """Driver-side dedup_nodes for KB-bounded literal tables: keep the
    lexicographic-minimum packed attributes per canonical_id — identical
    semantics to dedup_nodes, zero Ray plan operators."""
    packed = pc.binary_join_element_wise(
        tab["node_label"], tab["name"], tab["definition"], _SEP
    )
    g = (
        pa.table({"canonical_id": tab["canonical_id"], "packed": packed})
        .group_by("canonical_id")
        .aggregate([("packed", "min")])
    )
    from .groupagg import rename_after_groupby

    g = rename_after_groupby(g, ["canonical_id"], ["packed"], ["min"], ["packed"])
    parts = pc.split_pattern(g["packed"], _SEP)
    return pa.table(
        {
            "canonical_id": g["canonical_id"],
            "node_label": pc.list_element(parts, 0),
            "name": pc.list_element(parts, 1),
            "definition": pc.list_element(parts, 2),
        }
    )


def node_rows(batch: pa.Table, label, id_col: str, name_col: str, def_col: str | None) -> pa.Table:
    """Project a child table batch into (canonical_id, node_label, name, definition)."""
    if label in batch.column_names:  # per-row label column
        cid = pc.binary_join_element_wise(batch[label], pa.scalar(":"), batch[id_col], "")
        lab = batch[label]
    else:
        cid = pc.binary_join_element_wise(pa.scalar(label + ":"), batch[id_col], "")
        lab = pa.array([label] * len(batch), pa.string())
    definition = (
        pc.fill_null(batch[def_col], "") if def_col else pa.array([""] * len(batch), pa.string())
    )
    return pa.table(
        {
            "canonical_id": cid,
            "node_label": lab,
            "name": batch[name_col],
            "definition": definition,
        }
    )
