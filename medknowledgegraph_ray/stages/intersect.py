"""Graph-intersection analytics — the reference's one analytical read query
(`GET /intersection`, /root/reference/pymedgraph/graph/neo4jconnector.py:267-316
with the level map at :275-284 and pairwise `apoc.coll.intersection`).

Reference semantics: for each pair of search terms, the number of shared
graph nodes at a given hierarchy level.  Our terms are the top DISEASE
entity surfaces (the reference's SearchTerm analog); levels follow the same
hierarchy: UMLS → Gene → Protein → GO.

Shape (SURVEY.md §2.4 J7): NOT a driver-side set intersection — the
per-term node sets are built as a (term, node) dataset via the same
broadcast KB expansions the enrichment stages use, then the pair counts
come from a self-join expressed as `groupby(node)` → per-node term-pair
emission → `groupby(term_a, term_b).count()`.  Both shuffles are keyed on
bounded-cardinality keys (nodes / term pairs), so the shape holds when the
per-term sets are millions of nodes.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count

from ..functions import text as textfn
from ..sources import readers

LEVELS = ("UMLS", "Gene", "Protein", "GO")


def _expand(ds: rd.Dataset, key_col: str, mapping: dict[str, list[str]]) -> rd.Dataset:
    """(term, key) → (term, node) for every node the KB maps key to."""

    def fn(batch: pa.Table) -> pa.Table:
        terms, nodes = [], []
        for term, key in zip(batch["term"].to_pylist(), batch[key_col].to_pylist()):
            for node in mapping.get(key, ()):
                terms.append(term)
                nodes.append(node)
        return pa.table(
            {"term": pa.array(terms, pa.string()), "node": pa.array(nodes, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _multimap(table: pa.Table, key: str, val: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for row in table.select([key, val]).to_pylist():
        out.setdefault(row[key], []).append(row[val])
    return out


def level_nodes(top_links: rd.Dataset, level: str) -> rd.Dataset:
    """(term, node) pairs at a hierarchy level, term = top entity surface.

    Mirrors the path-length level map (neo4jconnector.py:275-284): UMLS is
    one hop below the entity, Gene two, Protein three, GO four.
    """
    if level not in LEVELS:
        raise ValueError(f"level must be one of {LEVELS}, got {level!r}")
    base = top_links.select_columns(["norm_surface", "cui"]).map_batches(
        lambda t: pa.table({"term": t["norm_surface"], "cui": t["cui"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    if level == "UMLS":
        return base.map_batches(
            lambda t: pa.table({"term": t["term"], "node": t["cui"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    gene_map = _multimap(readers.kb_table("gene_map"), "cui", "gene")
    genes = _expand(base, "cui", gene_map)
    if level == "Gene":
        return genes
    prot_map = _multimap(readers.kb_table("protein_map"), "gene", "entry")
    prots = _expand(
        genes.map_batches(
            lambda t: pa.table({"term": t["term"], "gene": t["node"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        "gene", prot_map,
    )
    if level == "Protein":
        return prots
    go_raw = {
        r["entry"]: [go_id for go_id, _ in textfn.parse_go_field(r["go"] or "")]
        for r in readers.kb_table("protein_map").select(["entry", "go"]).to_pylist()
    }
    return _expand(
        prots.map_batches(
            lambda t: pa.table({"term": t["term"], "entry": t["node"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        "entry", go_raw,
    )


def _pairs_for_node(g: pd.DataFrame) -> pd.DataFrame:
    terms = sorted(set(g["term"]))
    rows = list(itertools.combinations(terms, 2))
    return pd.DataFrame(
        {"term_a": [a for a, _ in rows], "term_b": [b for _, b in rows]}
    )


def intersection(nodes: rd.Dataset) -> rd.Dataset:
    """Pairwise shared-node counts: (term_a, term_b, n_common), a < b.

    The per-node pair emission is safe because a node is shared by at most
    |terms| (≤ TOP_ENTITIES) terms — per-group work is O(terms²), never
    O(nodes²)."""
    counted = (
        nodes.groupby("node")
        .map_groups(_pairs_for_node, batch_format="pandas")
        .groupby(["term_a", "term_b"])
        .aggregate(Count(alias_name="n_common"))
    )
    return counted.map_batches(
        lambda t: t.assign(n_common=t["n_common"].astype("int64")),
        batch_format="pandas",
    )
