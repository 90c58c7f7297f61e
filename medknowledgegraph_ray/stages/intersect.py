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
come from a self-join on the SORTED exchange: one global sort keyed on
(node, term), a vectorized per-block pass that dedups consecutive rows and
emits every interior node's term pairs with numpy index arithmetic (no
per-group Python — `groupby(node).map_groups` costs ~0.5 ms of per-group
Python at node cardinality, see stages/groupagg.py), and the block-edge
nodes (≤ 2 per block, ≤ |terms| rows each) gathered once and paired
driver-side.  Pair-count keys are bounded by |terms|² ≤ TOP_ENTITIES², so
the final combine is one tiny single-block Arrow group_by.  The shape
holds when the per-term sets are millions of nodes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import config
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


_PAIR_SCHEMA = pa.schema(
    [
        ("term_a", pa.string()),
        ("term_b", pa.string()),
        ("n_common", pa.int64()),
        ("is_edge", pa.bool_()),
    ]
)


def _emit_run_pairs(terms: np.ndarray, run_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-run (a, b) index pairs with a < b positionally, pure
    numpy: element j of a k-long run pairs as `a` with the k-1-j elements
    after it.  `terms` must be sorted within each run (the global
    (node, term) sort guarantees it), so positional order == lexical
    order and term_a < term_b for every emitted pair."""
    n = len(terms)
    run_start = np.zeros(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = run_id[1:] != run_id[:-1]
    starts = np.flatnonzero(run_start)
    lens = np.diff(np.append(starts, n))
    k_per_elem = np.repeat(lens, lens)  # run length, per element
    pos_in_run = np.arange(n) - np.repeat(starts, lens)
    counts = k_per_elem - 1 - pos_in_run  # partners after each element
    a_idx = np.repeat(np.arange(n), counts)
    offs = np.cumsum(counts)
    b_rel = np.arange(int(offs[-1]) if len(offs) else 0) - np.repeat(offs - counts, counts)
    b_idx = a_idx + 1 + b_rel
    return a_idx, b_idx


def _block_pairs(t: pa.Table) -> pa.Table:
    """Per-block pass over the (node, term)-sorted exchange: consecutive
    dedup, pass rows of the block's first/last NODE through as edge rows
    (their runs may continue in a neighbor block; term rides `term_a`, the
    node rides `term_b`), emit interior pair counts vectorized."""
    n = t.num_rows
    if n == 0:
        return _PAIR_SCHEMA.empty_table()
    node = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
    term = t["term"].combine_chunks().to_numpy(zero_copy_only=False)
    if n > 1:  # consecutive (node, term) dedup
        keep = np.ones(n, dtype=bool)
        keep[1:] = (node[1:] != node[:-1]) | (term[1:] != term[:-1])
        node, term = node[keep], term[keep]
        n = len(node)
    edge = (node == node[0]) | (node == node[-1])
    parts = [
        pa.table(
            {
                "term_a": pa.array(term[edge], pa.string()),
                "term_b": pa.array(node[edge], pa.string()),
                "n_common": pa.array(np.zeros(int(edge.sum()), np.int64)),
                "is_edge": pa.array(np.ones(int(edge.sum()), bool)),
            },
            schema=_PAIR_SCHEMA,
        )
    ]
    it, inode = term[~edge], node[~edge]
    if len(it):
        # run ids: consecutive index per distinct interior node
        new_run = np.ones(len(inode), dtype=bool)
        new_run[1:] = inode[1:] != inode[:-1]
        run_id = np.cumsum(new_run)
        a_idx, b_idx = _emit_run_pairs(it, run_id)
        pairs = pd.DataFrame({"term_a": it[a_idx], "term_b": it[b_idx]})
        cnt = pairs.groupby(["term_a", "term_b"], sort=False).size().reset_index(name="n_common")
        parts.append(
            pa.table(
                {
                    "term_a": pa.array(cnt["term_a"], pa.string()),
                    "term_b": pa.array(cnt["term_b"], pa.string()),
                    "n_common": pa.array(cnt["n_common"].to_numpy(np.int64)),
                    "is_edge": pa.array(np.zeros(len(cnt), bool)),
                },
                schema=_PAIR_SCHEMA,
            )
        )
    return pa.concat_tables(parts)


def intersection(nodes: rd.Dataset) -> rd.Dataset:
    """Pairwise shared-node counts: (term_a, term_b, n_common), a < b.

    One parallel sort on (node, term) co-locates each node's terms; the
    per-node pair emission is safe because a node is shared by at most
    |terms| (≤ TOP_ENTITIES) terms — per-block work is O(rows·terms),
    never O(nodes²), and the pair-count key space is ≤ TOP_ENTITIES²,
    so the final combine fits one block."""
    pre = nodes.map_batches(  # partial (node, term) distinct bounds the exchange
        lambda t: t.select(["node", "term"]).group_by(["node", "term"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    ).repartition(config.sort_blocks())
    flagged = pre.sort(["node", "term"]).map_batches(
        _block_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()  # pinned once; consumed by interior partials + edge gather
    # edge rows: ≤ 2 nodes per block × ≤ |terms| terms — bounded by block
    # count, gathered once and paired driver-side (cf. distinct.py repair)
    edge_df = pd.DataFrame(
        flagged.filter(expr="is_edge == True").take_all(),
        columns=["term_a", "term_b", "n_common", "is_edge"],
    ).rename(columns={"term_a": "term", "term_b": "node"})[["node", "term"]]
    edge_df = edge_df.drop_duplicates().sort_values(["node", "term"], kind="mergesort")
    if len(edge_df):
        node_np = edge_df["node"].to_numpy()
        new_run = np.ones(len(node_np), dtype=bool)
        new_run[1:] = node_np[1:] != node_np[:-1]
        a_idx, b_idx = _emit_run_pairs(
            edge_df["term"].to_numpy(), np.cumsum(new_run)
        )
        tnp = edge_df["term"].to_numpy()
        epairs = pd.DataFrame({"term_a": tnp[a_idx], "term_b": tnp[b_idx]})
        ecnt = epairs.groupby(["term_a", "term_b"], sort=False).size().reset_index(name="n_common")
        edge_tab = pa.table(
            {
                "term_a": pa.array(ecnt["term_a"], pa.string()),
                "term_b": pa.array(ecnt["term_b"], pa.string()),
                "n_common": pa.array(ecnt["n_common"].to_numpy(np.int64)),
            }
        )
    else:
        edge_tab = _PAIR_SCHEMA.empty_table().drop_columns(["is_edge"])
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t.drop_columns(["is_edge"]), batch_format="pyarrow", zero_copy_batch=True
    )
    combined = interior.union(rd.from_arrow(edge_tab))

    # final combine: key space ≤ TOP_ENTITIES² — one tiny block
    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["term_a", "term_b"]).aggregate([("n_common", "sum")])
        from .groupagg import rename_after_groupby

        return rename_after_groupby(g, ["term_a", "term_b"], ["n_common"], ["sum"], ["n_common"])

    return combined.map_batches(
        final, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).repartition(1).map_batches(
        final, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
