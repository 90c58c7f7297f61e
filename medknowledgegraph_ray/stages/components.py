"""Distributed connected components over a duplicate-pair edge set.

Near-dup detection (MinHash / exact-Jaccard / SimHash) emits PAIRS; keeping
one representative per *transitive* duplicate cluster needs the connected
components of that pair graph — the canonical last step of a corpus dedup
pipeline (the reference's MERGE-on-id sink, pymedgraph/graph/builder.py,
only ever dedups exact ids; clustering is the scale analog).

Algorithm: hash-min label propagation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — the min-label baseline):
every node starts labeled with the smallest id in its closed neighborhood
and each round replaces a node's label with the min label across its
neighbors.  Convergence is O(graph diameter) rounds; duplicate clusters
are near-cliques (diameter ≤ ~3), so 2–4 rounds in practice.  Each round
is two parallel sorted exchanges over |E|+|V| rows:

  1. JOIN labels onto edge sources — the same sorted-run attach used by
     dedupe._attach_sorted: union label rows (one per node) with edge rows,
     ONE global sort on the node key, vectorized searchsorted per block;
     only rows at a block's first/last key defer to a repair pass whose
     label lookups are a broadcast-filtered subset (≤ 2 keys per block),
     never the whole label table.
  2. MIN-COMBINE the propagated labels with the current ones —
     groupagg.grouped_agg (per-block partial min → sort → edge-combine).

Driver state per round is one scalar (the label sum, strictly decreasing
until fixpoint) plus the ≤ 2·#blocks deferred rows — labels and edges stay
distributed; edges are materialized ONCE and reused every round.  At
100 TB the edge set is the near-dup pairs (orders of magnitude smaller
than the corpus) and each round is an all-to-all over that small set only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .groupagg import grouped_agg
from .. import config

# kind 0 = label row (node -> lab), kind 1 = edge row (node -> dst)
_JOIN_SCHEMA = pa.schema(
    [("node", pa.int64()), ("kind", pa.int8()), ("val", pa.int64())]
)
_MSG_SCHEMA = pa.schema(
    [("node", pa.int64()), ("lab", pa.int64()), ("is_edge", pa.bool_())]
)
_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("component", pa.int64())])


def _propagate_block(t: pa.Table) -> pa.Table:
    """One sorted block of unioned label/edge rows -> messages (dst, lab).

    Rows are globally sorted by `node`, so a node's label row and its edge
    rows are contiguous unless the node is the block's first/last key.
    Interior edge rows resolve their source label vectorized
    (searchsorted); edge rows at a flagged key defer as
    (node=src, lab=dst, is_edge=True) for the driver-side repair.  Label
    rows always emit their (node, lab) self-candidate so every node keeps
    a row through the min-combine.
    """
    n = t.num_rows
    if n == 0:
        return _MSG_SCHEMA.empty_table()
    nodes = t["node"].to_numpy(zero_copy_only=False)
    kind = t["kind"].to_numpy(zero_copy_only=False)
    val = t["val"].to_numpy(zero_copy_only=False)
    flagged = (nodes == nodes[0]) | (nodes == nodes[-1])
    is_lab = kind == 0
    lab_nodes = nodes[is_lab & ~flagged]
    lab_vals = val[is_lab & ~flagged]
    is_e = (kind == 1) & ~flagged
    e_nodes = nodes[is_e]
    e_dst = val[is_e]
    out_node = [nodes[is_lab]]  # self-candidates, flagged keys included
    out_lab = [val[is_lab]]
    if len(e_nodes):
        pos = np.searchsorted(lab_nodes, e_nodes)
        ok = (pos < len(lab_nodes)) & (
            lab_nodes[np.minimum(pos, max(len(lab_nodes) - 1, 0))] == e_nodes
        ) if len(lab_nodes) else np.zeros(len(e_nodes), dtype=bool)
        if not ok.all():
            # an interior key's label row must be co-resident after the
            # global sort; missing means the label table lost a node
            raise AssertionError(
                "connected_components: edge source missing its label row"
            )
        out_node.append(e_dst)
        out_lab.append(lab_vals[pos])
    n_msgs = int(sum(len(x) for x in out_node))
    msgs = pa.table(
        {
            "node": pa.array(np.concatenate(out_node), pa.int64()),
            "lab": pa.array(np.concatenate(out_lab), pa.int64()),
            "is_edge": pa.array(np.zeros(n_msgs, dtype=bool)),
        },
        schema=_MSG_SCHEMA,
    )
    defer = flagged & (kind == 1)
    if not defer.any():
        return msgs
    deferred = pa.table(
        {
            "node": pa.array(nodes[defer], pa.int64()),
            "lab": pa.array(val[defer], pa.int64()),
            "is_edge": pa.array(np.ones(int(defer.sum()), dtype=bool)),
        },
        schema=_MSG_SCHEMA,
    )
    return pa.concat_tables([msgs, deferred])


def _symmetric_edges(pairs: rd.Dataset, col_a: str, col_b: str) -> rd.Dataset:
    """(a, b) pairs -> both directions as (node=src, kind=1, val=dst)."""

    def expand(t: pa.Table) -> pa.Table:
        a = t[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {
                "node": pa.array(src, pa.int64()),
                "kind": pa.array(np.ones(len(src), dtype=np.int8)),
                "val": pa.array(dst, pa.int64()),
            },
            schema=_JOIN_SCHEMA,
        )

    return pairs.map_batches(expand, batch_format="pyarrow", batch_size=None)


def _repair_messages(deferred: list[dict], labels: rd.Dataset) -> pa.Table:
    """Resolve deferred edge rows (node=src, lab=dst) against the label
    table, filtering labels to just the needed sources (broadcast set —
    bounded by 2 keys per exchange block, not by |V|)."""
    need = {int(r["node"]) for r in deferred}
    need_ref = ray.put(frozenset(need))

    def pick(t: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = np.fromiter(
            (int(x) in wanted for x in t["node"].to_numpy(zero_copy_only=False)),
            dtype=bool,
            count=t.num_rows,
        )
        return t.filter(pa.array(mask))

    lab_map: dict[int, int] = {}
    for batch in labels.map_batches(
        pick, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for nd, lb in zip(
            batch["node"].to_numpy(zero_copy_only=False),
            batch["lab"].to_numpy(zero_copy_only=False),
        ):
            lab_map[int(nd)] = int(lb)
    return pa.table(
        {
            "node": pa.array([int(r["lab"]) for r in deferred], pa.int64()),
            "lab": pa.array([lab_map[int(r["node"])] for r in deferred], pa.int64()),
            "is_edge": pa.array([False] * len(deferred)),
        },
        schema=_MSG_SCHEMA,
    )


# edge counts up to this resolve driver-side (a 2M-row gather is ~32 MB);
# row-identical to the distributed rounds — tests force both paths
SMALL_GRAPH_EDGES = config.gate(2_000_000)


def _components_driver_side(edges: rd.Dataset) -> rd.Dataset:
    """Union-find over a gathered (already symmetric) edge list."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for batch in edges.iter_batches(batch_format="pyarrow"):
        for u, v in zip(
            batch["node"].to_numpy(zero_copy_only=False),
            batch["val"].to_numpy(zero_copy_only=False),
        ):
            u, v = int(u), int(v)
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min so the representative IS the component min
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
    nodes = sorted(parent)
    out = pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "component": pa.array([find(n) for n in nodes], pa.int64()),
        },
        schema=_OUT_SCHEMA,
    )
    return rd.from_arrow(out)


def connected_components(
    pairs: rd.Dataset,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_rounds: int = 50,
) -> rd.Dataset:
    """Pair rows (col_a, col_b) -> (doc_id, component) with component =
    the minimum node id reachable through the undirected pair graph.

    Every node appearing in any pair gets exactly one output row.  Exact
    for any graph; rounds = O(diameter).  Raises after `max_rounds`
    non-converged rounds rather than returning a partial labeling.
    """
    edges = _symmetric_edges(pairs, col_a, col_b).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    if n_edges <= SMALL_GRAPH_EDGES:
        # size gate (the dedupe.SMALL_VERIFY_IDS pattern): a pair graph this
        # small costs more in per-round exchange latency than a driver-side
        # union-find; the distributed rounds are the ≥100-TB path
        return _components_driver_side(edges)

    def lab_rows(t: pa.Table) -> pa.Table:
        """Current labels as lookup rows PLUS pointer-jump requests.

        A jump request (node=lab(u), kind=1, val=u) rides the same attach
        as a graph edge and yields the message (u, lab(lab(u))) — path
        doubling, so convergence is O(log diameter) rounds instead of
        O(diameter) (Kiveris et al. §3, the `hash-min + pointer jumping`
        hybrid).  Self-pointing labels produce idempotent requests.
        """
        nodes = t["node"].to_numpy(zero_copy_only=False)
        labs = t["lab"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([nodes, labs]), pa.int64()),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(nodes), dtype=np.int8),
                         np.ones(len(nodes), dtype=np.int8)]
                    )
                ),
                "val": pa.array(np.concatenate([labs, nodes]), pa.int64()),
            },
            schema=_JOIN_SCHEMA,
        )

    # init: label(u) = min(u, min direct neighbor) — one grouped min over
    # the edge rows plus self candidates
    def self_and_neighbors(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_numpy(zero_copy_only=False)
        vals = t["val"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([nodes, nodes]), pa.int64()),
                "lab": pa.array(np.concatenate([vals, nodes]), pa.int64()),
            }
        )

    labels = grouped_agg(
        edges.map_batches(self_and_neighbors, batch_format="pyarrow", batch_size=None),
        ["node"],
        [("lab", "min", "lab")],
    ).materialize()
    prev_sum = labels.sum("lab")

    for _ in range(max_rounds):
        unioned = edges.union(
            labels.map_batches(lab_rows, batch_format="pyarrow", batch_size=None)
        ).sort(["node", "kind"])
        msgs = unioned.map_batches(
            _propagate_block, batch_format="pyarrow", batch_size=None
        ).materialize()
        deferred = msgs.filter(expr="is_edge == True").take_all()
        interior = msgs.filter(expr="is_edge == False")
        if deferred:
            interior = interior.union(
                rd.from_arrow(_repair_messages(deferred, labels))
            )
        labels = grouped_agg(
            interior.select_columns(["node", "lab"]),
            ["node"],
            [("lab", "min", "lab")],
        ).materialize()
        # cut the plan lineage: blocks stay in the object store, but the
        # next round starts from fresh refs instead of a per-round-deeper
        # operator DAG (whose stats traversal is recursive in Ray 2.49)
        labels = rd.from_arrow_refs(labels.to_arrow_refs())
        # labels only ever decrease, so an unchanged sum == fixpoint
        cur_sum = labels.sum("lab")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["node"], "component": t["lab"]}, schema=_OUT_SCHEMA
        )

    return labels.map_batches(rename, batch_format="pyarrow", batch_size=None)
