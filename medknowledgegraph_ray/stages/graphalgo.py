"""Distributed graph analytics over edge-list datasets: PageRank and
triangle counting.

The reference's graph stage ends at MERGE-dedup'd node/edge sinks
(pymedgraph/graph/builder.py); once a corpus-scale graph exists (co-mention
graphs, near-dup pair graphs, trade graphs), the standard next questions are
centrality (PageRank) and local clustering (triangles).  Both operators here
follow the components.py recipe: a size-gated exact driver path for graphs
whose EDGE LIST fits one node (the common case — even a 100-TB corpus's
derived entity graph is orders of magnitude smaller than the corpus), and a
fully distributed path built from the repo's existing exchange primitives
(equi_join / join_many / grouped_agg) above the gate.  Both paths are
row-identical and tests force each.

All arithmetic is int64: PageRank ranks live in 1e-12 units of total mass
with floor-division damping, so the result is deterministic under ANY
summation order and bit-equal to the unrolled-SQL oracle — no float enters
either implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .groupagg import grouped_agg
from .join import equi_join
from .. import config

# total PageRank mass in integer units; 85/100 damping (floor division)
R_TOT = 1_000_000_000_000
DAMP_NUM, DAMP_DEN = 85, 100

# edge lists up to this iterate driver-side (the components.SMALL_GRAPH_EDGES
# pattern: a 2M-row gather is ~32 MB and beats 3 exchanges × iters of fixed
# latency); the distributed rounds are the ≥100-TB path
SMALL_GRAPH_EDGES = config.gate(2_000_000)


def _lineage_cut(ds: rd.Dataset) -> rd.Dataset:
    """Break plan lineage between iterations (blocks stay in the object
    store) — the components.py fix for Ray's per-round plan deepening."""
    return rd.from_arrow_refs(ds.to_arrow_refs())


def _pagerank_driver(src: np.ndarray, dst: np.ndarray, iters: int) -> pd.DataFrame:
    # hash factorization, not sort-based np.unique(return_inverse=True):
    # O(E) vs O(E log E), ~10x cheaper at cardinality << E, and the label
    # order is irrelevant (pure relabeling; ranks are per-node exact)
    inv, nodes = pd.factorize(np.concatenate([src, dst]), sort=False)
    n = len(nodes)
    si, di = inv[: len(src)], inv[len(src):]
    deg = np.bincount(si, minlength=n).astype(np.int64)
    if (deg == 0).any():
        raise ValueError("pagerank: node with no out-edge (pass a symmetrized edge list)")
    base = (R_TOT * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)
    rank = np.full(n, R_TOT // n, dtype=np.int64)
    for _ in range(iters):
        c = (rank * DAMP_NUM) // (DAMP_DEN * deg)
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, di, c[si])
        rank = base + acc
    return pd.DataFrame(
        {"node": pd.array(nodes, dtype="int64"),
         "rank": pd.array(rank, dtype="int64")}
    )


def pagerank(edges: rd.Dataset, iters: int = 10) -> rd.Dataset:
    """Integer-exact PageRank over a DIRECTED (node → dst) edge list in
    which every node has ≥1 out-edge (symmetrize undirected graphs
    upstream).  rank⁰(u) = ⌊R_TOT/N⌋; each iteration sends
    c(u) = ⌊85·rank(u) / (100·deg(u))⌋ along every out-edge and sets
    rank(v) = ⌊15·R_TOT / (100·N)⌋ + Σ c(u) — the damped power iteration
    with floor division, so ranks are exact int64 under any partitioning
    and any reduce order.

    Distributed path (> SMALL_GRAPH_EDGES): per iteration, ONE
    contribution map over the (node, deg, rank) label table, ONE
    sorted-merge equi_join of contributions onto edge sources (labels are
    unique-keyed — the join's contract), ONE grouped sum by destination,
    then a cheap broadcast-free re-attach of deg.  Labels and edges stay
    distributed; driver state is O(1) per round.  Below the gate the same
    arithmetic runs vectorized on a gathered edge array."""
    cols = edges.columns()
    assert cols[:2] == ["node", "dst"], f"pagerank edges need (node, dst), got {cols}"
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
        )
    if n_edges <= SMALL_GRAPH_EDGES:
        df = edges.to_pandas()
        return rd.from_pandas(
            _pagerank_driver(
                df["node"].to_numpy().astype(np.int64),
                df["dst"].to_numpy().astype(np.int64),
                iters,
            )
        )

    ones = edges.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow", batch_size=None,
    )
    deg = grouped_agg(ones, ["node"], [("one", "sum", "deg")]).materialize()
    n = deg.count()
    # enforce the same no-dangling-node precondition the driver path raises
    # on: every node appearing anywhere (src OR dst) must have >=1 out-edge,
    # i.e. the distinct-node count over BOTH columns must equal deg's.
    n_all = grouped_agg(
        edges.map_batches(
            lambda t: pa.table(
                {"node": pa.concat_arrays(
                    [pa.compute.cast(c, pa.int64())
                     for c in (t["node"].combine_chunks(), t["dst"].combine_chunks())]),
                 "one": pa.array(np.ones(2 * t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", batch_size=None,
        ),
        ["node"], [("one", "sum", "cnt")],
    ).count()
    if n_all != n:
        raise ValueError("pagerank: node with no out-edge (pass a symmetrized edge list)")
    base = (R_TOT * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)
    r0 = R_TOT // n

    def init(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array(np.full(t.num_rows, r0, dtype=np.int64))
        )

    labels = deg.map_batches(init, batch_format="pyarrow", batch_size=None)
    for _ in range(iters):
        contrib = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "c": pa.array(
                        (t["rank"].to_numpy(zero_copy_only=False) * DAMP_NUM)
                        // (DAMP_DEN * t["deg"].to_numpy(zero_copy_only=False))
                    ),
                }
            ),
            batch_format="pyarrow", batch_size=None,
        )
        sent = equi_join(contrib, edges, "node", ["c"], ["dst"])
        recv = grouped_agg(
            sent.map_batches(
                lambda t: pa.table({"node": t["dst"], "c": t["c"]}),
                batch_format="pyarrow", batch_size=None,
            ),
            ["node"], [("c", "sum", "r_in")],
        )
        # LEFT join with deg on the preserved (probe) side: a node with no
        # in-edges this round gets a null r_in, coalesced to 0 — dropping it
        # (the old inner join) silently erased its rank AND its outgoing
        # contribution from every later iteration.
        relabeled = equi_join(recv, deg, "node", ["r_in"], ["deg"],
                              how="left").map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "deg": t["deg"],
                    "rank": pa.array(
                        base + pa.compute.fill_null(t["r_in"], 0)
                        .to_numpy(zero_copy_only=False).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow", batch_size=None,
        )
        labels = _lineage_cut(relabeled.materialize())
    return labels.select_columns(["node", "rank"])


def _triangles_driver(a: np.ndarray, b: np.ndarray) -> tuple[int, int, int]:
    """Exact (n_nodes, n_edges, n_triangles) of a canonical (a < b, unique)
    undirected edge array via degree-ordered adjacency intersection.

    Validates the same contract the distributed path enforces (a < b, ids
    fit 31 bits via sym(); uniqueness via equi_join's unique-build-key
    check) so malformed input fails identically on both sides of the gate."""
    if len(a) and (a >= b).any():
        raise ValueError("triangle_count: edges must be canonical (a < b)")
    if len(a) and (b >= 2**31).any():
        raise ValueError("triangle_count: node ids must fit 31 bits")
    if len(np.unique((a << 32) | b)) != len(a):
        raise ValueError("triangle_count: duplicate edges (pairs must be unique)")
    # hash factorization (order-free relabeling) — see _pagerank_driver
    inv, nodes = pd.factorize(np.concatenate([a, b]), sort=False)
    n = len(nodes)
    ai, bi = inv[: len(a)], inv[len(a):]
    deg = np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)
    # orient u -> v iff (deg[u], u) < (deg[v], v): every node's forward
    # adjacency is O(sqrt(E)), bounding the wedge count
    lo = np.where((deg[ai] < deg[bi]) | ((deg[ai] == deg[bi]) & (ai < bi)), ai, bi)
    hi = np.where(lo == ai, bi, ai)
    adj: dict[int, set[int]] = {}
    for u, v in zip(lo.tolist(), hi.tolist()):
        adj.setdefault(u, set()).add(v)
    tri = 0
    for u, v in zip(lo.tolist(), hi.tolist()):
        su, sv = adj.get(u), adj.get(v)
        if su and sv:
            tri += len(su & sv)
    return n, len(a), tri


def triangle_count(edges: rd.Dataset, col_a: str = "a", col_b: str = "b") -> rd.Dataset:
    """Exact triangle count of an undirected graph given as CANONICAL
    unique pairs (col_a < col_b, node ids < 2³¹).  Returns ONE row
    (n_nodes, n_edges, n_triangles).

    Distributed path (> SMALL_GRAPH_EDGES): the classic degree-oriented
    wedge join —

      1. degrees via one grouped count over both endpoints;
      2. orient each edge low→high by (degree, id) (two unique-keyed
         degree attaches), bounding every forward adjacency at O(√E);
      3. wedges per center via join_many (the many-to-many sorted-merge
         exchange) of the oriented list with itself, keeping (v, w) pairs
         ordered by the same (degree, id) rule — each triangle yields
         exactly one wedge;
      4. close wedges: pack (v, w) into one int64 key, grouped-count the
         wedges, and inner-join against the oriented edges' (unique) pair
         keys; the sum of matched wedge counts is the triangle count.

    Every step is an existing guarded exchange primitive; no stage ever
    materializes a neighborhood in one task."""
    edges = edges.materialize()
    m = edges.count()
    if m == 0:
        return rd.from_arrow(
            pa.table({"n_nodes": pa.array([0], pa.int64()),
                      "n_edges": pa.array([0], pa.int64()),
                      "n_triangles": pa.array([0], pa.int64())})
        )
    if m <= SMALL_GRAPH_EDGES:
        df = edges.to_pandas()
        n, e, t = _triangles_driver(
            df[col_a].to_numpy().astype(np.int64),
            df[col_b].to_numpy().astype(np.int64),
        )
        return rd.from_arrow(
            pa.table({"n_nodes": pa.array([n], pa.int64()),
                      "n_edges": pa.array([e], pa.int64()),
                      "n_triangles": pa.array([t], pa.int64())})
        )

    def sym(t: pa.Table) -> pa.Table:
        a = t[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (a >= b).any():
            raise ValueError("triangle_count: edges must be canonical (a < b)")
        if len(a) and (b >= 2**31).any():
            raise ValueError("triangle_count: node ids must fit 31 bits")
        return pa.table(
            {"node": pa.array(np.concatenate([a, b])),
             "one": pa.array(np.ones(2 * len(a), dtype=np.int64))}
        )

    deg = grouped_agg(
        edges.map_batches(sym, batch_format="pyarrow", batch_size=None),
        ["node"], [("one", "sum", "deg")],
    ).materialize()
    n_nodes = deg.count()

    def a_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.compute.cast(t[col_a], pa.int64()),
             "other": pa.compute.cast(t[col_b], pa.int64())}
        )

    withda = equi_join(deg, edges.map_batches(a_key, batch_format="pyarrow",
                                              batch_size=None),
                       "node", ["deg"], ["other"])

    def b_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["other"], "a_node": t["node"], "deg_a": t["deg"]}
        )

    withdb = equi_join(deg,
                       withda.map_batches(b_key, batch_format="pyarrow",
                                          batch_size=None),
                       "node", ["deg"], ["a_node", "deg_a"])

    def orient(t: pa.Table) -> pa.Table:
        b = t["node"].to_numpy(zero_copy_only=False)
        db = t["deg"].to_numpy(zero_copy_only=False)
        a = t["a_node"].to_numpy(zero_copy_only=False)
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        du = np.where(a_first, da, db)
        dv = np.where(a_first, db, da)
        return pa.table(
            {"u": pa.array(u), "v": pa.array(v),
             "du": pa.array(du), "dv": pa.array(dv)}
        )

    oriented = withdb.map_batches(orient, batch_format="pyarrow",
                                  batch_size=None).materialize()

    left = oriented.map_batches(
        lambda t: pa.table({"u": t["u"], "v1": t["v"], "dv1": t["dv"]}),
        batch_format="pyarrow", batch_size=None,
    )
    right = oriented.map_batches(
        lambda t: pa.table({"u": t["u"], "v2": t["v"], "dv2": t["dv"]}),
        batch_format="pyarrow", batch_size=None,
    )
    from .joinmany import join_many

    wedges = join_many(left, right, "u", ["v1", "dv1"], ["v2", "dv2"])

    def wedge_keys(t: pa.Table) -> pa.Table:
        v1 = t["v1"].to_numpy(zero_copy_only=False)
        v2 = t["v2"].to_numpy(zero_copy_only=False)
        d1 = t["dv1"].to_numpy(zero_copy_only=False)
        d2 = t["dv2"].to_numpy(zero_copy_only=False)
        keep = (d1 < d2) | ((d1 == d2) & (v1 < v2))
        key = (v1[keep] << 32) | v2[keep]
        return pa.table({"pairkey": pa.array(key),
                         "one": pa.array(np.ones(len(key), dtype=np.int64))})

    wcounts = grouped_agg(
        wedges.map_batches(wedge_keys, batch_format="pyarrow", batch_size=None),
        ["pairkey"], [("one", "sum", "n_wedges")],
        types={"pairkey": pa.int64(), "one": pa.int64()},
    )
    ekeys = oriented.map_batches(
        lambda t: pa.table(
            {"pairkey": pa.array(
                (t["u"].to_numpy(zero_copy_only=False) << 32)
                | t["v"].to_numpy(zero_copy_only=False)),
             "marker": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow", batch_size=None,
    )
    closed = equi_join(ekeys, wcounts, "pairkey", ["marker"], ["n_wedges"])
    tri = sum(
        int(b["n_wedges"].sum() or 0)
        for b in closed.select_columns(["n_wedges"]).iter_batches(batch_format="pandas")
    )
    return rd.from_arrow(
        pa.table({"n_nodes": pa.array([int(n_nodes)], pa.int64()),
                  "n_edges": pa.array([int(m)], pa.int64()),
                  "n_triangles": pa.array([tri], pa.int64())})
    )


def _kcore_driver(src: np.ndarray, dst: np.ndarray, k: int) -> tuple[pd.DataFrame, int]:
    a, b = src, dst
    rounds = 0
    while len(a):
        # hash factorization per peel round (order-free) — see _pagerank_driver
        inv, nodes = pd.factorize(np.concatenate([a, b]), sort=False)
        # input is SYMMETRIZED: each undirected edge appears in both
        # directions, so a node's degree is its src-column count alone
        deg = np.bincount(inv[: len(a)], minlength=len(nodes))
        ok = deg >= k
        if ok.all():
            return (
                pd.DataFrame(
                    {"node": pd.array(nodes, dtype="int64"),
                     "deg": pd.array(deg.astype(np.int64), dtype="int64")}
                ),
                rounds,
            )
        keep = ok[inv[: len(a)]] & ok[inv[len(a):]]
        a, b = a[keep], b[keep]
        rounds += 1
    return (
        pd.DataFrame({"node": pd.array([], dtype="int64"),
                      "deg": pd.array([], dtype="int64")}),
        rounds,
    )


def kcore(edges: rd.Dataset, k: int, max_rounds: int = 100) -> rd.Dataset:
    """k-core of an undirected graph given as a SYMMETRIZED (node, dst)
    edge list: iteratively peel nodes of degree < k until the remaining
    subgraph's every node has degree ≥ k; return (node, deg) over the core
    — deg measured WITHIN the core.  The standard dense-subgraph pruning a
    near-dup pair graph gets before manual review (peel incidental pair
    nodes, keep the heavily duplicated cores).

    Distributed path (> SMALL_GRAPH_EDGES): per peel round, ONE grouped
    degree count, a driver fixpoint check on the O(1) survivor count, and
    two unique-keyed sorted-merge semi-filters (survivor markers joined on
    each endpoint) — edges stay distributed, driver state is one integer
    per round, and lineage is cut per round like pagerank's.  Rounds are
    bounded by max_rounds with a loud failure (the peeling depth of real
    graphs is tiny; a bound violation means a pathological chain).  Below
    the gate the same peeling runs vectorized on a gathered edge array —
    row-identical, both paths test-forced."""
    cols = edges.columns()
    assert cols[:2] == ["node", "dst"], f"kcore edges need (node, dst), got {cols}"
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64())})
    edges = edges.materialize()
    m = edges.count()
    if m == 0:
        return rd.from_arrow(empty)
    if m <= SMALL_GRAPH_EDGES:
        df = edges.to_pandas()
        out, _ = _kcore_driver(
            df["node"].to_numpy().astype(np.int64),
            df["dst"].to_numpy().astype(np.int64),
            k,
        )
        return rd.from_pandas(out) if len(out) else rd.from_arrow(empty)

    def count_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"],
             "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        )

    cur = edges
    for _ in range(max_rounds):
        deg = grouped_agg(
            cur.map_batches(count_cols, batch_format="pyarrow", batch_size=None),
            ["node"], [("one", "sum", "deg")],
            types={"node": pa.int64(), "one": pa.int64()},
        ).materialize()
        surv = deg.filter(expr=f"deg >= {int(k)}").materialize()
        n_surv = surv.count()
        if n_surv == 0:
            return rd.from_arrow(empty)
        if n_surv == deg.count():  # nobody dropped: fixpoint
            return surv.select_columns(["node", "deg"])
        keep_a = equi_join(surv.select_columns(["node"]).map_batches(
            lambda t: t.append_column("m", pa.array(np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow", batch_size=None,
        ), cur, "node", ["m"], ["dst"]).select_columns(["node", "dst"])
        swapped = keep_a.map_batches(
            lambda t: pa.table({"node": t["dst"], "dst": t["node"]}),
            batch_format="pyarrow", batch_size=None,
        )
        kept = equi_join(surv.select_columns(["node"]).map_batches(
            lambda t: t.append_column("m", pa.array(np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow", batch_size=None,
        ), swapped, "node", ["m"], ["dst"]).map_batches(
            lambda t: pa.table({"node": t["dst"], "dst": t["node"]}),
            batch_format="pyarrow", batch_size=None,
        )
        cur = _lineage_cut(kept.materialize())
    raise RuntimeError(f"kcore: no fixpoint within {max_rounds} peel rounds")


# ---------------------------------------------------------------------------
# Per-edge neighborhood Jaccard similarity (link-prediction feature)
# ---------------------------------------------------------------------------

_JAC_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("deg_a", pa.int64()),
     ("deg_b", pa.int64()), ("n_common", pa.int64()),
     ("jaccard_e6", pa.int64())]
)


def _jaccard_e6(n_common: np.ndarray, deg_a: np.ndarray, deg_b: np.ndarray) -> np.ndarray:
    """round-half-up(1e6 * |N(a)∩N(b)| / |N(a)∪N(b)|) in PURE int64 —
    (2e6·n + d) // (2d) with d = deg_a + deg_b - n_common, mirrored verbatim
    in the SQL oracle so no float division can disagree at a boundary.
    d ≥ 1 always: (a,b) being an edge puts b ∈ N(a), so the union is
    non-empty (self-loops are rejected by the canonical a < b contract)."""
    d = deg_a + deg_b - n_common
    return (2_000_000 * n_common + d) // (2 * d)


def _edge_jaccard_driver(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    # identical validation to _triangles_driver so malformed input fails
    # the same on both sides of the size gate
    if len(a) and (a >= b).any():
        raise ValueError("edge_jaccard: edges must be canonical (a < b)")
    if len(a) and (b >= 2**31).any():
        raise ValueError("edge_jaccard: node ids must fit 31 bits")
    if len(np.unique((a << 32) | b)) != len(a):
        raise ValueError("edge_jaccard: duplicate edges (pairs must be unique)")
    inv, _nodes = pd.factorize(np.concatenate([a, b]), sort=False)
    n = len(_nodes)
    ai, bi = inv[: len(a)], inv[len(a):]
    deg = (np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)).astype(np.int64)
    nbrs: list[set] = [set() for _ in range(n)]
    for u, v in zip(ai.tolist(), bi.tolist()):
        nbrs[u].add(v)
        nbrs[v].add(u)
    n_common = np.fromiter(
        (len(nbrs[u] & nbrs[v]) for u, v in zip(ai.tolist(), bi.tolist())),
        dtype=np.int64, count=len(ai),
    )
    da, db = deg[ai], deg[bi]
    return pd.DataFrame(
        {
            "a": pd.array(a, dtype="int64"),
            "b": pd.array(b, dtype="int64"),
            "deg_a": pd.array(da, dtype="int64"),
            "deg_b": pd.array(db, dtype="int64"),
            "n_common": pd.array(n_common, dtype="int64"),
            "jaccard_e6": pd.array(_jaccard_e6(n_common, da, db), dtype="int64"),
        }
    )


def _wedge_machinery(edges: rd.Dataset, m: int, col_a: str, col_b: str, op: str):
    """Shared distributed machinery of the common-neighbor family
    (edge_jaccard / link_predict): validated symmetric adjacency, degrees,
    the degree-attached packed edge list, and the grouped wedge-pair
    counts (full-adjacency join_many self-join — each unordered neighbor
    pair of a center is one common-neighbor witness).  Returns
    (adj, deg, packed_edges, wcounts)."""

    def sym(t: pa.Table) -> pa.Table:
        a = t[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (a >= b).any():
            raise ValueError(f"{op}: edges must be canonical (a < b)")
        if len(a) and (b >= 2**31).any():
            raise ValueError(f"{op}: node ids must fit 31 bits")
        return pa.table(
            {"node": pa.array(np.concatenate([a, b])),
             "nbr": pa.array(np.concatenate([b, a])),
             "one": pa.array(np.ones(2 * len(a), dtype=np.int64))}
        )

    adj = edges.map_batches(sym, batch_format="pyarrow", batch_size=None).materialize()
    deg = grouped_agg(adj, ["node"], [("one", "sum", "deg")]).materialize()

    # explicit pair-uniqueness check (the driver path's np.unique check,
    # distributed): one grouped count over packed pair keys — an outer
    # join downstream tolerates duplicate deferred edge keys, so it cannot
    # be relied on to enforce the contract
    n_distinct = grouped_agg(
        edges.map_batches(
            lambda t: pa.table(
                {"pairkey": pa.array(
                    (t[col_a].to_numpy(zero_copy_only=False).astype(np.int64) << 32)
                    | t[col_b].to_numpy(zero_copy_only=False).astype(np.int64)),
                 "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow", batch_size=None,
        ),
        ["pairkey"], [("one", "sum", "n")],
        types={"pairkey": pa.int64(), "one": pa.int64()},
    ).count()
    if n_distinct != m:
        raise ValueError(f"{op}: duplicate edges (pairs must be unique)")

    # degree-attached packed edge list (the triangle_count attach pattern)
    def a_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.compute.cast(t[col_a], pa.int64()),
             "other": pa.compute.cast(t[col_b], pa.int64())}
        )

    withda = equi_join(deg, edges.map_batches(a_key, batch_format="pyarrow",
                                              batch_size=None),
                       "node", ["deg"], ["other"])
    withdb = equi_join(
        deg,
        withda.map_batches(
            lambda t: pa.table({"node": t["other"], "a_node": t["node"],
                                "deg_a": t["deg"]}),
            batch_format="pyarrow", batch_size=None,
        ),
        "node", ["deg"], ["a_node", "deg_a"],
    )
    packed_edges = withdb.map_batches(
        lambda t: pa.table(
            {"pairkey": pa.array(
                (t["a_node"].to_numpy(zero_copy_only=False) << 32)
                | t["node"].to_numpy(zero_copy_only=False)),
             "deg_a": t["deg_a"],
             "deg_b": t["deg"]}
        ),
        batch_format="pyarrow", batch_size=None,
    )

    from .joinmany import join_many

    left = adj.map_batches(
        lambda t: pa.table({"u": t["node"], "v1": t["nbr"]}),
        batch_format="pyarrow", batch_size=None,
    )
    right = adj.map_batches(
        lambda t: pa.table({"u": t["node"], "v2": t["nbr"]}),
        batch_format="pyarrow", batch_size=None,
    )
    wedges = join_many(left, right, "u", ["v1"], ["v2"])

    def wedge_keys(t: pa.Table) -> pa.Table:
        v1 = t["v1"].to_numpy(zero_copy_only=False)
        v2 = t["v2"].to_numpy(zero_copy_only=False)
        keep = v1 < v2
        return pa.table(
            {"pairkey": pa.array((v1[keep] << 32) | v2[keep]),
             "one": pa.array(np.ones(int(keep.sum()), dtype=np.int64))}
        )

    wcounts = grouped_agg(
        wedges.map_batches(wedge_keys, batch_format="pyarrow", batch_size=None),
        ["pairkey"], [("one", "sum", "n_common")],
        types={"pairkey": pa.int64(), "one": pa.int64()},
    )
    return adj, deg, packed_edges, wcounts


def edge_jaccard(edges: rd.Dataset, col_a: str = "a", col_b: str = "b") -> rd.Dataset:
    """Neighborhood Jaccard similarity of every edge of an undirected graph
    given as CANONICAL unique pairs (col_a < col_b, ids < 2³¹): per edge
    (a, b) — degrees, common-neighbor count, and
    jaccard_e6 = round(1e6 · |N(a)∩N(b)| / |N(a)∪N(b)|), the standard
    link-prediction / edge-strength feature (e.g. Liben-Nowell & Kleinberg
    2003) and the graph analog of the dedup pipeline's set Jaccard.

    Size-gated like triangle_count: a driver path for edge lists that fit
    one node, else a fully distributed plan from the existing exchange
    primitives — wedges per center via join_many of the full adjacency with
    itself (each unordered neighbor pair counted once per common center),
    grouped wedge counts per packed pair key, and one outer equi_join back
    to the degree-attached edge list (edges with zero common neighbors
    survive with n_common = 0).  Unlike triangle counting there is no
    degree orientation to hide hub cost: exact per-edge common-neighbor
    counts are inherently Σ deg² wedge work — the same self-join every SQL
    statement of this query performs — so feed this operator thresholded /
    domain-bounded graphs, not raw hub-skewed corpora."""
    edges = edges.materialize()
    m = edges.count()
    if m == 0:
        return rd.from_arrow(_JAC_SCHEMA.empty_table())
    if m <= SMALL_GRAPH_EDGES:
        df = edges.to_pandas()
        out = _edge_jaccard_driver(
            df[col_a].to_numpy().astype(np.int64),
            df[col_b].to_numpy().astype(np.int64),
        )
        return rd.from_arrow(
            pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        )

    adj, deg, packed_edges, wcounts = _wedge_machinery(
        edges, m, col_a, col_b, "edge_jaccard"
    )

    # outer join keeps zero-common edges (null n_common) AND emits non-edge
    # wedge pairs with null degrees — dropped by the deg_a filter below
    joined = equi_join(packed_edges, wcounts, "pairkey",
                       ["deg_a", "deg_b"], ["n_common"], how="outer")

    def finish(t: pa.Table) -> pa.Table:
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        real = ~pd.isna(da)
        da = da[real].astype(np.int64)
        db = t["deg_b"].to_numpy(zero_copy_only=False)[real].astype(np.int64)
        nc = t["n_common"].to_numpy(zero_copy_only=False)[real]
        nc = np.where(pd.isna(nc), 0, nc).astype(np.int64)
        key = t["pairkey"].to_numpy(zero_copy_only=False)[real].astype(np.int64)
        return pa.table(
            {
                "a": pa.array(key >> 32),
                "b": pa.array(key & ((1 << 32) - 1)),
                "deg_a": pa.array(da),
                "deg_b": pa.array(db),
                "n_common": pa.array(nc),
                "jaccard_e6": pa.array(_jaccard_e6(nc, da, db)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


def _link_predict_driver(a: np.ndarray, b: np.ndarray, k: int) -> pd.DataFrame:
    # same validation as _edge_jaccard_driver (contract aligned across gates)
    if len(a) and (a >= b).any():
        raise ValueError("link_predict: edges must be canonical (a < b)")
    if len(a) and (b >= 2**31).any():
        raise ValueError("link_predict: node ids must fit 31 bits")
    if len(np.unique((a << 32) | b)) != len(a):
        raise ValueError("link_predict: duplicate edges (pairs must be unique)")
    edge_set = set(((a << 32) | b).tolist())
    nbrs: dict[int, list] = {}
    for u, v in zip(a.tolist(), b.tolist()):
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    counts: dict[int, int] = {}
    for c, vs in nbrs.items():
        vs = sorted(vs)
        for x in range(len(vs)):
            for y in range(x + 1, len(vs)):
                key = (vs[x] << 32) | vs[y]
                counts[key] = counts.get(key, 0) + 1
    cand = [(key, n) for key, n in counts.items() if key not in edge_set]
    cand.sort(key=lambda t: (-t[1], t[0]))
    cand = cand[:k]
    return pd.DataFrame(
        {
            "a": pd.array([key >> 32 for key, _ in cand], dtype="int64"),
            "b": pd.array([key & ((1 << 32) - 1) for key, _ in cand], dtype="int64"),
            "n_common": pd.array([n for _, n in cand], dtype="int64"),
        }
    )


def link_predict(edges: rd.Dataset, k: int = 20,
                 col_a: str = "a", col_b: str = "b") -> pd.DataFrame:
    """Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003):
    the top-k NON-edge node pairs ranked by common-neighbor count
    (tiebreak a asc, b asc) — "which edge is most likely missing", the
    completion query a derived knowledge/trade graph gets asked first.

    Distributed path: the shared wedge machinery (_wedge_machinery) gives
    grouped common-neighbor counts per packed pair; one outer equi_join
    against the (marker-carrying) edge list leaves exactly the non-edge
    pairs (null marker), and the top-k is the restriction-exact partial
    funnel (skew.partial_topk_pandas) — O(blocks·k) driver rows, never
    the full candidate table.  Same Σ deg² wedge caveat as edge_jaccard."""
    edges = edges.materialize()
    m = edges.count()
    if m == 0:
        return pd.DataFrame(
            {"a": pd.array([], dtype="int64"),
             "b": pd.array([], dtype="int64"),
             "n_common": pd.array([], dtype="int64")}
        )
    if m <= SMALL_GRAPH_EDGES:
        df = edges.to_pandas()
        return _link_predict_driver(
            df[col_a].to_numpy().astype(np.int64),
            df[col_b].to_numpy().astype(np.int64),
            k,
        )

    _adj, _deg, packed_edges, wcounts = _wedge_machinery(
        edges, m, col_a, col_b, "link_predict"
    )
    marked = packed_edges.map_batches(
        lambda t: pa.table(
            {"pairkey": t["pairkey"],
             "is_edge": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow", batch_size=None,
    )
    joined = equi_join(marked, wcounts, "pairkey", ["is_edge"], ["n_common"],
                       how="outer")

    def non_edges(t: pa.Table) -> pd.DataFrame:
        ie = t["is_edge"].to_numpy(zero_copy_only=False)
        nc = t["n_common"].to_numpy(zero_copy_only=False)
        keep = pd.isna(ie) & ~pd.isna(nc)
        key = t["pairkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        return pd.DataFrame(
            {
                "a": pd.array(key >> 32, dtype="int64"),
                "b": pd.array(key & ((1 << 32) - 1), dtype="int64"),
                "n_common": pd.array(nc[keep].astype(np.int64), dtype="int64"),
            }
        )

    from .skew import partial_topk_pandas

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n_common", "a", "b"],
                             ascending=[False, True, True],
                             kind="mergesort").head(k)

    cands = joined.map_batches(non_edges, batch_format="pyarrow", batch_size=None)
    return partial_topk_pandas(cands, pick)
