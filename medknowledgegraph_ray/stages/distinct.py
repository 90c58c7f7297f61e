"""Vectorized distributed distinct.

Ray 2.49 measurements on this workload (4.4M mention rows → 1.94M distinct,
32 CPUs): `groupby().aggregate()` runs its exchange effectively serially
(17.6 s regardless of num_partitions; HASH_SHUFFLE strategy is worse
still, 54 s), while `Dataset.sort` parallelizes cleanly (3.7 s).  So the
global distinct here is built on the SORT exchange:

  1. per-block partial distinct (Arrow `group_by`, bounds what moves),
  2. global range sort on the keys (parallel map + reduce),
  3. per-block consecutive dedup (vectorized compare of adjacent rows),
  4. exact boundary repair: after a global sort, equal rows are contiguous,
     so only each block's FIRST and LAST key can also appear in a
     neighboring block.  Rows strictly interior to a block's key range are
     provably unique corpus-wide; the ≤ 2·#blocks edge rows go through a
     tiny grouped distinct.

No assumption about how the sort splits partitions into blocks — only that
the output is globally sorted, which `sort` guarantees.
"""

from __future__ import annotations

import hashlib
from contextlib import contextmanager

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import config

_EDGE = "__edge"

# --- conv-local contract guard -------------------------------------------
# group_local_distinct (and its siblings in assemble/abbrev) silently emit
# duplicate interior rows if the clustering contract is violated — e.g. a
# shuffled corpus, or committed shard files re-read in an order that splits
# a group across non-adjacent files.  Each block therefore piggybacks ONE
# summary row onto its (already driver-gathered) edge rows: the block's
# first/last group key plus a KMV sketch (the GUARD_K smallest 64-bit
# hashes of the block's INTERIOR distinct group keys — first/last
# excluded).  The driver then checks, in O(blocks × GUARD_K) with no
# exchange and the edge gather run under preserve_order:
#   1. boundary contiguity — a first/last key recurring in a non-adjacent
#      block, or in an adjacent block without being the bridge key
#      (last(i) == first(i+1)), proves a split group;
#   2. interior-key uniqueness — under the contract a key that is interior
#      to a block (not its first/last) cannot occur in ANY other block, so
#      any sketched hash present twice, or equal to another block's
#      boundary-key hash, proves a split group.  A shuffled layout is
#      detected with near certainty (the globally smallest hashes land in
#      every containing block's sketch); a single split group is caught
#      exactly when it touches a block boundary (the committed-file
#      hazard) and probabilistically otherwise.
GUARD_K = 256
_GF, _GL, _GKMV = "__gf", "__gl", "__gkmv"
GUARD_COLS = [_GF, _GL, _GKMV]


class ContractError(ValueError):
    """The conversation-local shard contract does not hold for this input."""


def _key_hash(v: str) -> int:
    # signed 64-bit so sketch values fit Arrow/pandas int64 columns;
    # any consistent total order works for the KMV property
    return int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big", signed=True)


def guard_sketch(interior_keys) -> bytes:
    """The GUARD_K smallest 64-bit key hashes, packed little-endian int64
    (bytes survive pandas<->Arrow block conversions unmangled, unlike
    variable-length list columns)."""
    if len(interior_keys) == 0:
        return b""
    hashes = np.fromiter(
        (_key_hash(str(k)) for k in interior_keys),
        dtype=np.int64,
        count=len(interior_keys),
    )
    return np.sort(hashes)[:GUARD_K].tobytes()


def guard_arrays(
    n_rows: int, summary_idx: int, first, last, interior_keys
) -> list[pa.Array]:
    """Arrays for the three guard columns: nulls everywhere except one
    summary row at `summary_idx` carrying (first, last, kmv-sketch)."""
    assert 0 <= summary_idx < n_rows

    def col(value_arr: pa.Array, typ) -> pa.Array:
        parts = []
        if summary_idx:
            parts.append(pa.nulls(summary_idx, typ))
        parts.append(value_arr)
        if n_rows - summary_idx - 1:
            parts.append(pa.nulls(n_rows - summary_idx - 1, typ))
        return pa.concat_arrays(parts)

    return [
        col(pa.array([str(first)], pa.string()), pa.string()),
        col(pa.array([str(last)], pa.string()), pa.string()),
        col(pa.array([guard_sketch(interior_keys)], pa.binary()), pa.binary()),
    ]


def check_summaries(
    firsts: list, lasts: list, kmvs: list, group_key: str, where: str
) -> None:
    """Validate per-block guard summaries, in row-stream block order.
    Raises ContractError on a violated conv-local contract."""

    def _raise(key_repr: str, i: int, j: int):
        raise ContractError(
            f"conv-local shard contract violated in {where}: group "
            f"{key_repr} ({group_key}) appears in non-contiguous row-stream "
            f"positions (blocks {i} and {j}). The input is not clustered by "
            f"{group_key} — re-shard the corpus, or set GRAFT_CONV_LOCAL=0 "
            "to use the layout-independent sorted-exchange path."
        )

    # 1. boundary-key contiguity: a key recurring at block boundaries is
    # legal only as a chain of last(i) == first(i+1) bridges
    occ: dict[str, list[int]] = {}
    for i, (f, l) in enumerate(zip(firsts, lasts)):
        for k in {f, l}:
            occ.setdefault(k, []).append(i)
    for k, idxs in occ.items():
        for i, j in zip(idxs, idxs[1:]):
            if j > i + 1 or lasts[i] != k or firsts[j] != k:
                _raise(repr(k), i, j)
    # 2. interior-key uniqueness (sketched): interior keys exclude each
    # block's own boundary keys, so ANY recurrence — in another sketch or
    # as another block's boundary — is a violation
    boundary: dict[int, int] = {}
    for i, (f, l) in enumerate(zip(firsts, lasts)):
        for k in {f, l}:
            boundary.setdefault(_key_hash(k), i)
    seen: dict[int, int] = {}
    for i, kmv in enumerate(kmvs):
        hashes = np.frombuffer(kmv, dtype=np.int64) if kmv else ()
        for h in hashes:
            h = int(h)
            if h in seen and seen[h] != i:
                _raise(f"hash={h:#x}", seen[h], i)
            seen[h] = i
            if h in boundary and boundary[h] != i:
                _raise(f"hash={h:#x}", min(i, boundary[h]), max(i, boundary[h]))


def check_group_contract(edge_tab: pa.Table, group_key: str, where: str) -> pa.Table:
    """Arrow wrapper over check_summaries: validate the guard summary rows
    gathered with the edge rows (order preserved via _ordered_execution);
    returns `edge_tab` without the guard columns."""
    summaries = edge_tab.filter(pc.is_valid(edge_tab[_GF]))
    check_summaries(
        summaries[_GF].to_pylist(),
        summaries[_GL].to_pylist(),
        summaries[_GKMV].to_pylist(),
        group_key,
        where,
    )
    return edge_tab.drop_columns(GUARD_COLS)


@contextmanager
def _ordered_execution():
    """Run dataset executions with preserve_order=True so gathered guard
    summary rows arrive in input-block order (the contract is about STREAM
    adjacency; an out-of-order gather would mis-index legitimate bridges)."""
    ctx = rd.DataContext.get_current()
    old = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        yield
    finally:
        ctx.execution_options.preserve_order = old


def _block_distinct(keys: list[str]):
    def fn(t: pa.Table) -> pa.Table:
        return t.select(keys).group_by(keys).aggregate([])

    return fn


def _consecutive_dedup_and_flag(keys: list[str]):
    """For a block of a globally key-sorted dataset: drop adjacent
    duplicates, then flag the first and last remaining row as edge rows."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(_EDGE, pa.array([], pa.bool_()))
        if n > 1:
            eq = None
            for k in keys:
                col = t[k]
                e = pc.equal(col.slice(1), col.slice(0, n - 1))
                eq = e if eq is None else pc.and_kleene(eq, e)
            keep = np.ones(n, dtype=bool)
            keep[1:] = ~eq.combine_chunks().to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(keep))
        m = t.num_rows
        edge = np.zeros(m, dtype=bool)
        edge[0] = True
        edge[m - 1] = True
        return t.append_column(_EDGE, pa.array(edge))

    return fn


def _small_distinct(ds: rd.Dataset, keys: list[str], blocks: int) -> rd.Dataset:
    """Single-block distinct for small inputs: per-block partial, coalesce
    to one block, one vectorized Arrow combine.  Strictly cheaper than a
    groupby exchange whenever the post-partial data fits one block
    (thousands of rows) — and it keeps an AllToAll operator out of every
    enclosing plan."""
    assert blocks == 1, "single-block combine is only exact with blocks=1"
    return (
        ds.map_batches(_block_distinct(keys), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .repartition(blocks)
        .map_batches(
            _block_distinct(keys),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
    )


def group_local_distinct(
    ds: rd.Dataset, keys: list[str], group_key: str, *, pin: bool = True
) -> rd.Dataset:
    """Exact distinct WITHOUT any exchange, for group-clustered inputs.

    Contract (config.CONV_LOCAL_SHARDS): rows of one `group_key` value are
    CONTIGUOUS in the dataset's row stream — true when shard files are
    conversation-local (each conversation's rows live in one file, the
    standard layout for document corpora) and reads coalesce whole files.
    Under that contract a group spans at most ADJACENT batches, so:

      1. per-batch vectorized distinct (Arrow group_by),
      2. rows whose group equals the batch's first or last group value are
         flagged (only those can repeat in a neighboring batch),
      3. interior rows are final; the tiny edge set gets one single-block
         combine.

    `group_key` must be one of `keys`.  Compare stages/distinct.distinct:
    same interior/edge shape, but clustering replaces the global sort —
    the exchange cost drops from O(data) to zero.
    """
    assert group_key in keys

    def block_pass(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            empty = t.select(keys)
            empty = empty.append_column(_EDGE, pa.array([], pa.bool_()))
            for name, typ in zip(GUARD_COLS, (pa.string(), pa.string(), pa.binary())):
                empty = empty.append_column(name, pa.nulls(0, typ))
            return empty
        g = t.select(keys).group_by(keys).aggregate([])
        first = t[group_key][0]
        last = t[group_key][t.num_rows - 1]
        edge = pc.or_(pc.equal(g[group_key], first), pc.equal(g[group_key], last))
        g = g.append_column(_EDGE, edge)
        # guard summary rides row 0 (always an edge row: Arrow group_by
        # preserves first-occurrence order, so g's first group == `first`);
        # sketch covers interior keys only — boundary keys are checked
        # exactly via the first/last fields
        uniq = pc.unique(t[group_key].combine_chunks())
        interior = uniq.filter(
            pc.and_(pc.not_equal(uniq, first), pc.not_equal(uniq, last))
        ).to_pylist()
        for name, arr in zip(
            GUARD_COLS, guard_arrays(g.num_rows, 0, first, last, interior)
        ):
            g = g.append_column(name, arr)
        return g

    flagged = ds.map_batches(
        block_pass, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    if pin:
        # pin when several consumers will scan the result; with a single
        # downstream consumer, `pin=False` re-runs the cheap block pass for
        # the edge gather and the consumer instead of storing a copy
        with _ordered_execution():
            flagged = flagged.materialize()
    return _resolve_edge_repair(
        flagged, keys, guard=(group_key, "group_local_distinct")
    )


def distinct(ds: rd.Dataset, keys: list[str], *, blocks: int | None = None) -> rd.Dataset:
    """Distinct rows over `keys` (other columns dropped), fully vectorized.

    `blocks=1` selects the small-input aggregate path (single tiny reduce);
    otherwise the parallel sort + boundary-repair path described above.
    """
    if blocks == 1:
        return _small_distinct(ds, keys, 1)

    pre = ds.map_batches(
        _block_distinct(keys), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    # coalesce before the sort: the range exchange creates #map × #reduce
    # shuffle objects, so a many-block input (one block per source file)
    # pays quadratic overhead for tiny per-block data (config.sort_blocks)
    pre = pre.repartition(config.sort_blocks())
    flagged = pre.sort(keys).map_batches(
        _consecutive_dedup_and_flag(keys), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None
    ).materialize()  # pinned once; consumed by interior + edge repair
    return _resolve_edge_repair(flagged, keys)


def _resolve_edge_repair(
    flagged: rd.Dataset, keys: list[str], *, guard: tuple[str, str] | None = None
) -> rd.Dataset:
    """Interior rows stay a lazy filter over the pinned flagged dataset;
    the edge rows (≤ 2 key groups per block — bounded by blocks, never by
    data) are gathered ONCE, combined driver-side, and appended as a single
    literal block.  Resolving eagerly keeps the all-to-all repartition and
    the second full scan out of every CONSUMER's plan — a distinct output
    read N times pays the repair once, and each read is one cheap filter.

    `guard=(group_key, where)` marks a conv-local input carrying guard
    summary columns: the gather runs order-preserving, the summaries are
    contract-checked (ContractError on violation), and the guard columns
    are stripped from both interior and edge outputs."""
    drop = [_EDGE] + (GUARD_COLS if guard else [])
    interior = flagged.filter(expr=f"{_EDGE} == False").map_batches(
        lambda t: t.drop_columns(drop), batch_format="pyarrow", zero_copy_batch=True
    )
    schema = flagged.schema(fetch_if_missing=True)
    if schema is None:  # empty input
        return interior
    if guard:
        with _ordered_execution():
            edge_rows = flagged.filter(expr=f"{_EDGE} == True").take_all()
    else:
        edge_rows = flagged.filter(expr=f"{_EDGE} == True").take_all()
    edge_tab = pa.Table.from_pylist(edge_rows, schema=schema.base_schema)
    if guard:
        edge_tab = check_group_contract(edge_tab, guard[0], guard[1])
    edge_tab = edge_tab.drop_columns([_EDGE])
    deduped = edge_tab.group_by(keys).aggregate([])
    if len(deduped) == 0:
        return interior
    return interior.union(rd.from_arrow(deduped))
