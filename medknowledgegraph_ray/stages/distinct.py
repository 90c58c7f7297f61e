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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

from .. import config

_N = "__distinct_n"
_EDGE = "__edge"


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
    """Aggregate-based distinct for small inputs (the Count column is
    dropped after).  Fine when the exchange is at most thousands of rows."""
    agg = ds.map_batches(
        _block_distinct(keys), batch_format="pyarrow", zero_copy_batch=True
    ).groupby(
        keys if len(keys) > 1 else keys[0], num_partitions=blocks
    ).aggregate(Count(alias_name=_N))
    return agg.map_batches(
        lambda t: t.drop_columns([_N]), batch_format="pyarrow", zero_copy_batch=True
    )


def distinct(ds: rd.Dataset, keys: list[str], *, blocks: int | None = None) -> rd.Dataset:
    """Distinct rows over `keys` (other columns dropped), fully vectorized.

    `blocks=1` selects the small-input aggregate path (single tiny reduce);
    otherwise the parallel sort + boundary-repair path described above.
    """
    if blocks == 1:
        return _small_distinct(ds, keys, 1)

    pre = ds.map_batches(
        _block_distinct(keys), batch_format="pyarrow", zero_copy_batch=True
    )
    flagged = pre.sort(keys).map_batches(
        _consecutive_dedup_and_flag(keys), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two consumers below; without this the sort runs twice

    interior = flagged.filter(expr=f"{_EDGE} == False").map_batches(
        lambda t: t.drop_columns([_EDGE]), batch_format="pyarrow", zero_copy_batch=True
    )
    edges = flagged.filter(expr=f"{_EDGE} == True").map_batches(
        lambda t: t.drop_columns([_EDGE]), batch_format="pyarrow", zero_copy_batch=True
    )
    return interior.union(_small_distinct(edges, keys, 1))
