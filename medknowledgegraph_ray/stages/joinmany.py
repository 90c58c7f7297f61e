"""Many-to-many distributed equi-join (sorted-merge run expansion).

stages/join.py's equi_join enforces the dimension-table contract (build
unique per key) because it binds each probe row to ONE build row by
searchsorted.  This module is the general M:N case — fact ⋈ fact — where
both sides may repeat a key and the join must emit the full cross product
of each key's runs:

- tag left rows kind 0 / right rows kind 1, null-fill the opposite side's
  payload columns (Arrow, so dtypes never widen), union, ONE global sort
  on (key, kind) — each key's rows land contiguous, left before right;
- per block, interior key runs expand vectorized: every left row of a run
  is repeated by the run's right count, and the matching right rows are
  gathered by an arange-offset trick — no Python loop over keys or rows;
- rows at a block's first/last key defer with their FULL payloads (≤ 2
  keys per block regardless of corpus size); the repair pass re-joins the
  deferred keys driver-side under windows.EDGE_REPAIR_DRIVER_MAX, or via
  a distributed per-key map_groups above it.

Skew note (the 100-TB contract): a key with L left and R right rows emits
L·R pairs — inherent to the operator, not the implementation.  A run's
expansion happens inside the block that owns it, and MAX_PAIRS_PER_BLOCK
fails loudly when one block would materialize an absurd cross product
(pre-filter or salt the hot key upstream; the same guard philosophy as
dedupe.MAX_BUCKET).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _sort_blocks() -> int:
    from .. import config

    return config.sort_blocks()

from .join import _arrow_types

# one block materializing more pairs than this means a pathological hot
# key reached the join unfiltered — fail loudly rather than OOM the worker
MAX_PAIRS_PER_BLOCK = 1 << 24


def join_many(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_cols: list[str],
    right_cols: list[str],
    types: dict | None = None,
) -> rd.Dataset:
    """INNER join of two multi-keyed sides on int64 `key`: one output row
    per (left row, right row) pair sharing a key.  `left_cols` and
    `right_cols` must be disjoint (rename upstream).  Output columns:
    key, then left_cols, then right_cols."""
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"join_many: payload columns collide: {sorted(overlap)}")
    out_names = [key] + left_cols + right_cols

    declared = types
    types = _arrow_types(left, left_cols, declared)
    types.update(_arrow_types(right, right_cols, declared))

    def tag(side_cols: list[str], kind: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                key: pc.cast(t[key], pa.int64()),
                "__kind": pa.array(np.full(n, kind, dtype=np.int8)),
            }
            for c in left_cols + right_cols:
                cols[c] = t[c] if c in side_cols else pa.nulls(n, type=types[c])
            return pa.table(cols)

        return f

    unioned = (
        left.map_batches(tag(left_cols, 0), batch_format="pyarrow", batch_size=None)
        .union(right.map_batches(tag(right_cols, 1), batch_format="pyarrow", batch_size=None))
        .repartition(_sort_blocks())
        .sort([key, "__kind"])
    )

    def resolve(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                **{c: pa.nulls(0, type=pa.int64() if c == key else types[c])
                   for c in out_names},
                "__edge": pa.array([], pa.bool_()),
                "__kindd": pa.array([], pa.int8()),
            }
        )
        if t.num_rows == 0:
            return empty
        k = t[key].to_numpy(zero_copy_only=False)
        kind = t["__kind"].to_numpy(zero_copy_only=False)
        flagged = (k == k[0]) | (k == k[-1])
        inner_mask = ~flagged
        ki = k[inner_mask]
        kindi = kind[inner_mask]
        gidx = np.flatnonzero(inner_mask)  # global row index per interior row

        parts = []
        if len(ki):
            # run ids over the interior rows (keys are sorted)
            starts = np.ones(len(ki), dtype=bool)
            starts[1:] = ki[1:] != ki[:-1]
            run = np.cumsum(starts) - 1
            n_runs = int(run[-1]) + 1
            nl = np.bincount(run[kindi == 0], minlength=n_runs)
            nr = np.bincount(run[kindi == 1], minlength=n_runs)
            total = int((nl * nr).sum())
            if total > MAX_PAIRS_PER_BLOCK:
                hot = int(np.argmax(nl * nr))
                raise AssertionError(
                    f"join_many: block would emit {total} pairs "
                    f"(hottest key emits {int((nl * nr)[hot])}) — pre-filter "
                    "or salt the hot key upstream (MAX_PAIRS_PER_BLOCK)"
                )
            if total:
                l_rows = gidx[kindi == 0]          # global idx of left rows
                l_run = run[kindi == 0]
                r_rows = gidx[kindi == 1]
                r_run = run[kindi == 1]
                # start offset of each run's right rows within r_rows
                r_start = np.zeros(n_runs, dtype=np.int64)
                r_start[1:] = np.cumsum(nr)[:-1]
                reps = nr[l_run]                   # each left row pairs with its run's right count
                li = np.repeat(l_rows, reps)       # left side of every pair
                # within-group arange: 0..reps-1 per left row
                cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
                within = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(cum, reps)
                ri = r_rows[np.repeat(r_start[l_run], reps) + within]
                li_a = pa.array(li, pa.int64())
                ri_a = pa.array(ri, pa.int64())
                cols = {key: t[key].take(li_a)}
                for c in left_cols:
                    cols[c] = t[c].take(li_a)
                for c in right_cols:
                    cols[c] = t[c].take(ri_a)
                cols["__edge"] = pa.array(np.zeros(len(li), dtype=bool))
                cols["__kindd"] = pa.array(np.zeros(len(li), dtype=np.int8))
                parts.append(pa.table(cols))

        if flagged.any():
            d_idx = pa.array(np.flatnonzero(flagged), pa.int64())
            dcols = {c: t[c].take(d_idx) for c in out_names}
            dcols["__edge"] = pa.array(np.ones(len(d_idx), dtype=bool))
            dcols["__kindd"] = pa.array(kind[flagged].astype(np.int8))
            parts.append(pa.table(dcols))
        if not parts:
            return empty
        out = pa.concat_tables(parts)
        # normalize dtypes against the declared contract (an all-null edge
        # column from a pandas-lineage input could have drifted)
        fields = {c: (pa.int64() if c == key else types[c]) for c in out_names}
        cols = {}
        for c in out_names:
            col = out[c]
            cols[c] = col if col.type == fields[c] else pc.cast(col, fields[c])
        cols["__edge"] = out["__edge"]
        cols["__kindd"] = out["__kindd"]
        return pa.table(cols)

    flagged = unioned.map_batches(
        resolve, batch_format="pyarrow", batch_size=None
    ).materialize()
    if flagged.schema() is None:
        return rd.from_arrow(pa.schema(
            [(c, pa.int64() if c == key else types[c]) for c in out_names]
        ).empty_table())
    interior = flagged.filter(expr="__edge == False").drop_columns(["__edge", "__kindd"])
    edge_src = flagged.filter(expr="__edge == True").materialize()

    from .windows import EDGE_REPAIR_DRIVER_MAX

    if edge_src.count() == 0:
        return interior
    if edge_src.count() <= EDGE_REPAIR_DRIVER_MAX:
        edf = edge_src.to_pandas()
        lf = edf[edf["__kindd"] == 0][[key] + left_cols]
        rf = edf[edf["__kindd"] == 1][[key] + right_cols]
        rep = lf.merge(rf, on=key, how="inner")[out_names]
        if not len(rep):
            return interior
        rep_t = pa.Table.from_pandas(rep, preserve_index=False).replace_schema_metadata(None)
        fields = {c: (pa.int64() if c == key else types[c]) for c in out_names}
        rep_t = pa.table({c: (rep_t[c] if rep_t[c].type == fields[c]
                              else pc.cast(rep_t[c], fields[c])) for c in out_names})
        return interior.union(rd.from_arrow(rep_t))

    fields = {c: (pa.int64() if c == key else types[c]) for c in out_names}

    def fix(g: pd.DataFrame) -> pa.Table:
        lf = g[g["__kindd"] == 0][[key] + left_cols]
        rf = g[g["__kindd"] == 1][[key] + right_cols]
        rep = lf.merge(rf, on=key, how="inner")[out_names]
        # Arrow out, typed per the declared contract (the edge rows'
        # null-filled opposite-side columns float-promote through pandas;
        # the inner merge leaves no nulls, so the cast back is exact) —
        # and the union with the Arrow interior must be block-type-uniform
        # or any downstream exchange's block builder asserts
        return pa.table({
            c: pa.array(rep[c], type=fields[c], from_pandas=True)
            for c in out_names
        })

    return interior.union(
        edge_src.groupby(key).map_groups(fix, batch_format="pandas")
    )
