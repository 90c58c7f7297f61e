"""Distributed algebraic grouped aggregation on the parallel sort exchange.

Ray 2.49's `groupby().aggregate()` costs ~0.5 ms PER GROUP in its reduce
(38k-group sliding-window merge: 16.5 s; the exchange is also effectively
serial — see the package __init__ note), which melts at corpus-scale key
cardinality.  This module generalizes the sorted-distinct trick
(stages/distinct.py) to any ALGEBRAIC aggregate (sum/min/max/count):

  1. per-block partial aggregation (vectorized Arrow group_by),
  2. global range sort on the keys (parallel),
  3. per-block COMBINE of partials (Arrow group_by again) with the block's
     first/last key flagged as edge groups,
  4. interior groups are final (a key strictly inside a block's sorted key
     range cannot appear in any other block); the ≤ 2·#blocks edge groups
     are combined once more in a single tiny block.

Combine functions: sum→sum, min→min, max→max, count→sum (the classic
partial-aggregate algebra).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .. import config

_COMBINE = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}
_EDGE = "__edge"


def rename_after_groupby(
    g: pa.Table, keys: list[str], in_cols: list[str], fns: list[str], aliases: list[str]
) -> pa.Table:
    # pyarrow group_by output column order varies across versions (keys
    # first vs last); map aggregate columns by their "{col}_{fn}" names
    cols = {name: g[name] for name in g.column_names}
    out = {k: cols[k] for k in keys}
    for c, f, a in zip(in_cols, fns, aliases):
        out[a] = cols[f"{c}_{f}"]
    return pa.table(out)


_rename_after_groupby = rename_after_groupby


def grouped_agg(
    ds: rd.Dataset, keys: list[str], aggs: list[tuple[str, str, str]],
    types: dict | None = None,
) -> rd.Dataset:
    """aggs = [(input_col, fn, alias)] with fn ∈ {sum, min, max, count}.

    Returns one row per distinct key combination with the aggregate
    aliases; exact under any block split of the sorted exchange.

    `types` (input column → Arrow DataType) lets a caller whose input may
    be COMPLETELY EMPTY still get a typed empty result: Ray drops all
    blocks of an empty dataset through sort/map, leaving no runtime schema
    to recover from."""
    in_cols = [c for c, _, _ in aggs]
    fns = [f for _, f, _ in aggs]
    aliases = [a for _, _, a in aggs]
    combine_fns = [_COMBINE[f] for f in fns]

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(keys + list(dict.fromkeys(in_cols))).group_by(keys).aggregate(
            [(c, f) for c, f in zip(in_cols, fns)]
        )
        return _rename_after_groupby(g, keys, in_cols, fns, aliases)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(a, f) for a, f in zip(aliases, combine_fns)])
        return _rename_after_groupby(g, keys, aliases, combine_fns, aliases)

    def combine_and_flag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(_EDGE, pa.array([], pa.bool_()))
        first = tuple(t[k][0].as_py() for k in keys)
        last = tuple(t[k][n - 1].as_py() for k in keys)
        g = combine(t)
        gk = list(zip(*(g[k].to_pylist() for k in keys)))
        edge = np.array([row == first or row == last for row in gk], dtype=bool)
        return g.append_column(_EDGE, pa.array(edge))

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # coalesce the (already partially-aggregated, small) exchange input —
    # see config.sort_blocks for the quadratic shuffle-object rationale
    pre = pre.repartition(config.sort_blocks())
    flagged = (
        pre.sort(keys)
        .map_batches(combine_and_flag, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .materialize()  # pinned once; consumed by interior + edge repair
    )
    interior = flagged.filter(expr=f"{_EDGE} == False").map_batches(
        lambda t: t.drop_columns([_EDGE]), batch_format="pyarrow", zero_copy_batch=True
    )
    sch = flagged.schema()
    if sch is None:
        # EMPTY input: Ray keeps NO blocks (and no schema) for an empty
        # dataset through map/sort.  With declared input types the exact
        # output schema falls out of running the partial kernel on a typed
        # empty table; without them there is nothing to recover from.
        if types is None:
            raise ValueError(
                f"grouped_agg: empty input and no declared `types` — cannot "
                f"type the empty result (keys={keys}, aggs={aggs})"
            )
        probe = pa.schema(
            [(c, types[c]) for c in keys + [c for c in dict.fromkeys(in_cols)]]
        ).empty_table()
        return rd.from_arrow(partial(probe))
    # edge groups are ≤ 2 per block — gather once, combine driver-side, and
    # append as a literal block, keeping the all-to-all repartition out of
    # every consumer's plan (see distinct._resolve_edge_repair)
    edge_tab = pa.Table.from_pylist(
        flagged.filter(expr=f"{_EDGE} == True").take_all(),
        schema=sch.base_schema,
    ).drop_columns([_EDGE])
    if edge_tab.num_rows == 0:
        return interior
    return interior.union(rd.from_arrow(combine(edge_tab)))
