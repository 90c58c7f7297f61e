"""General distributed equi-join (sorted-merge, broadcast-free).

The repo's KB joins broadcast their small side (stages/enrich.py); this is
the operator for when NEITHER side fits a broadcast — dimension ⋈ fact at
corpus scale.  Shape = the union'd single-sort exchange every keyed
operator here rides (dedupe._attach_sorted, tfidf._attach_df), generalized
to arbitrary payload columns:

- rename payloads apart, null-fill the opposite side's columns, UNION both
  sides (Arrow tables, so null-filling never widens dtypes), ONE global
  sort on (key, kind) — build rows (kind 0) sort before probe rows;
- per block, every interior probe row binds its build row vectorized
  (searchsorted into the block's build keys — after the sort a key's rows
  are contiguous, so an interior probe's build row is co-resident);
- rows at a block's first/last key defer (BOTH sides — an edge key defers
  its complete row set, build payloads included); the repair pass binds
  deferred probe rows against a broadcast lookup built from the ≤ 2·#blocks
  deferred build rows — never a second pass over the build lineage.

Contract: the build (left) side is unique per key — the dimension-table
case.  A probe key absent from the build side inner-joins to nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _arrow_types(ds: rd.Dataset, cols: list[str], declared: dict | None = None) -> dict:
    """Arrow DataType per column.  Caller-declared types win; otherwise the
    Arrow base schema, then a one-batch Arrow peek (Dataset.schema() carries
    Python/numpy types for pandas-block datasets).  An EMPTY pandas-lineage
    dataset (e.g. a funnel step with no qualifying events) has NO schema at
    all — nothing to peek, schema() is None — so undeclared columns there
    fail with a descriptive error instead of a bare StopIteration."""
    declared = declared or {}
    out = {c: declared[c] for c in cols if c in declared}
    need = [c for c in cols if c not in out]
    if not need:
        return out
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        out.update({c: base.field(c).type for c in need})
        return out
    for b in ds.limit(4).iter_batches(batch_format="pyarrow", batch_size=4):
        out.update({c: b.schema.field(c).type for c in need})
        return out
    if sch is not None and getattr(sch, "names", None):
        for name, typ in zip(sch.names, sch.types):
            if name in need:
                out[name] = typ if isinstance(typ, pa.DataType) else pa.from_numpy_dtype(typ)
        need = [c for c in cols if c not in out]
        if not need:
            return out
    raise ValueError(
        f"equi_join: cannot infer Arrow types for columns {need} of an empty "
        "schema-less dataset — pass them via the `types` argument"
    )


def equi_join(
    build: rd.Dataset,
    probe: rd.Dataset,
    key: str,
    build_cols: list[str],
    probe_cols: list[str],
    how: str = "inner",
    types: dict | None = None,
) -> rd.Dataset:
    """Join probe rows to the unique-keyed build side on int64 `key`.

    `how="inner"` drops probe rows with no build match; `how="left"`
    keeps them with null build columns (LEFT OUTER, probe side preserved);
    `how="outer"` additionally keeps build rows with no probe match (FULL
    OUTER) — all on the same single exchange.  Unmatched-build detection
    is exact because after the global sort a key's rows are contiguous:
    an interior build key's probes are co-resident in its block, and an
    edge key defers its COMPLETE row set (both sides), so the repair pass
    decides each deferred build row against that key's full probe set.
    Output columns: key, then build_cols, then probe_cols."""
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"how must be 'inner', 'left' or 'outer', got {how!r}")
    left = how in ("left", "outer")
    outer = how == "outer"
    out_names = [key] + build_cols + probe_cols

    def tag(side_cols: list[str], other_cols: list[str], kind: int, schema_src):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                key: pc_cast_i64(t[key]),
                "__kind": pa.array(np.full(n, kind, dtype=np.int8)),
            }
            for c in build_cols + probe_cols:
                if c in side_cols:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.nulls(n, type=schema_src[c])
            return pa.table(cols)

        return f

    # resolve payload types once so null columns get the right dtype;
    # `types` lets callers whose inputs may be EMPTY pandas-lineage
    # datasets (no schema to peek) declare them up front
    declared = types
    types = _arrow_types(build, build_cols, declared)
    types.update(_arrow_types(probe, probe_cols, declared))

    from .. import config

    # coalesce the union before the range sort: a sort makes #map × #reduce
    # shuffle objects, so two many-block reads union'd straight into it pay
    # the quadratic object count, not data volume (see config.sort_blocks;
    # measured 6.8 s → 2.5 s on the same 750k-row join at sf0.1)
    unioned = (
        build.map_batches(
            tag(build_cols, probe_cols, 0, types), batch_format="pyarrow",
            batch_size=None,
        )
        .union(
            probe.map_batches(
                tag(probe_cols, build_cols, 1, types), batch_format="pyarrow",
                batch_size=None,
            )
        )
        .repartition(config.sort_blocks())
        .sort([key, "__kind"])
    )

    def resolve(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.table(
            {
                **{c: pa.nulls(0, type=pa.int64() if c == key else types[c])
                   for c in out_names},
                "__edge": pa.array([], pa.bool_()),
                "__kindd": pa.array([], pa.int8()),
            }
        )
        if n == 0:
            return empty
        k = t[key].to_numpy(zero_copy_only=False)
        kind = t["__kind"].to_numpy(zero_copy_only=False)
        flagged = (k == k[0]) | (k == k[-1])
        is_b = (kind == 0) & ~flagged
        b_keys = k[is_b]
        # the documented unique-per-key build contract, checked (fail-fast
        # like tfidf._attach_df / components._propagate_block): a duplicate
        # build key would silently bind only the searchsorted row
        if len(b_keys) > 1 and (b_keys[1:] == b_keys[:-1]).any():
            dup = int(b_keys[np.flatnonzero(b_keys[1:] == b_keys[:-1])[0]])
            raise AssertionError(
                f"equi_join: build side has duplicate key {dup} — the build "
                "(left) side must be unique per key (dimension-table contract)"
            )
        is_p = (kind == 1) & ~flagged
        p_keys = k[is_p]
        pos = np.searchsorted(b_keys, p_keys) if len(b_keys) else np.array([], dtype=np.int64)
        if len(p_keys):
            matched = (
                (pos < len(b_keys))
                & (b_keys[np.minimum(pos, max(len(b_keys) - 1, 0))] == p_keys)
                if len(b_keys)
                else np.zeros(len(p_keys), dtype=bool)
            )
        else:
            matched = np.zeros(0, dtype=bool)
        p_idx = np.flatnonzero(is_p)[matched]
        b_idx = np.flatnonzero(is_b)[pos[matched]] if matched.any() else np.array([], dtype=np.int64)

        # every emitted column is cast to its DECLARED type: if any
        # upstream map emitted a schema-less empty pandas block, Ray's
        # pandas-mode sort promotes null-bearing int64 to double for the
        # whole exchange — the cast restores the contract (values are
        # integral, so the cast is exact)
        def typed(col, idx, c):
            want = pa.int64() if c == key else types[c]
            taken = t[col].take(idx)
            return taken if taken.type == want else pc.cast(taken, want)

        cols = {key: typed(key, pa.array(p_idx, pa.int64()), key)}
        for c in build_cols:
            cols[c] = typed(c, pa.array(b_idx, pa.int64()), c)
        for c in probe_cols:
            cols[c] = typed(c, pa.array(p_idx, pa.int64()), c)
        cols["__edge"] = pa.array(np.zeros(len(p_idx), dtype=bool))
        cols["__kindd"] = pa.array(np.ones(len(p_idx), dtype=np.int8))
        inner = pa.table(cols)
        if left and (~matched).any():
            # LEFT/FULL OUTER: interior probe rows with no build key keep
            # their payload and take null build columns
            u_idx = pa.array(np.flatnonzero(is_p)[~matched], pa.int64())
            ucols = {key: typed(key, u_idx, key)}
            for c in build_cols:
                ucols[c] = pa.nulls(len(u_idx), type=types[c])
            for c in probe_cols:
                ucols[c] = typed(c, u_idx, c)
            ucols["__edge"] = pa.array(np.zeros(len(u_idx), dtype=bool))
            ucols["__kindd"] = pa.array(np.ones(len(u_idx), dtype=np.int8))
            inner = pa.concat_tables([inner, pa.table(ucols)])
        if outer and len(b_keys):
            # FULL OUTER: interior build keys no probe row referenced —
            # their probe columns are already null from the tag pass
            b_hit = np.zeros(len(b_keys), dtype=bool)
            if matched.any():
                b_hit[pos[matched]] = True
            ub_idx = pa.array(np.flatnonzero(is_b)[~b_hit], pa.int64())
            if len(ub_idx):
                ucols = {c: typed(c, ub_idx, c) for c in out_names}
                ucols["__edge"] = pa.array(np.zeros(len(ub_idx), dtype=bool))
                ucols["__kindd"] = pa.array(np.zeros(len(ub_idx), dtype=np.int8))
                inner = pa.concat_tables([inner, pa.table(ucols)])
        # BOTH sides defer their edge-key rows in every mode: the repair
        # pass then reads build payloads from the tiny deferred set instead
        # of re-executing the whole build lineage (deferred BUILD rows
        # carry their payloads; deferred probe rows carry nulls from tag)
        defer = flagged
        if not defer.any():
            return inner
        d_idx = pa.array(np.flatnonzero(defer), pa.int64())
        dcols = {key: typed(key, d_idx, key)}
        for c in build_cols:
            dcols[c] = typed(c, d_idx, c)
        for c in probe_cols:
            dcols[c] = typed(c, d_idx, c)
        dcols["__edge"] = pa.array(np.ones(len(d_idx), dtype=bool))
        dcols["__kindd"] = pa.array(kind[np.flatnonzero(defer)].astype(np.int8))
        return pa.concat_tables([inner, pa.table(dcols)])

    flagged = unioned.map_batches(
        resolve, batch_format="pyarrow", batch_size=None
    ).materialize()
    if flagged.schema() is None:
        # both inputs EMPTY: the sort dropped every (empty) block.  Emit a
        # typed empty result so downstream consumers (grouped aggregations,
        # further joins) keep a schema to work with.
        return rd.from_arrow(pa.schema(
            [(c, pa.int64() if c == key else types[c]) for c in out_names]
        ).empty_table())
    interior = flagged.filter(expr="__edge == False").drop_columns(
        ["__edge", "__kindd"]
    )
    deferred_p = flagged.filter(expr="__edge == True").filter(
        expr="__kindd == 1"
    ).drop_columns(["__edge", "__kindd"])
    deferred_b = (
        flagged.filter(expr="__edge == True").filter(expr="__kindd == 0")
        .drop_columns(["__edge", "__kindd"])
    )

    # which keys have deferred PROBE rows?  O(blocks) distinct values — a
    # per-block unique before the driver pull, so a hot probe key never
    # ships its rows
    need: set[int] = set()
    for batch in deferred_p.map_batches(
        lambda t: pa.table({key: pa.array(
            np.unique(t[key].to_numpy(zero_copy_only=False)), pa.int64())}),
        batch_format="pyarrow", batch_size=None,
    ).iter_batches(batch_format="pyarrow"):
        need.update(int(x) for x in batch[key].to_numpy(zero_copy_only=False))
    need_ref = ray.put(frozenset(need))

    def emit_unmatched_build(t: pa.Table) -> pa.Table:
        # deferred build rows whose key has NO probe row anywhere (an edge
        # key defers its complete row set, so `need` is authoritative)
        wanted = ray.get(need_ref)
        mask = np.fromiter(
            (int(x) not in wanted for x in t[key].to_numpy(zero_copy_only=False)),
            dtype=bool, count=t.num_rows,
        )
        kept = t.filter(pa.array(mask)).select(out_names)
        return pa.table({
            c: kept[c] if kept[c].type == (pa.int64() if c == key else types[c])
            else pc.cast(kept[c], pa.int64() if c == key else types[c])
            for c in out_names
        })

    rep_b = (
        deferred_b.map_batches(emit_unmatched_build, batch_format="pyarrow",
                               batch_size=None)
        if outer else None
    )
    if not need:
        return interior.union(rep_b) if outer else interior

    # build-side payloads for the deferred keys only (≤ 2 keys per block):
    # deferred BUILD rows already carry their payloads (an edge key defers
    # its complete row set in every mode), so the lookup comes from the
    # tiny deferred_b — never a second pass over the build lineage.
    b_lookup: dict[int, tuple] = {}
    for batch in deferred_b.iter_batches(batch_format="pyarrow"):
        keys_np = batch[key].to_numpy(zero_copy_only=False)
        payloads = [pc.cast(batch[c], types[c]).to_pylist() for c in build_cols]
        for i, kk in enumerate(keys_np):
            k_int = int(kk)
            if k_int in b_lookup:
                # the interior fail-fast can't see duplicates whose rows all
                # sit at block edges (they defer); catch them here instead
                # of silently keeping the last row
                raise AssertionError(
                    f"equi_join: build side has duplicate key {k_int} — the "
                    "build (left) side must be unique per key "
                    "(dimension-table contract)"
                )
            b_lookup[k_int] = tuple(p[i] for p in payloads)
    # deferred probe rows bind DISTRIBUTED via the broadcast lookup — a hot
    # key spanning many blocks never funnels its rows through the driver
    lut_ref = ray.put(b_lookup)

    def bind(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        keys_np = t[key].to_numpy(zero_copy_only=False)
        if left:
            kept, kept_keys = t, keys_np  # LEFT OUTER keeps every probe row
        else:
            hit = np.fromiter((int(x) in lut for x in keys_np), dtype=bool,
                              count=t.num_rows)
            kept = t.filter(pa.array(hit))
            kept_keys = keys_np[hit]
        nones = (None,) * len(build_cols)
        cols = {key: kept[key] if kept[key].type == pa.int64()
                else pc.cast(kept[key], pa.int64())}
        for ci, c in enumerate(build_cols):
            cols[c] = pa.array(
                [lut.get(int(x), nones)[ci] for x in kept_keys], type=types[c]
            )
        for c in probe_cols:
            cols[c] = kept[c] if kept[c].type == types[c] else pc.cast(kept[c], types[c])
        return pa.table(cols)

    rep = deferred_p.map_batches(bind, batch_format="pyarrow", batch_size=None)
    out = interior.union(rep)
    return out.union(rep_b) if outer else out


def pc_cast_i64(arr):
    import pyarrow.compute as pc

    return pc.cast(arr, pa.int64())
