"""Windowed / ordered-log operators over the `events` stream table.

Ray Data has no event-time windows; the stream-shaped semantics are built
on two exchange shapes, neither assuming a user fits one group:

- keyed algebraic aggregation (tumbling/sliding) via stages/groupagg.py —
  per-block partial, parallel sort, per-block combine, edge repair;
- ordered scans (everything else here) via ONE shared scaffold,
  `_sorted_user_op`: a global range sort on (user_id, ...), one VECTORIZED
  kernel pass per block over all interior users, and per-user repair only
  for the ≤2 users that can straddle a block edge — the transcript
  `(conv_id, turn_idx)` stable-ordering pattern generalized to unbounded
  keys.  Each operator is its ~15-line kernel; the edge-flag contract and
  repair live in exactly one place.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from .. import config as _config


def tumbling_window(events: rd.Dataset, width_sec: int = 3600) -> rd.Dataset:
    """Per (user_id, window): event count + value sum.

    Window id = floor(epoch_seconds / width) — a stateless map, so this is
    partial-aggregated per batch before the (user, window)-keyed merge;
    oracle: GROUP BY user_id, CAST(floor(epoch(ts)/width) AS BIGINT).
    """

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        # integer microsecond epochs (oracle: epoch_us(ts) // width_us) — no
        # float division near window boundaries.  value scaled to int64
        # micro-units PER ROW so sums are exact integers regardless of
        # summation order (oracle: sum(CAST(round(value*1e6) AS BIGINT))).
        epoch_us = batch["ts"].astype("int64")
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "window_id": (epoch_us // (width_sec * 1_000_000)).astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    from .groupagg import grouped_agg

    keyed = events.select_columns(["user_id", "ts", "value"]).map_batches(
        add_window, batch_format="pandas"
    )
    return grouped_agg(
        keyed,
        ["user_id", "window_id"],
        [("value_e6", "count", "n_events"), ("value_e6", "sum", "value_sum_e6")],
    )


def sliding_window(events: rd.Dataset, width_sec: int = 3600, slide_sec: int = 900) -> rd.Dataset:
    """Overlapping windows: window w covers [w·slide, w·slide + width); an
    event belongs to width/slide windows.  The expansion is a vectorized
    per-batch flat map (numpy repeat) followed by the same partial-agg +
    keyed merge as the tumbling window; oracle via generate_series unnest."""
    width_us = width_sec * 1_000_000
    slide_us = slide_sec * 1_000_000

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["ts"].astype("int64").to_numpy()
        v = np.round(batch["value"].to_numpy() * 1e6).astype("int64")
        u = batch["user_id"].astype("int64").to_numpy()
        w_min = (t - width_us) // slide_us + 1
        w_max = t // slide_us
        counts = (w_max - w_min + 1).astype("int64")
        idx = np.repeat(np.arange(len(t)), counts)
        # window ids: for each event, w_min[i] .. w_max[i]
        offs = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.array([], dtype="int64")
        return pd.DataFrame(
            {
                "user_id": u[idx],
                "window_id": w_min[idx] + offs,
                "value_e6": v[idx],
            }
        )

    from .groupagg import grouped_agg

    keyed = events.select_columns(["user_id", "ts", "value"]).map_batches(
        expand, batch_format="pandas"
    )
    return grouped_agg(
        keyed,
        ["user_id", "window_id"],
        [("value_e6", "count", "n_events"), ("value_e6", "sum", "value_sum_e6")],
    )


# ---------------------------------------------------------------------------
# The shared ordered-scan scaffold
# ---------------------------------------------------------------------------

_PAD = {"int64": 0, "float64": 0.0, "bool": False, "object": ""}


def _pad_of(typ: "pa.DataType"):
    """The _PAD value for an Arrow column type (deferred raw columns keep
    their exact Arrow dtype; interior rows pad them with a typed zero)."""
    if pa.types.is_integer(typ):
        return 0
    if pa.types.is_floating(typ):
        return 0.0
    if pa.types.is_boolean(typ):
        return False
    return ""

# Edge rows past this count keep the DISTRIBUTED groupby repair; below it
# the gathered driver-side repair saves the exchange (see _sorted_user_op).
EDGE_REPAIR_DRIVER_MAX = _config.gate(500_000)


def _run_firsts(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length prelude over a sorted key array: (new_run bool mask,
    index of each row's run start)."""
    n = len(u)
    new = np.ones(n, dtype=bool)
    if n:
        new[1:] = u[1:] != u[:-1]
    first = np.where(new, np.arange(n), 0)
    np.maximum.accumulate(first, out=first)
    return new, first


def _prep_events(events: rd.Dataset, cols: tuple[str, ...]) -> tuple[rd.Dataset, list[str]]:
    """Project + scale the events table to int64 working columns:
    user_id plus any of event_id / ts_us / value_e6."""
    src_of = {"event_id": "event_id", "ts_us": "ts", "value_e6": "value",
              "value_e3": "value"}
    src = ["user_id"] + [src_of[c] for c in cols]

    # Arrow, not pandas: the output feeds straight into the scaffold's
    # global sort, and an Arrow-block input keeps the whole exchange in
    # Arrow mode (zero-copy int64 columns; the pandas round-trip each
    # windowed operator used to pay happened BEFORE and THROUGH the sort).
    # pc.round is half-to-even like np.round, so value_e6 is bit-identical.
    def prep(t: pa.Table) -> pa.Table:
        out = {"user_id": pc.cast(t["user_id"], pa.int64())}
        if "event_id" in cols:
            out["event_id"] = pc.cast(t["event_id"], pa.int64())
        if "ts_us" in cols:
            out["ts_us"] = pc.cast(t["ts"], pa.int64())
        if "value_e6" in cols:
            out["value_e6"] = pc.cast(
                pc.round(pc.multiply(pc.cast(t["value"], pa.float64()), 1e6)),
                pa.int64(),
            )
        if "value_e3" in cols:
            # milli scale: squares and per-key sums of squares stay exactly
            # representable in BOTH int64 and float64 (z-score kernel)
            out["value_e3"] = pc.cast(
                pc.round(pc.multiply(pc.cast(t["value"], pa.float64()), 1e3)),
                pa.int64(),
            )
        return pa.table(out)

    ds = events.select_columns(src).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return ds, ["user_id"] + list(cols)


def _sorted_user_op(
    prepped: rd.Dataset,
    raw_cols: list[str],
    sort_cols: list[str],
    descending: list[bool],
    kernel,
    out_dtypes: dict[str, str],
    key: str = "user_id",
) -> rd.Dataset:
    """The ordered-scan exchange every per-key windowed operator here rides:

    - ONE global sort on `sort_cols` (key first);
    - per block, `kernel` (a vectorized pandas function over a frame sorted
      by `sort_cols`, any output row count) resolves every INTERIOR key —
      after a range sort a key's rows are contiguous, so only the block's
      first and last key can straddle a block edge;
    - edge-key rows defer raw; a per-key repair re-sorts each deferred
      key's complete row set locally and applies the SAME kernel.

    The kernel must be key-local (its output for a key depends only on that
    key's rows) and order-consistent with `sort_cols`; row counts may
    shrink (argmax), grow, or aggregate (quantiles)."""
    out_cols = list(out_dtypes)
    raw_only = [c for c in raw_cols if c not in out_cols]
    from .. import config as _config

    # coalesce before the range sort: shuffle-object count is
    # #map x #reduce blocks (see config.sort_blocks)
    s = prepped.repartition(_config.sort_blocks()).sort(sort_cols, descending=descending)

    pa_of = {"int64": pa.int64(), "float64": pa.float64(),
             "bool": pa.bool_(), "object": pa.string()}

    def split(t: pa.Table) -> pa.Table:
        # Arrow in, Arrow out (no from_pandas: its b'pandas' metadata dict
        # breaks hash(pa.Schema) and defeats Ray's block-schema dedup in
        # the edge groupby's reduce).  The kernel still sees a pandas frame
        # — built from numpy VIEWS of the Arrow columns (zero-copy for the
        # int64 working columns after the sort's single-chunk blocks) —
        # and its output columns convert back via pa.array on the numpy
        # buffers, dropping the two full-frame conversions every windowed
        # operator used to pay per batch (round-4 VERDICT item 3).
        order = out_cols + raw_only + ["is_edge"]
        n = t.num_rows
        if n == 0:
            cols = {c: pa.array([], pa_of[dt]) for c, dt in out_dtypes.items()}
            for c in raw_only:
                cols[c] = pa.array([], t.schema.field(c).type)
            cols["is_edge"] = pa.array([], pa.bool_())
            return pa.table({c: cols[c] for c in order})
        u = t[key]
        edge_mask = pc.or_(pc.equal(u, u[0]), pc.equal(u, u[n - 1]))
        interior_t = t.filter(pc.invert(edge_mask))
        edge_t = t.filter(edge_mask)
        kdf = pd.DataFrame(
            {c: interior_t[c].to_numpy(zero_copy_only=False)
             for c in interior_t.column_names},
            copy=False,
        )
        out = kernel(kdf)
        ni = len(out)
        icols = {
            c: pa.array(out[c], type=pa_of[dt], from_pandas=True)
            for c, dt in out_dtypes.items()
        }
        for c in raw_only:
            typ = t.schema.field(c).type
            icols[c] = pa.nulls(ni, typ).fill_null(_pad_of(typ))
        icols["is_edge"] = pa.array(np.zeros(ni, dtype=bool))
        ecols = {}
        ne = edge_t.num_rows
        for c, dt in out_dtypes.items():
            if c in edge_t.column_names:
                ecols[c] = pc.cast(edge_t[c], pa_of[dt])
            else:
                ecols[c] = pa.nulls(ne, pa_of[dt]).fill_null(_PAD[dt])
        for c in raw_only:
            ecols[c] = edge_t[c]
        ecols["is_edge"] = pa.array(np.ones(ne, dtype=bool))
        return pa.concat_tables([
            pa.table({c: icols[c] for c in order}),
            pa.table({c: ecols[c] for c in order}),
        ])

    flagged = s.map_batches(split, batch_format="pyarrow", batch_size=None).materialize()
    interior = flagged.filter(expr="is_edge == False").select_columns(out_cols)
    local_sort = [c for c in sort_cols if c != key]
    local_asc = [not d for c, d in zip(sort_cols, descending) if c != key]

    def edge_fix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(local_sort, ascending=local_asc, kind="mergesort")
        return kernel(g)[out_cols]

    edge_src = flagged.filter(expr="is_edge == True").select_columns(raw_cols).materialize()
    if edge_src.count() <= EDGE_REPAIR_DRIVER_MAX:
        # ≤2 keys straddle each block edge, so edge volume is normally
        # O(blocks × rows-per-straddling-key) — gather once and repair
        # driver-side (the distinct._resolve_edge_repair pattern), keeping
        # a whole groupby exchange out of EVERY windowed operator's plan.
        # A hot key spanning many blocks can inflate this (its every
        # straddled block defers its rows), hence the size gate: past it
        # the repair stays a distributed groupby — row-identical (tested).
        edge_df = edge_src.to_pandas()
        outs = [
            edge_fix(g) for _, g in edge_df.groupby(key, sort=False)
        ] if len(edge_df) else []
        if not outs:
            return interior
        rep = pd.concat(outs, ignore_index=True)
        rep_tab = pa.Table.from_pandas(rep, preserve_index=False).replace_schema_metadata(None)
        return interior.union(rd.from_arrow(rep_tab))
    def edge_fix_arrow(g: pd.DataFrame) -> pa.Table:
        # Arrow out, typed per the declared contract — the union with the
        # Arrow interior must be block-type-uniform or any downstream
        # exchange's block builder asserts (mixed pandas/Arrow blocks)
        out = edge_fix(g)
        return pa.table({
            c: pa.array(out[c], type=pa_of[dt], from_pandas=True)
            for c, dt in out_dtypes.items()
        })

    edges = (
        edge_src
        .groupby(key)
        .map_groups(edge_fix_arrow, batch_format="pandas")
    )
    return interior.union(edges)


# ---------------------------------------------------------------------------
# Operators = kernels on the scaffold
# ---------------------------------------------------------------------------


def top_events_per_user(events: rd.Dataset, k: int = 3) -> rd.Dataset:
    """Grouped top-k (by scaled value desc, event_id asc), scale-safe for
    corpus-many groups.  For the OTHER top-k regime — few groups, each
    corpus-scale — see skew.salted_grouped_topk (used by the ANN merge)."""
    prepped, raw = _prep_events(events, ("event_id", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        _, first = _run_firsts(df["user_id"].to_numpy())
        rank = np.arange(len(df)) - first + 1
        out = df[rank <= k].copy()
        out["rank"] = pd.array(rank[rank <= k], dtype="int64")
        return out

    return _sorted_user_op(
        prepped, raw, ["user_id", "value_e6", "event_id"], [False, True, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "value_e6": "int64", "rank": "int64"},
    )


def zscore_events(events: rd.Dataset) -> rd.Dataset:
    """Per-user z-score normalization of the event value — the grouped
    feature-scaling primitive of a training-data pipeline.

    EXACT against the SQL oracle without tolerance: values are milli-scaled
    int64 (v ≤ ~5.6e5 → v² ≤ 3.2e11 and per-user Σv² ≪ 2⁵³), so n/Σv/Σv²
    are integer-exact in both engines, and mean/variance/σ/z are computed
    with the IDENTICAL float64 op order as the oracle expression
    ((Σv² − Σv·Σv/n)/(n−1), sample variance).  Degenerate users (n < 2 or
    zero variance) emit z = 0."""
    prepped, raw = _prep_events(events, ("event_id", "value_e3"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(z=pd.array([], dtype="float64"))
        v = df["value_e3"].to_numpy()
        g = df.groupby("user_id", sort=False)["value_e3"]
        n = g.transform("size").to_numpy().astype(np.int64)
        s1 = g.transform("sum").to_numpy().astype(np.int64)
        s2 = (
            df.assign(v2=v * v).groupby("user_id", sort=False)["v2"]
            .transform("sum").to_numpy().astype(np.int64)
        )
        mean = s1.astype(np.float64) / n
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (s2.astype(np.float64) - s1.astype(np.float64) * s1.astype(np.float64) / n) / (n - 1)
            z = np.round((v.astype(np.float64) - mean) / np.sqrt(var), 6)
        z = np.where((n < 2) | ~(var > 0), 0.0, z)
        out = df.copy()
        out["z"] = z
        return out

    return _sorted_user_op(
        prepped, raw, ["user_id", "event_id"], [False, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "value_e3": "int64", "z": "float64"},
    )


def percentile_events(events: rd.Dataset) -> rd.Dataset:
    """PERCENT_RANK and CUME_DIST per user over value ASC — the remaining
    distribution window functions.  Exact vs the oracle: both are ratios
    of run-position integers (rank = first index of the value-tie run,
    cume numerator = last index), divided in float64 with the oracle's
    exact op order and rounded to 6; single-row users emit pct_rank 0."""
    prepped, raw = _prep_events(events, ("event_id", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        n_rows = len(df)
        if n_rows == 0:
            return df.assign(pct_rank=pd.array([], dtype="float64"),
                             cume=pd.array([], dtype="float64"))
        u = df["user_id"].to_numpy()
        v = df["value_e6"].to_numpy()
        idx = np.arange(n_rows)
        new_u, first_u = _run_firsts(u)
        new_uv = new_u.copy()
        new_uv[1:] |= v[1:] != v[:-1]
        first_uv = np.where(new_uv, idx, 0)
        np.maximum.accumulate(first_uv, out=first_uv)
        # last index of each run = reversed run-firsts
        rev_new_u, rev_first_u = _run_firsts(u[::-1])
        last_u = n_rows - 1 - rev_first_u[::-1]
        rev_uv = rev_new_u
        rev_uv[1:] |= v[::-1][1:] != v[::-1][:-1]
        rev_first = np.where(rev_uv, idx, 0)
        np.maximum.accumulate(rev_first, out=rev_first)
        last_uv = n_rows - 1 - rev_first[::-1]
        rnk = first_uv - first_u + 1
        cume_num = last_uv - first_u + 1
        n = last_u - first_u + 1
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = np.round((rnk - 1).astype(np.float64) / (n - 1), 6)
        pct = np.where(n == 1, 0.0, pct)
        cume = np.round(cume_num.astype(np.float64) / n, 6)
        out = df.copy()
        out["pct_rank"] = pct
        out["cume"] = cume
        return out

    return _sorted_user_op(
        prepped, raw, ["user_id", "value_e6", "event_id"], [False, False, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "value_e6": "int64",
         "pct_rank": "float64", "cume": "float64"},
    )


def ranked_events(events: rd.Dataset) -> rd.Dataset:
    """ROW_NUMBER / RANK / DENSE_RANK per user over (value desc, event_id)
    — the ranking window functions Ray Data lacks.  rank = first index of
    the (user, value) run within the user; dense rank = distinct-value
    count so far."""
    prepped, raw = _prep_events(events, ("event_id", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return df.assign(
                row_num=pd.array([], dtype="int64"),
                rnk=pd.array([], dtype="int64"),
                dense_rnk=pd.array([], dtype="int64"),
            )
        u = df["user_id"].to_numpy()
        v = df["value_e6"].to_numpy()
        new_user, user_first = _run_firsts(u)
        new_val = new_user.copy()
        new_val[1:] |= v[1:] != v[:-1]
        val_first = np.where(new_val, np.arange(n), 0)
        np.maximum.accumulate(val_first, out=val_first)
        dense_global = np.cumsum(new_val)
        return df.assign(
            row_num=(np.arange(n) - user_first + 1).astype("int64"),
            rnk=(val_first - user_first + 1).astype("int64"),
            dense_rnk=(dense_global - dense_global[user_first] + 1).astype("int64"),
        )

    return _sorted_user_op(
        prepped, raw, ["user_id", "value_e6", "event_id"], [False, True, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "value_e6": "int64",
         "row_num": "int64", "rnk": "int64", "dense_rnk": "int64"},
    )


def ntile_events(events: rd.Dataset, k: int = 4) -> rd.Dataset:
    """NTILE(k) per user over (value desc, event_id): split each user's
    events into k near-equal buckets, the first n%k buckets one row larger
    — SQL NTILE semantics exactly (integer arithmetic throughout)."""
    prepped, raw = _prep_events(events, ("event_id", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        n_rows = len(df)
        if n_rows == 0:
            return df.assign(bucket=pd.array([], dtype="int64"))
        new_user, user_first = _run_firsts(df["user_id"].to_numpy())
        r = np.arange(n_rows) - user_first + 1  # 1-based rank within user
        firsts = np.flatnonzero(new_user)
        counts = np.diff(np.append(firsts, n_rows))
        n = np.repeat(counts, counts)  # each row's user run length
        size = n // k
        rem = n % k
        big_span = rem * (size + 1)
        bucket = np.where(
            r <= big_span,
            (r + size) // np.maximum(size + 1, 1),
            rem + (r - big_span + np.maximum(size, 1) - 1) // np.maximum(size, 1),
        )
        return df.assign(bucket=bucket.astype("int64"))

    return _sorted_user_op(
        prepped, raw, ["user_id", "value_e6", "event_id"], [False, True, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "value_e6": "int64",
         "bucket": "int64"},
    )


def latest_event_per_user(events: rd.Dataset) -> rd.Dataset:
    """Grouped argmax: each user's LATEST event row (max ts, ties to the
    larger event_id) — the compaction / CDC-upsert shape.  Argmax is
    associative, so each map task pre-reduces its block to one row per
    user BEFORE the exchange — the sort moves |users| × blocks rows,
    never the corpus."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "ts_us": batch["ts"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )
        # per-block partial argmax: last row of each user run after an
        # ascending (user, ts, id) sort — one survivor per user per block
        out = out.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = out["user_id"].to_numpy()
        last = np.ones(len(out), dtype=bool)
        last[:-1] = u[1:] != u[:-1]
        return out[last]

    prepped = events.select_columns(["user_id", "event_id", "ts", "value"]).map_batches(
        prep, batch_format="pandas", batch_size=None
    )
    raw = ["user_id", "event_id", "ts_us", "value_e6"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        new_user, _ = _run_firsts(df["user_id"].to_numpy())
        return df[new_user]  # first row per user in (ts desc, id desc) order

    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us", "event_id"], [False, True, True],
        kernel, {c: "int64" for c in raw},
    )


def asof_prev(events: rd.Dataset) -> rd.Dataset:
    """As-of self-join (LAG): each event gets the value of the user's
    immediately preceding event (0 when none)."""
    prepped, raw = _prep_events(events, ("event_id", "ts_us", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value_e6"].to_numpy()
        u = df["user_id"].to_numpy()
        if len(v) == 0:
            return df.assign(prev_value_e6=pd.array([], dtype="int64"))
        prev = np.concatenate([[0], v[:-1]])
        prev[np.concatenate([[True], u[1:] != u[:-1]])] = 0
        return df.assign(prev_value_e6=prev.astype("int64"))

    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us", "event_id"], [False, False, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "ts_us": "int64",
         "value_e6": "int64", "prev_value_e6": "int64"},
    )


def asof_next(events: rd.Dataset) -> rd.Dataset:
    """LEAD: each event gets the value of the user's immediately FOLLOWING
    event (0 when none) — asof_prev's mirror."""
    prepped, raw = _prep_events(events, ("event_id", "ts_us", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value_e6"].to_numpy()
        u = df["user_id"].to_numpy()
        if len(v) == 0:
            return df.assign(next_value_e6=pd.array([], dtype="int64"))
        nxt = np.concatenate([v[1:], [0]])
        # a user's last row gets 0, not the next user's first value
        nxt[np.concatenate([u[1:] != u[:-1], [True]])] = 0
        return df.assign(next_value_e6=nxt.astype("int64"))

    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us", "event_id"], [False, False, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "ts_us": "int64",
         "value_e6": "int64", "next_value_e6": "int64"},
    )


def _quantiles_sorted(df: pd.DataFrame) -> pd.DataFrame:
    """Discrete median/p90 per user over a frame sorted by (user_id,
    value_e6): run-length firsts + counts, element at ceil(n·q)−1 —
    the exact index DuckDB's quantile_disc picks (verified n ≤ 1000)."""
    u = df["user_id"].to_numpy()
    v = df["value_e6"].to_numpy()
    n = len(df)
    new, _ = _run_firsts(u)
    firsts = np.flatnonzero(new)
    counts = np.diff(np.append(firsts, n))
    med = v[firsts + np.ceil(counts * 0.5).astype(np.int64) - 1]
    p90 = v[firsts + np.ceil(counts * 0.9).astype(np.int64) - 1]
    return pd.DataFrame(
        {
            "user_id": u[firsts],
            "n_events": counts.astype("int64"),
            "median_value_e6": med,
            "p90_value_e6": p90,
        }
    )


def grouped_quantiles(events: rd.Dataset) -> rd.Dataset:
    """Exact discrete per-user quantiles (median + p90 of value) — the
    order-statistic aggregate no algebraic combiner can express."""
    prepped, raw = _prep_events(events, ("value_e6",))
    return _sorted_user_op(
        prepped, raw, ["user_id", "value_e6"], [False, False],
        _quantiles_sorted,
        {"user_id": "int64", "n_events": "int64",
         "median_value_e6": "int64", "p90_value_e6": "int64"},
    )


def _quantiles_cont_sorted(df: pd.DataFrame) -> pd.DataFrame:
    """Interpolated (continuous) median/p90 per user over a frame sorted by
    (user_id, value_e6).  DuckDB's quantile_cont computes
    lower·(1−f) + upper·f at position q·(n−1) — replicated with the SAME
    float64 op order, so equality is bit-exact (verified over the sf0.01
    events table)."""
    u = df["user_id"].to_numpy()
    v = df["value_e6"].to_numpy().astype(np.float64)
    n = len(df)
    new, _ = _run_firsts(u)
    firsts = np.flatnonzero(new)
    counts = np.diff(np.append(firsts, n))
    out = {"user_id": u[firsts], "n_events": counts.astype("int64")}
    for q, name in ((0.5, "median_cont"), (0.9, "p90_cont")):
        pos = q * (counts - 1)
        lo = np.floor(pos)
        f = pos - lo
        lo_i = firsts + lo.astype(np.int64)
        hi_i = firsts + np.minimum(lo.astype(np.int64) + 1, counts - 1)
        out[name] = v[lo_i] * (1 - f) + v[hi_i] * f
    return pd.DataFrame(out)


def grouped_quantiles_cont(events: rd.Dataset) -> rd.Dataset:
    """Exact INTERPOLATED per-user quantiles (continuous median + p90) —
    same exchange as grouped_quantiles, different selection kernel."""
    prepped, raw = _prep_events(events, ("value_e6",))
    return _sorted_user_op(
        prepped, raw, ["user_id", "value_e6"], [False, False],
        _quantiles_cont_sorted,
        {"user_id": "int64", "n_events": "int64",
         "median_cont": "float64", "p90_cont": "float64"},
    )


def _mad_sorted(df: pd.DataFrame) -> pd.DataFrame:
    """Median + median-absolute-deviation per user over a frame sorted by
    (user_id, value_e3) — the robust-scale companion to zscore_events
    (outlier-resistant feature scaling).

    All-integer exact: the median is reported as the SUM of the two middle
    order statistics (indices (n−1)//2 and n//2 of the ascending run, equal
    for odd n), i.e. 2·median, and the MAD as the same two-middle sum over
    the deviations |2·v − med_x2| (deviations are doubled once so they stay
    integers) — 4·MAD.  No float ever enters, so the DuckDB oracle
    (list_sort + 1-based picks) matches bit-for-bit.  The second selection
    reuses the same run boundaries: one stable lexsort by (run, deviation)
    keeps runs contiguous with unchanged sizes."""
    u = df["user_id"].to_numpy()
    v = df["value_e3"].to_numpy()
    n = len(df)
    new, first = _run_firsts(u)
    firsts = np.flatnonzero(new)
    counts = np.diff(np.append(firsts, n))
    lo = firsts + (counts - 1) // 2
    hi = firsts + counts // 2
    med_x2 = v[lo] + v[hi]
    run_of_row = np.cumsum(new) - 1
    d = np.abs(2 * v - med_x2[run_of_row])
    order = np.lexsort((d, first))
    ds = d[order]
    mad_x4 = ds[lo] + ds[hi]
    return pd.DataFrame(
        {
            "user_id": u[firsts],
            "n_events": counts.astype("int64"),
            "med_x2_e3": med_x2.astype("int64"),
            "mad_x4_e3": mad_x4.astype("int64"),
        }
    )


def mad_events(events: rd.Dataset) -> rd.Dataset:
    """Per-user median absolute deviation of the event value — a robust
    grouped dispersion statistic (the outlier-resistant alternative to
    zscore_events' mean/stddev).  Rides the same single ordered-scan
    exchange as grouped_quantiles; both order-statistic selections happen
    inside one vectorized kernel pass."""
    prepped, raw = _prep_events(events, ("value_e3",))
    return _sorted_user_op(
        prepped, raw, ["user_id", "value_e3"], [False, False],
        _mad_sorted,
        {"user_id": "int64", "n_events": "int64",
         "med_x2_e3": "int64", "mad_x4_e3": "int64"},
    )


def _sessionize_sorted(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Vectorized sessionization of a frame already sorted by
    (user_id, ts_us, event_id); handles any number of users at once."""
    u = df["user_id"].to_numpy()
    t = df["ts_us"].to_numpy()
    n = len(df)
    new_user, first_pos = _run_firsts(u)
    new_sess = new_user.copy()
    if n:
        new_sess[1:] |= (t[1:] - t[:-1]) > gap_us
    sid_global = np.cumsum(new_sess)
    # per-user numbering: subtract the user's first global session id
    session_idx = sid_global - sid_global[first_pos] + 1 if n else sid_global
    out = (
        pd.DataFrame(
            {
                "user_id": u,
                "session_idx": session_idx.astype("int64") if n else pd.array([], dtype="int64"),
                "ts_us": t,
                "value_e6": df["value_e6"].to_numpy(),
            }
        )
        .groupby(["user_id", "session_idx"])
        .agg(
            n_events=("ts_us", "size"),
            start_us=("ts_us", "min"),
            end_us=("ts_us", "max"),
            value_sum_e6=("value_e6", "sum"),
        )
        .reset_index()
    )
    for c in ("user_id", "session_idx", "n_events", "start_us", "end_us", "value_sum_e6"):
        out[c] = out[c].astype("int64")
    return out


def sessionize(events: rd.Dataset, gap_sec: int = 1800) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds `gap_sec`."""
    gap_us = gap_sec * 1_000_000
    prepped, raw = _prep_events(events, ("event_id", "ts_us", "value_e6"))
    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us", "event_id"], [False, False, False],
        lambda df: _sessionize_sorted(df, gap_us),
        {"user_id": "int64", "session_idx": "int64", "n_events": "int64",
         "start_us": "int64", "end_us": "int64", "value_sum_e6": "int64"},
    )


def running_aggregates(events: rd.Dataset, w: int = 3) -> rd.Dataset:
    """Per-user running window frames: cumulative sum and a w-row rolling
    sum of value, both in integer micro-units — the ROWS-frame window
    aggregate (SUM OVER ... ROWS BETWEEN) Ray Data lacks."""
    prepped, raw = _prep_events(events, ("event_id", "ts_us", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        v = df["value_e6"].to_numpy()
        if n == 0:
            return df.assign(cum_value_e6=pd.array([], dtype="int64"),
                             roll_value_e6=pd.array([], dtype="int64"))
        _, run_first = _run_firsts(df["user_id"].to_numpy())
        cs = np.cumsum(v)
        base = cs[run_first] - v[run_first]
        cum = cs - base
        # rolling w-row sum: cs[i] - cs[i-w] where the frame fits, else cum
        rank = np.arange(n) - run_first + 1
        prev = np.arange(n) - w
        fits = rank > w
        roll = np.where(fits, cs - cs[np.maximum(prev, 0)], cum)
        return df.assign(cum_value_e6=cum.astype("int64"),
                         roll_value_e6=roll.astype("int64"))

    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us", "event_id"], [False, False, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "ts_us": "int64",
         "value_e6": "int64", "cum_value_e6": "int64", "roll_value_e6": "int64"},
    )


def time_window_sum(events: rd.Dataset, window_sec: int = 3600) -> rd.Dataset:
    """Per-user time-based rolling sum — SUM(value) OVER (PARTITION BY user
    ORDER BY ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW), the
    RANGE-frame companion to running_aggregates' ROWS frame.

    All-integer exact (µs timestamps, e-6 values), and tie-correct: a RANGE
    frame includes every PEER of the current timestamp, even rows ordered
    after it, which the kernel honors via searchsorted(side='right').  The
    scan is one cumsum plus two binary searches per run — the Python loop
    is per RUN (keys per block), never per row."""
    w_us = window_sec * 1_000_000
    prepped, raw = _prep_events(events, ("event_id", "ts_us", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return df.assign(win_sum_e6=pd.array([], dtype="int64"))
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        v = df["value_e6"].to_numpy()
        new, _ = _run_firsts(u)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        cs = np.cumsum(v)
        pre = cs - v  # exclusive prefix
        out = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            t_run = ts[s:e]
            lo = s + np.searchsorted(t_run, t_run - w_us, side="left")
            hi = s + np.searchsorted(t_run, t_run, side="right") - 1
            out[s:e] = cs[hi] - pre[lo]
        return df.assign(win_sum_e6=pd.array(out, dtype="int64"))

    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us", "event_id"], [False, False, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "ts_us": "int64",
         "value_e6": "int64", "win_sum_e6": "int64"},
    )


def activity_coverage(events: rd.Dataset, halo_sec: int = 300) -> rd.Dataset:
    """Per-user interval-UNION length: each event spans [ts, ts + halo];
    overlapping spans merge (sweep line), and the user's coverage is the
    summed length of the merged islands — "how much wall-clock was this
    user active", the interval-coverage primitive session gaps can't give.

    Vectorized sweep line on the ordered scan: running max of interval
    ends per run, an island starts where the next start exceeds every
    previous end, reduceat over island boundaries.  All int64 µs — exact,
    and tie-order invariant (equal starts can never open an island: the
    peer's end ≥ its start)."""
    h_us = halo_sec * 1_000_000
    prepped, raw = _prep_events(events, ("ts_us", "event_id"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.array([], dtype="int64"),
                "n_islands": pd.array([], dtype="int64"),
                "coverage_us": pd.array([], dtype="int64"),
            })
        u = df["user_id"].to_numpy()
        s = df["ts_us"].to_numpy()
        e = s + h_us
        n = len(df)
        new_run, first = _run_firsts(u)
        # running max of e within each run (reset at run starts): standard
        # segmented cummax via offsetting each run into a disjoint band is
        # overflow-prone at µs scale, so do it per run — runs per block,
        # never rows
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n)
        ce = np.empty(n, dtype=np.int64)
        for a, b in zip(starts, ends):
            ce[a:b] = np.maximum.accumulate(e[a:b])
        new_island = new_run.copy()
        new_island[1:] |= (~new_run[1:]) & (s[1:] > ce[:-1])
        isl = np.flatnonzero(new_island)
        isl_end = np.append(isl[1:], n)
        cov = ce[isl_end - 1] - s[isl]
        run_of_island = np.searchsorted(starts, isl, side="right") - 1
        n_isl = np.bincount(run_of_island, minlength=len(starts)).astype(np.int64)
        cov_sum = np.zeros(len(starts), dtype=np.int64)
        np.add.at(cov_sum, run_of_island, cov)
        return pd.DataFrame({
            "user_id": pd.array(u[starts], dtype="int64"),
            "n_islands": pd.array(n_isl, dtype="int64"),
            "coverage_us": pd.array(cov_sum, dtype="int64"),
        })

    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us", "event_id"], [False, False, False],
        kernel,
        {"user_id": "int64", "n_islands": "int64", "coverage_us": "int64"},
    )


def gap_stats(events: rd.Dataset) -> rd.Dataset:
    """Per-user inter-arrival gap statistics (count / min / max / sum of
    consecutive timestamp deltas in µs) — the cadence profile a streaming
    sessionization or bot-detection pass starts from.

    All-integer exact: gaps are int64 µs deltas over the per-user
    timestamp-sorted run, so every aggregate is exact under any block
    split (ties in ts contribute 0-gaps identically in any tie order).
    Users with a single event have no gap and emit no row."""
    prepped, raw = _prep_events(events, ("ts_us",))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.array([], dtype="int64"),
                "n_gaps": pd.array([], dtype="int64"),
                "gap_min_us": pd.array([], dtype="int64"),
                "gap_max_us": pd.array([], dtype="int64"),
                "gap_sum_us": pd.array([], dtype="int64"),
            })
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        n = len(df)
        gap = np.full(n, np.nan)
        if n > 1:
            gap[1:] = np.where(u[1:] == u[:-1], (ts[1:] - ts[:-1]).astype(np.float64), np.nan)
        agg = (
            pd.DataFrame({"user_id": u, "gap": gap})
            .dropna(subset=["gap"])
            .groupby("user_id", sort=False)["gap"]
            .agg(["count", "min", "max", "sum"])
            .reset_index()
        )
        return pd.DataFrame({
            "user_id": agg["user_id"].astype("int64"),
            "n_gaps": agg["count"].astype("int64"),
            "gap_min_us": agg["min"].astype("int64"),
            "gap_max_us": agg["max"].astype("int64"),
            "gap_sum_us": agg["sum"].astype("int64"),
        })

    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us"], [False, False],
        kernel,
        {"user_id": "int64", "n_gaps": "int64", "gap_min_us": "int64",
         "gap_max_us": "int64", "gap_sum_us": "int64"},
    )


def trend_corr(events: rd.Dataset) -> rd.Dataset:
    """Per-user Pearson correlation between event ORDER (row position by
    (ts, event_id)) and event value — "is this user's value drifting over
    time", the grouped two-variable statistic (CORR ... OVER) Ray Data has
    no aggregate for.

    EXACT against the SQL oracle without tolerance: positions r = 1..n and
    milli-scaled values v are int64, all six sums (n, Σr, Σr², Σv, Σv²,
    Σrv) accumulate in int64 (exact under any block split), and the final
    correlation is ONE fixed float64 expression —
    (n·Σrv − Σr·Σv) / (√(n·Σr² − Σr·Σr) · √(n·Σv² − Σv·Σv)) — evaluated in
    the identical op order on both sides.  Degenerate users (n < 2 or zero
    value variance) emit 0."""
    prepped, raw = _prep_events(events, ("ts_us", "event_id", "value_e3"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.array([], dtype="int64"),
                "n": pd.array([], dtype="int64"),
                "trend_corr": pd.array([], dtype="float64"),
            })
        u = df["user_id"].to_numpy()
        v = df["value_e3"].to_numpy()
        m = len(df)
        new, first = _run_firsts(u)
        starts = np.flatnonzero(new)
        r = np.arange(m, dtype=np.int64) - first + 1
        n = np.diff(np.append(starts, m)).astype(np.int64)
        sr = np.add.reduceat(r, starts)
        srr = np.add.reduceat(r * r, starts)
        sv = np.add.reduceat(v, starts)
        svv = np.add.reduceat(v * v, starts)
        srv = np.add.reduceat(r * v, starts)
        nf = n.astype(np.float64)
        srf, srrf = sr.astype(np.float64), srr.astype(np.float64)
        svf, svvf = sv.astype(np.float64), svv.astype(np.float64)
        srvf = srv.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            den = np.sqrt(nf * srrf - srf * srf) * np.sqrt(nf * svvf - svf * svf)
            corr = np.round((nf * srvf - srf * svf) / den, 6)
        corr = np.where((n < 2) | ~(den > 0), 0.0, corr)
        return pd.DataFrame({
            "user_id": pd.array(u[starts], dtype="int64"),
            "n": pd.array(n, dtype="int64"),
            "trend_corr": pd.array(corr, dtype="float64"),
        })

    return _sorted_user_op(
        prepped, raw, ["user_id", "ts_us", "event_id"], [False, False, False],
        kernel,
        {"user_id": "int64", "n": "int64", "trend_corr": "float64"},
    )


def windowed_dedup(events: rd.Dataset, window_sec: int = 900) -> rd.Dataset:
    """Streaming debounce: drop an event when the PREVIOUS event of the
    same (user, event_type) is less than `window_sec` older — the
    at-ingest dedup a telemetry/training-event pipeline applies before
    anything downstream counts things.  lag-based semantics (compare to
    the previous RAW event, not the previous kept one), so it mirrors a
    plain SQL lag window exactly.

    Rides the ordered scan keyed on user_id, sorted
    (user_id, event_type, ts_us, event_id); each (user, type) run's keep
    mask is one vectorized diff — ties (equal ts) dedup deterministically
    by event_id order.  Output: kept rows (user_id, event_id, ts_us,
    event_type)."""
    w_us = window_sec * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
            }
        )

    prepped = events.select_columns(
        ["user_id", "event_type", "ts", "event_id"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    raw = ["user_id", "event_type", "ts_us", "event_id"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="int64"),
                    "event_id": pd.array([], dtype="int64"),
                    "ts_us": pd.array([], dtype="int64"),
                    "event_type": pd.array([], dtype="object"),
                }
            )
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        ts = df["ts_us"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        keep = new.copy()
        keep[1:] |= (ts[1:] - ts[:-1]) >= w_us
        out = df[keep]
        return pd.DataFrame(
            {
                "user_id": pd.array(out["user_id"].to_numpy(), dtype="int64"),
                "event_id": pd.array(out["event_id"].to_numpy(), dtype="int64"),
                "ts_us": pd.array(out["ts_us"].to_numpy(), dtype="int64"),
                "event_type": out["event_type"].reset_index(drop=True),
            }
        )

    return _sorted_user_op(
        prepped, raw, ["user_id", "event_type", "ts_us", "event_id"],
        [False, False, False, False], kernel,
        {"user_id": "int64", "event_id": "int64", "ts_us": "int64",
         "event_type": "object"},
    )


def rolling_median(events: rd.Dataset, w: int = 7) -> rd.Dataset:
    """Per-user rolling lower median of the last `w` events —
    quantile_disc(0.5) OVER (PARTITION BY user ORDER BY event_id ROWS
    BETWEEN w-1 PRECEDING AND CURRENT ROW): the order-statistic rolling
    window the sum/avg family can't express, and the robust-smoothing
    primitive (spike rejection) of monitoring pipelines.

    Kernel: full windows go through ONE sliding_window_view + axis-sort
    (vectorized, w-bounded); only each run's first w-1 ragged-prefix rows
    loop in Python — per RUN, never per row.  The lower median
    (sorted[(n-1)//2]) is integer-exact and matches DuckDB quantile_disc
    at every window length, odd or even."""
    prepped, raw = _prep_events(events, ("event_id", "value_e6"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return df.assign(med_e6=pd.array([], dtype="int64"))
        u = df["user_id"].to_numpy()
        v = df["value_e6"].to_numpy()
        new, _ = _run_firsts(u)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        out = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            vr = v[s:e]
            m = e - s
            head = min(w - 1, m)
            for i in range(head):
                win = np.sort(vr[: i + 1])
                out[s + i] = win[i // 2]
            if m >= w:
                sw = np.sort(
                    np.lib.stride_tricks.sliding_window_view(vr, w), axis=1
                )
                out[s + w - 1 : e] = sw[:, (w - 1) // 2]
        return df.assign(med_e6=pd.array(out, dtype="int64"))

    return _sorted_user_op(
        prepped, raw, ["user_id", "event_id"], [False, False], kernel,
        {"user_id": "int64", "event_id": "int64", "value_e6": "int64",
         "med_e6": "int64"},
    )
