"""Range (interval-containment) join: points × keyed non-overlapping intervals.

Ray Data has no range join; equi-join machinery can't express
`p.key = i.key AND i.start <= p.ts <= i.end`.  This is the third member of
the ordered-log family (with sessionize and as-of lag, stages/windows.py):

- tag interval rows (ts = start) and point rows, UNION both sides, and run
  ONE global range sort on (key, ts, side) — interval starts sort before
  points at the same timestamp, making the start bound inclusive;
- per block, one VECTORIZED pass resolves every interior key: forward-fill
  the most recent interval row (numpy maximum.accumulate over row indices),
  then keep points whose filled interval shares their key and has
  end >= ts;
- only the <=2 keys that can straddle a block edge (the block's first and
  last key — contiguous after the sort) are re-resolved per key.

PARTITIONING ASSUMPTION (documented per the custom-operator contract):
intervals must be NON-OVERLAPPING per key, endpoints included — then the
containing interval is exactly the one with the greatest start <= ts, which
is what the forward-fill finds.  Session windows, tumbling windows, and
validity/version ranges all satisfy this; overlapping intervals need the
expansion join (flat-map each interval onto a bucket grid) instead.

At 100 TB both sides stream through one sort exchange; no side is
materialized on the driver and the per-key repair volume is bounded by
2 × block count, independent of data size.
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

_OUT_COLS = ["key", "point_id", "ts_us", "interval_id", "start_us", "end_us"]


def _join_sorted(df: pd.DataFrame) -> pd.DataFrame:
    """Resolve a frame already sorted by (key, ts, side): inner-join each
    point (side 1) to the interval row (side 0) containing it."""
    n = len(df)
    u = df["key"].to_numpy()
    ts = df["ts"].to_numpy()
    side = df["side"].to_numpy()
    end = df["end_us"].to_numpy()
    src = np.where(side == 0, np.arange(n), -1)
    np.maximum.accumulate(src, out=src)  # latest interval row at/before each row
    pts = np.flatnonzero(side == 1)
    cand = src[pts]
    cand_c = np.maximum(cand, 0)
    ok = (cand >= 0) & (u[cand_c] == u[pts]) & (ts[pts] <= end[cand_c])
    rows = pts[ok]
    ival = cand[ok]
    return pd.DataFrame(
        {
            "key": u[rows],
            "point_id": df["point_id"].to_numpy()[rows],
            "ts_us": ts[rows],
            "interval_id": df["interval_id"].to_numpy()[ival],
            "start_us": ts[ival],  # an interval row's ts IS its start
            "end_us": end[ival],
        }
    )


def interval_join(points: rd.Dataset, intervals: rd.Dataset) -> rd.Dataset:
    """points(key, point_id, ts_us) ⋈ intervals(key, interval_id, start_us,
    end_us) on `key equal AND start_us <= ts_us <= end_us` (inner join).

    Output: key, point_id, ts_us, interval_id, start_us, end_us — one row
    per contained point (non-overlap makes the match unique or absent)."""

    # Arrow tag passes: the union feeds straight into the global sort, and
    # Arrow-block inputs keep the whole exchange in Arrow mode (the pandas
    # round-trip every range/as-of join used to pay happened before and
    # through the sort).
    def tag_intervals(t: pa.Table) -> pa.Table:
        zero = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return pa.table(
            {
                "key": pc.cast(t["key"], pa.int64()),
                "ts": pc.cast(t["start_us"], pa.int64()),
                "side": zero,
                "point_id": zero,
                "end_us": pc.cast(t["end_us"], pa.int64()),
                "interval_id": pc.cast(t["interval_id"], pa.int64()),
            }
        )

    def tag_points(t: pa.Table) -> pa.Table:
        zero = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return pa.table(
            {
                "key": pc.cast(t["key"], pa.int64()),
                "ts": pc.cast(t["ts_us"], pa.int64()),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "point_id": pc.cast(t["point_id"], pa.int64()),
                "end_us": zero,
                "interval_id": zero,
            }
        )

    # interval_id is a deterministic tie-break: when several interval rows
    # share (key, ts) — possible in the as-of layering below — the HIGHEST
    # id sorts last and wins the forward-fill; under the non-overlap
    # contract it never fires.
    merged = (
        intervals.map_batches(tag_intervals, batch_format="pyarrow",
                              zero_copy_batch=True)
        .union(points.map_batches(tag_points, batch_format="pyarrow",
                                  zero_copy_batch=True))
        .repartition(_sort_blocks())
        .sort(["key", "ts", "side", "interval_id"])
    )

    def split(df: pd.DataFrame) -> pa.Table:
        # metadata-free Arrow output (see windows._sorted_user_op.split)
        if len(df) == 0:
            out = pd.DataFrame({c: pd.array([], dtype="int64") for c in _OUT_COLS})
            out["ts"] = pd.array([], dtype="int64")
            out["side"] = pd.array([], dtype="int64")
            out["is_edge"] = pd.array([], dtype="bool")
        else:
            u = df["key"].to_numpy()
            edge_mask = (u == u[0]) | (u == u[-1])
            interior = _join_sorted(df[~edge_mask])
            interior = interior.assign(
                ts=pd.array([0] * len(interior), dtype="int64"),
                side=pd.array([0] * len(interior), dtype="int64"),
                is_edge=pd.array([False] * len(interior), dtype="bool"),
            )
            edge = df[edge_mask].assign(
                ts_us=pd.array([0] * int(edge_mask.sum()), dtype="int64"),
                start_us=pd.array([0] * int(edge_mask.sum()), dtype="int64"),
                is_edge=pd.array([True] * int(edge_mask.sum()), dtype="bool"),
            )
            out = pd.concat([interior, edge], ignore_index=True)[
                _OUT_COLS + ["ts", "side", "is_edge"]
            ]
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    flagged = merged.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    interior = flagged.filter(expr="is_edge == False").select_columns(_OUT_COLS)

    def edge_join(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "side", "interval_id"], kind="mergesort")
        return _join_sorted(g)

    edge_src = (
        flagged.filter(expr="is_edge == True")
        .select_columns(["key", "ts", "side", "point_id", "end_us", "interval_id"])
        .materialize()
    )
    from .windows import EDGE_REPAIR_DRIVER_MAX

    if edge_src.count() <= EDGE_REPAIR_DRIVER_MAX:
        # size-gated driver-side repair — saves the groupby exchange (see
        # windows._sorted_user_op); above the gate the distributed groupby
        # stands, row-identical
        edge_df = edge_src.to_pandas()
        outs = [edge_join(g) for _, g in edge_df.groupby("key", sort=False)] if len(edge_df) else []
        outs = [o for o in outs if len(o)]
        if not outs:
            return interior
        rep = pd.concat(outs, ignore_index=True)[_OUT_COLS]
        rep_tab = pa.Table.from_pandas(rep, preserve_index=False).replace_schema_metadata(None)
        return interior.union(rd.from_arrow(rep_tab))
    def edge_join_arrow(g: pd.DataFrame) -> pa.Table:
        # Arrow out — uniform block type with the Arrow interior (a mixed
        # pandas/Arrow union breaks any downstream exchange's block builder)
        out = edge_join(g)[_OUT_COLS]
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    edges = edge_src.groupby("key").map_groups(edge_join_arrow, batch_format="pandas")
    return interior.union(edges)


_INT64_MAX = (1 << 63) - 1


def asof_join(points: rd.Dataset, states: rd.Dataset) -> rd.Dataset:
    """Two-table as-of join: each point (key, point_id, ts_us) inner-joins
    the LATEST state row (key, state_id, ts_us) with state ts <= point ts —
    DuckDB `ASOF JOIN` semantics, the price-as-of-trade / config-as-of-event
    lookup.

    Implemented as interval_join with open-ended intervals (end = int64
    max): the forward-fill of the newest interval start <= ts IS the as-of
    match, so the whole sorted-merge + edge-repair machinery is reused
    verbatim.  The non-overlap contract is NOT required here — overlap is
    the point — because "latest start wins" is the as-of definition.  Ties
    (two states with the same (key, ts)) resolve to the highest state_id
    via the exchange's deterministic tie-break; pre-dedup the state side if
    a different winner is wanted.

    Output: key, point_id, ts_us, state_id, state_ts_us."""

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b["key"].astype("int64"),
                "interval_id": b["state_id"].astype("int64"),
                "start_us": b["ts_us"].astype("int64"),
                "end_us": pd.array([_INT64_MAX] * len(b), dtype="int64"),
            }
        )

    out = interval_join(points, states.map_batches(widen, batch_format="pandas"))

    def shape(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b["key"],
                "point_id": b["point_id"],
                "ts_us": b["ts_us"],
                "state_id": b["interval_id"],
                "state_ts_us": b["start_us"],
            }
        )

    return out.map_batches(shape, batch_format="pandas")
