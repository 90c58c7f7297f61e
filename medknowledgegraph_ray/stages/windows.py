"""Windowed / ordered-log operators over the `events` stream table.

Ray Data has no event-time windows; the stream-shaped semantics are
expressed as key-partitioned group transforms over ts-sorted groups
(ordering assumption: all rows of one user_id fit one group and are sorted
inside it — the transcript `(conv_id, turn_idx)` pattern generalized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


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


def top_events_per_user(events: rd.Dataset, k: int = 3) -> rd.Dataset:
    """Grouped top-k (by scaled value desc, event_id asc) via the salted
    two-phase merge — the hot-key-safe holistic-aggregate shape."""
    from .skew import salted_grouped_topk

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    prepped = events.select_columns(["user_id", "event_id", "value"]).map_batches(
        prep, batch_format="pandas"
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["value_e6", "event_id"], ascending=[False, True],
                             kind="mergesort").head(k)

    def pick_and_rank(g: pd.DataFrame) -> pd.DataFrame:
        g = pick(g)
        g["rank"] = pd.array(range(1, len(g) + 1), dtype="int64")
        return g

    return salted_grouped_topk(prepped, "user_id", "event_id", pick, final=pick_and_rank)


def asof_prev(events: rd.Dataset) -> rd.Dataset:
    """As-of self-join: each event gets the value of the user's immediately
    preceding event (0 when none) — the ordered-log lag/as-of-join shape,
    expressed as a per-user sorted scan (the (conv_id, turn_idx) ordering
    pattern generalized; partitioning assumption: one user fits one group)."""

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = np.round(g["value"].to_numpy() * 1e6).astype("int64")
        prev = np.concatenate([[0], v[:-1]])
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "event_id": g["event_id"].astype("int64"),
                "ts_us": g["ts"].astype("int64"),
                "value_e6": v,
                "prev_value_e6": prev,
            }
        )

    return (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(lag, batch_format="pandas")
    )


def sessionize(events: rd.Dataset, gap_sec: int = 1800) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds `gap_sec`.  Inherently ordered → per-user group
    sort + cumulative scan (pandas) inside `map_groups`; oracle via SQL
    window functions (lag + running sum)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        epoch_us = g["ts"].astype("int64")
        gap_us = gap_sec * 1_000_000
        new_sess = (epoch_us.diff().fillna(gap_us + 1) > gap_us).astype(int)
        sess_idx = new_sess.cumsum()
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].astype("int64"),
                    "session_idx": sess_idx.astype("int64"),
                    "ts_us": epoch_us.to_numpy(),
                    "value_e6": np.round(g["value"].to_numpy() * 1e6).astype("int64"),
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
        for c in ("n_events", "start_us", "end_us", "value_sum_e6"):
            out[c] = out[c].astype("int64")
        return out

    return (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
    )
