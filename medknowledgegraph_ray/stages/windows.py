"""Windowed / ordered-log operators over the `events` stream table.

Ray Data has no event-time windows; the stream-shaped semantics are built
on two exchange shapes, neither assuming a user fits one group:

- keyed algebraic aggregation (tumbling/sliding) via stages/groupagg.py —
  per-block partial, parallel sort, per-block combine, edge repair;
- ordered scans (sessionize / as-of lag) via a global
  (user_id, ts, event_id) range sort, one VECTORIZED pass per block over
  all interior users, and per-user repair only for the ≤2 users that can
  straddle a block edge — the transcript `(conv_id, turn_idx)` stable-
  ordering pattern generalized to unbounded keys.
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
    """Grouped top-k (by scaled value desc, event_id asc), scale-safe for
    corpus-many groups: global sort on (user_id, value_e6 desc, event_id),
    vectorized head-k per user per block (cumcount over sorted runs), and
    per-user repair only for the ≤2 block-edge users.  For the OTHER top-k
    regime — few groups, each corpus-scale — see skew.salted_grouped_topk
    (used by the ANN merge)."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "event_id", "value"])
        .map_batches(prep, batch_format="pandas")
        .sort(["user_id", "value_e6", "event_id"], descending=[False, True, False])
    )

    def headk_sorted(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        n = len(df)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        # rank within user = position since the user's first row
        first_pos = np.where(new_user, np.arange(n), 0)
        np.maximum.accumulate(first_pos, out=first_pos)
        rank = np.arange(n) - first_pos + 1
        out = df[rank <= k].copy()
        out["rank"] = pd.array(rank[rank <= k], dtype="int64")
        return out

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(rank=pd.array([], dtype="int64"),
                             is_edge=pd.array([], dtype="bool"))
        first, last = df["user_id"].iloc[0], df["user_id"].iloc[-1]
        edge_mask = df["user_id"].isin({first, last})
        interior = headk_sorted(df[~edge_mask.to_numpy()])
        interior = interior.assign(is_edge=pd.array([False] * len(interior), dtype="bool"))
        edge = df[edge_mask.to_numpy()].assign(
            rank=pd.array([0] * int(edge_mask.sum()), dtype="int64"),
            is_edge=pd.array([True] * int(edge_mask.sum()), dtype="bool"),
        )
        return pd.concat([interior, edge], ignore_index=True)

    flagged = s.map_batches(split, batch_format="pandas").materialize()
    cols = ["user_id", "event_id", "value_e6", "rank"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )

    def edge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value_e6", "event_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = pd.array(range(1, len(g) + 1), dtype="int64")
        return g[cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .groupby("user_id")
        .map_groups(edge_topk, batch_format="pandas")
    )
    return interior.union(edges)


def ranked_events(events: rd.Dataset) -> rd.Dataset:
    """ROW_NUMBER / RANK / DENSE_RANK per user over (value desc, event_id)
    — the ranking window functions Ray Data lacks.

    Scale shape: ONE global sort on (user_id, value_e6 desc, event_id),
    then every interior user's three ranks come out of one vectorized
    run-length pass per block (rank = first index of the (user, value) run
    within the user, dense rank = distinct-value count so far); only the
    ≤2 users touching a block edge are re-ranked per-user."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "event_id", "value"])
        .map_batches(prep, batch_format="pandas", batch_size=None)
        .sort(["user_id", "value_e6", "event_id"], descending=[False, True, False])
    )

    def ranks_sorted(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return df.assign(
                row_num=pd.array([], dtype="int64"),
                rnk=pd.array([], dtype="int64"),
                dense_rnk=pd.array([], dtype="int64"),
            )
        u = df["user_id"].to_numpy()
        v = df["value_e6"].to_numpy()
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        new_val = new_user.copy()
        new_val[1:] |= v[1:] != v[:-1]
        user_first = np.where(new_user, np.arange(n), 0)
        np.maximum.accumulate(user_first, out=user_first)
        val_first = np.where(new_val, np.arange(n), 0)
        np.maximum.accumulate(val_first, out=val_first)
        dense_global = np.cumsum(new_val)
        return df.assign(
            row_num=(np.arange(n) - user_first + 1).astype("int64"),
            rnk=(val_first - user_first + 1).astype("int64"),
            dense_rnk=(dense_global - dense_global[user_first] + 1).astype("int64"),
        )

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(
                row_num=pd.array([], dtype="int64"),
                rnk=pd.array([], dtype="int64"),
                dense_rnk=pd.array([], dtype="int64"),
                is_edge=pd.array([], dtype="bool"),
            )
        first, last = df["user_id"].iloc[0], df["user_id"].iloc[-1]
        edge = df["user_id"].isin({first, last}).to_numpy()
        return ranks_sorted(df).assign(is_edge=edge)

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    cols = ["user_id", "event_id", "value_e6", "row_num", "rnk", "dense_rnk"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )

    def edge_ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value_e6", "event_id"], ascending=[False, True],
                          kind="mergesort")
        return ranks_sorted(g)[cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t[cols[:3]], batch_format="pandas")
        .groupby("user_id")
        .map_groups(edge_ranks, batch_format="pandas")
    )
    return interior.union(edges)


def asof_prev(events: rd.Dataset) -> rd.Dataset:
    """As-of self-join: each event gets the value of the user's immediately
    preceding event (0 when none) — the ordered-log lag/as-of-join shape.

    Same scale shape as sessionize: global (user, ts, event_id) sort, one
    vectorized lag pass per block for interior users, per-user repair only
    for the ≤2 users touching a block edge."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "ts_us": batch["ts"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(prep, batch_format="pandas")
        .sort(["user_id", "ts_us", "event_id"])
    )

    def lag_sorted(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value_e6"].to_numpy()
        u = df["user_id"].to_numpy()
        prev = np.concatenate([[0], v[:-1]]) if len(v) else v
        if len(v) > 1:
            prev[np.concatenate([[True], u[1:] != u[:-1]])] = 0
        elif len(v) == 1:
            prev = np.array([0], dtype="int64")
        return df.assign(prev_value_e6=prev.astype("int64"))

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(prev_value_e6=pd.array([], dtype="int64"),
                             is_edge=pd.array([], dtype="bool"))
        first, last = df["user_id"].iloc[0], df["user_id"].iloc[-1]
        edge = df["user_id"].isin({first, last}).to_numpy()
        out = lag_sorted(df)
        return out.assign(is_edge=edge)

    flagged = s.map_batches(split, batch_format="pandas").materialize()
    cols = ["user_id", "event_id", "ts_us", "value_e6", "prev_value_e6"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )

    def edge_lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        return lag_sorted(g)[cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t[cols[:-1]], batch_format="pandas")
        .groupby("user_id")
        .map_groups(edge_lag, batch_format="pandas")
    )
    return interior.union(edges)


def ntile_events(events: rd.Dataset, k: int = 4) -> rd.Dataset:
    """NTILE(k) per user over (value desc, event_id): split each user's
    events into k near-equal buckets, the first n%k buckets one row larger
    — SQL NTILE semantics exactly.

    Same sorted-exchange shape as ranked_events: interior users resolve
    vectorized per block (rank and run length are both run-local facts);
    the ≤2 block-edge users repair per-user."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "event_id", "value"])
        .map_batches(prep, batch_format="pandas", batch_size=None)
        .sort(["user_id", "value_e6", "event_id"], descending=[False, True, False])
    )

    def ntile_sorted(df: pd.DataFrame) -> pd.DataFrame:
        n_rows = len(df)
        if n_rows == 0:
            return df.assign(bucket=pd.array([], dtype="int64"))
        u = df["user_id"].to_numpy()
        new_user = np.ones(n_rows, dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        user_first = np.where(new_user, np.arange(n_rows), 0)
        np.maximum.accumulate(user_first, out=user_first)
        r = np.arange(n_rows) - user_first + 1  # 1-based rank within user
        firsts = np.flatnonzero(new_user)
        counts = np.diff(np.append(firsts, n_rows))
        n = np.repeat(counts, counts)  # each row's user run length
        size = n // k
        rem = n % k
        big_span = rem * (size + 1)
        in_big = r <= big_span
        # ceil division without floats
        bucket = np.where(
            in_big,
            (r + size) // np.maximum(size + 1, 1),
            rem + (r - big_span + np.maximum(size, 1) - 1) // np.maximum(size, 1),
        )
        return df.assign(bucket=bucket.astype("int64"))

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(bucket=pd.array([], dtype="int64"),
                             is_edge=pd.array([], dtype="bool"))
        first, last = df["user_id"].iloc[0], df["user_id"].iloc[-1]
        edge = df["user_id"].isin({first, last}).to_numpy()
        return ntile_sorted(df).assign(is_edge=edge)

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    cols = ["user_id", "event_id", "value_e6", "bucket"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )

    def edge_ntile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value_e6", "event_id"], ascending=[False, True],
                          kind="mergesort")
        return ntile_sorted(g)[cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t[cols[:3]], batch_format="pandas")
        .groupby("user_id")
        .map_groups(edge_ntile, batch_format="pandas")
    )
    return interior.union(edges)


def latest_event_per_user(events: rd.Dataset) -> rd.Dataset:
    """Grouped argmax: each user's LATEST event row (max ts, ties to the
    larger event_id) — the compaction / CDC-upsert shape (keep the newest
    record per key).  Argmax is associative, so each map task pre-reduces
    its block to one row per user BEFORE the exchange (the partial-agg
    trick extended to a holistic-looking operator) — the sort moves
    |users| × blocks rows, never the corpus.  Then first-row-per-user per
    sorted block vectorized, per-user repair only at block edges."""

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

    s = (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(prep, batch_format="pandas", batch_size=None)
        .sort(["user_id", "ts_us", "event_id"], descending=[False, True, True])
    )
    cols = ["user_id", "event_id", "ts_us", "value_e6"]

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(is_edge=pd.array([], dtype="bool"))
        u = df["user_id"].to_numpy()
        n = len(df)
        edge = (u == u[0]) | (u == u[-1])
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        keep = (new_user & ~edge) | edge  # interior firsts + all edge rows
        out = df[keep]
        return out.assign(is_edge=edge[keep])

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )

    def edge_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], ascending=[False, False],
                          kind="mergesort")
        return g.head(1)[cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t[cols], batch_format="pandas")
        .groupby("user_id")
        .map_groups(edge_latest, batch_format="pandas")
    )
    return interior.union(edges)


def asof_next(events: rd.Dataset) -> rd.Dataset:
    """LEAD: each event gets the value of the user's immediately FOLLOWING
    event (0 when none) — asof_prev's mirror, same single-sort scale shape
    (vectorized shift per block for interior users, per-user repair only at
    block edges)."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "ts_us": batch["ts"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(prep, batch_format="pandas", batch_size=None)
        .sort(["user_id", "ts_us", "event_id"])
    )

    def lead_sorted(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value_e6"].to_numpy()
        u = df["user_id"].to_numpy()
        if len(v) == 0:
            return df.assign(next_value_e6=pd.array([], dtype="int64"))
        nxt = np.concatenate([v[1:], [0]])
        # a user's last row gets 0, not the next user's first value
        nxt[np.concatenate([u[1:] != u[:-1], [True]])] = 0
        return df.assign(next_value_e6=nxt.astype("int64"))

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(next_value_e6=pd.array([], dtype="int64"),
                             is_edge=pd.array([], dtype="bool"))
        first, last = df["user_id"].iloc[0], df["user_id"].iloc[-1]
        edge = df["user_id"].isin({first, last}).to_numpy()
        return lead_sorted(df).assign(is_edge=edge)

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    cols = ["user_id", "event_id", "ts_us", "value_e6", "next_value_e6"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )

    def edge_lead(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        return lead_sorted(g)[cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t[cols[:-1]], batch_format="pandas")
        .groupby("user_id")
        .map_groups(edge_lead, batch_format="pandas")
    )
    return interior.union(edges)


def _quantiles_sorted(df: pd.DataFrame) -> pd.DataFrame:
    """Discrete median/p90 per user over a frame sorted by (user_id,
    value_e6): run-length firsts + counts, element at ceil(n·q)−1 —
    the exact index DuckDB's quantile_disc picks (verified n ≤ 1000)."""
    u = df["user_id"].to_numpy()
    v = df["value_e6"].to_numpy()
    n = len(df)
    new = np.ones(n, dtype=bool)
    new[1:] = u[1:] != u[:-1]
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
    order-statistic aggregate no algebraic combiner can express.  Scale
    shape: global (user_id, value_e6) sort, run-length selection per block
    for every interior user, per-user repair only at block edges — the same
    exchange the other ordered-log operators ride."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "value"])
        .map_batches(prep, batch_format="pandas")
        .sort(["user_id", "value_e6"])
    )

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="int64"),
                    "n_events": pd.array([], dtype="int64"),
                    "median_value_e6": pd.array([], dtype="int64"),
                    "p90_value_e6": pd.array([], dtype="int64"),
                    "value_e6": pd.array([], dtype="int64"),
                    "is_edge": pd.array([], dtype="bool"),
                }
            )
        u = df["user_id"].to_numpy()
        edge_mask = (u == u[0]) | (u == u[-1])
        intr = _quantiles_sorted(df[~edge_mask])
        interior = intr.assign(
            value_e6=pd.array([0] * len(intr), dtype="int64"),
            is_edge=pd.array([False] * len(intr), dtype="bool"),
        )
        edge = df[edge_mask].assign(
            n_events=pd.array([0] * int(edge_mask.sum()), dtype="int64"),
            median_value_e6=pd.array([0] * int(edge_mask.sum()), dtype="int64"),
            p90_value_e6=pd.array([0] * int(edge_mask.sum()), dtype="int64"),
            is_edge=pd.array([True] * int(edge_mask.sum()), dtype="bool"),
        )
        cols = ["user_id", "n_events", "median_value_e6", "p90_value_e6",
                "value_e6", "is_edge"]
        return pd.concat([interior[cols], edge[cols]], ignore_index=True)

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    out_cols = ["user_id", "n_events", "median_value_e6", "p90_value_e6"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[out_cols], batch_format="pandas"
    )

    def edge_q(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_e6", kind="mergesort")
        return _quantiles_sorted(g)[out_cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t[["user_id", "value_e6"]], batch_format="pandas")
        .groupby("user_id")
        .map_groups(edge_q, batch_format="pandas")
    )
    return interior.union(edges)


def _quantiles_cont_sorted(df: pd.DataFrame) -> pd.DataFrame:
    """Interpolated (continuous) median/p90 per user over a frame sorted by
    (user_id, value_e6).  DuckDB's quantile_cont computes
    lower·(1−f) + upper·f at position q·(n−1) — replicated with the SAME
    float64 op order, so equality is bit-exact (verified over the sf0.01
    events table)."""
    u = df["user_id"].to_numpy()
    v = df["value_e6"].to_numpy().astype(np.float64)
    n = len(df)
    new = np.ones(n, dtype=bool)
    new[1:] = u[1:] != u[:-1]
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
    same single-sort scale shape as grouped_quantiles, different selection
    kernel (linear interpolation instead of the discrete order statistic)."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "value"])
        .map_batches(prep, batch_format="pandas", batch_size=None)
        .sort(["user_id", "value_e6"])
    )

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="int64"),
                    "n_events": pd.array([], dtype="int64"),
                    "median_cont": pd.array([], dtype="float64"),
                    "p90_cont": pd.array([], dtype="float64"),
                    "value_e6": pd.array([], dtype="int64"),
                    "is_edge": pd.array([], dtype="bool"),
                }
            )
        u = df["user_id"].to_numpy()
        edge_mask = (u == u[0]) | (u == u[-1])
        intr = _quantiles_cont_sorted(df[~edge_mask])
        interior = intr.assign(
            value_e6=pd.array([0] * len(intr), dtype="int64"),
            is_edge=pd.array([False] * len(intr), dtype="bool"),
        )
        edge = df[edge_mask].assign(
            n_events=pd.array([0] * int(edge_mask.sum()), dtype="int64"),
            median_cont=pd.array([0.0] * int(edge_mask.sum()), dtype="float64"),
            p90_cont=pd.array([0.0] * int(edge_mask.sum()), dtype="float64"),
            is_edge=pd.array([True] * int(edge_mask.sum()), dtype="bool"),
        )
        cols = ["user_id", "n_events", "median_cont", "p90_cont", "value_e6", "is_edge"]
        return pd.concat([interior[cols], edge[cols]], ignore_index=True)

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    out_cols = ["user_id", "n_events", "median_cont", "p90_cont"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[out_cols], batch_format="pandas"
    )

    def edge_q(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_e6", kind="mergesort")
        return _quantiles_cont_sorted(g)[out_cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t[["user_id", "value_e6"]], batch_format="pandas")
        .groupby("user_id")
        .map_groups(edge_q, batch_format="pandas")
    )
    return interior.union(edges)


def _sessionize_sorted(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Vectorized sessionization of a frame already sorted by
    (user_id, ts_us, event_id); handles any number of users at once."""
    u = df["user_id"].to_numpy()
    t = df["ts_us"].to_numpy()
    n = len(df)
    new_user = np.ones(n, dtype=bool)
    new_user[1:] = u[1:] != u[:-1]
    new_sess = new_user.copy()
    new_sess[1:] |= (t[1:] - t[:-1]) > gap_us
    sid_global = np.cumsum(new_sess)
    # per-user numbering: subtract the user's first global session id
    first_pos = np.where(new_user, np.arange(n), 0)
    np.maximum.accumulate(first_pos, out=first_pos)
    session_idx = sid_global - sid_global[first_pos] + 1
    out = (
        pd.DataFrame(
            {
                "user_id": u,
                "session_idx": session_idx.astype("int64"),
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
    for c in ("n_events", "start_us", "end_us", "value_sum_e6"):
        out[c] = out[c].astype("int64")
    return out


def sessionize(events: rd.Dataset, gap_sec: int = 1800) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds `gap_sec`.

    Scale shape: global sort on (user_id, ts_us, event_id), then each block
    sessionizes ALL of its users in one vectorized pass; only the ≤2 users
    that may straddle a block edge (the block's first and last user — after
    a sort a user's rows are contiguous) are re-sessionized from their raw
    events in a tiny per-user pass.  No per-user Python for interior users
    and no one-user-per-group assumption."""
    gap_us = gap_sec * 1_000_000

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "ts_us": batch["ts"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(prep, batch_format="pandas")
        .sort(["user_id", "ts_us", "event_id"])
    )

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="int64"),
                    "session_idx": pd.array([], dtype="int64"),
                    "n_events": pd.array([], dtype="int64"),
                    "start_us": pd.array([], dtype="int64"),
                    "end_us": pd.array([], dtype="int64"),
                    "value_sum_e6": pd.array([], dtype="int64"),
                    "event_id": pd.array([], dtype="int64"),
                    "ts_us_raw": pd.array([], dtype="int64"),
                    "value_e6_raw": pd.array([], dtype="int64"),
                    "is_edge": pd.array([], dtype="bool"),
                }
            )
        first, last = df["user_id"].iloc[0], df["user_id"].iloc[-1]
        edge_mask = df["user_id"].isin({first, last}).to_numpy()
        interior = _sessionize_sorted(df[~edge_mask], gap_us) if (~edge_mask).any() else None
        frames = []
        if interior is not None and len(interior):
            interior = interior.assign(
                event_id=pd.array([0] * len(interior), dtype="int64"),
                ts_us_raw=pd.array([0] * len(interior), dtype="int64"),
                value_e6_raw=pd.array([0] * len(interior), dtype="int64"),
                is_edge=pd.array([False] * len(interior), dtype="bool"),
            )
            frames.append(interior)
        edge = df[edge_mask]
        if len(edge):
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": edge["user_id"].to_numpy(),
                        "session_idx": pd.array([0] * len(edge), dtype="int64"),
                        "n_events": pd.array([0] * len(edge), dtype="int64"),
                        "start_us": pd.array([0] * len(edge), dtype="int64"),
                        "end_us": pd.array([0] * len(edge), dtype="int64"),
                        "value_sum_e6": pd.array([0] * len(edge), dtype="int64"),
                        "event_id": edge["event_id"].to_numpy(),
                        "ts_us_raw": edge["ts_us"].to_numpy(),
                        "value_e6_raw": edge["value_e6"].to_numpy(),
                        "is_edge": pd.array([True] * len(edge), dtype="bool"),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    flagged = s.map_batches(split, batch_format="pandas").materialize()
    cols = ["user_id", "session_idx", "n_events", "start_us", "end_us", "value_sum_e6"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )

    def edge_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us_raw", "event_id"], kind="mergesort")
        raw = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "ts_us": g["ts_us_raw"].to_numpy(),
                "value_e6": g["value_e6_raw"].to_numpy(),
            }
        )
        return _sessionize_sorted(raw, gap_us)

    edges = (
        flagged.filter(expr="is_edge == True")
        .groupby("user_id")
        .map_groups(edge_sessions, batch_format="pandas")
    )
    return interior.union(edges)


def running_aggregates(events: rd.Dataset, w: int = 3) -> rd.Dataset:
    """Per-user running window frames: cumulative sum and a w-row rolling
    sum of value, both in integer micro-units — the ROWS-frame window
    aggregate (SUM OVER ... ROWS BETWEEN) Ray Data lacks.

    Same scale shape as asof_prev/sessionize: ONE global sort on
    (user_id, ts_us, event_id), a vectorized cumsum pass per block for
    every interior user, per-user repair only for the ≤2 users touching a
    block edge."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "ts_us": batch["ts"].astype("int64"),
                "value_e6": np.round(batch["value"].to_numpy() * 1e6).astype("int64"),
            }
        )

    s = (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(prep, batch_format="pandas")
        .sort(["user_id", "ts_us", "event_id"])
    )

    def frames_sorted(df: pd.DataFrame) -> pd.DataFrame:
        """cumsum + rolling-w sum over a frame sorted by (user, ts, id)."""
        n = len(df)
        u = df["user_id"].to_numpy()
        v = df["value_e6"].to_numpy()
        if n == 0:
            return df.assign(cum_value_e6=pd.array([], dtype="int64"),
                             roll_value_e6=pd.array([], dtype="int64"))
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        cs = np.cumsum(v)
        # cumulative sum within each user run
        run_first = np.where(new, np.arange(n), 0)
        np.maximum.accumulate(run_first, out=run_first)
        base = cs[run_first] - v[run_first]
        cum = cs - base
        # rolling w-row sum: cs[i] - cs[i-w] where the frame fits, else cum
        rank = np.arange(n) - run_first + 1
        prev = np.arange(n) - w
        fits = rank > w
        roll = np.where(fits, cs - cs[np.maximum(prev, 0)], cum)
        return df.assign(cum_value_e6=cum.astype("int64"),
                         roll_value_e6=roll.astype("int64"))

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(cum_value_e6=pd.array([], dtype="int64"),
                             roll_value_e6=pd.array([], dtype="int64"),
                             is_edge=pd.array([], dtype="bool"))
        first, last = df["user_id"].iloc[0], df["user_id"].iloc[-1]
        edge = df["user_id"].isin({first, last}).to_numpy()
        return frames_sorted(df).assign(is_edge=edge)

    flagged = s.map_batches(split, batch_format="pandas").materialize()
    cols = ["user_id", "event_id", "ts_us", "value_e6",
            "cum_value_e6", "roll_value_e6"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[cols], batch_format="pandas"
    )

    def edge_frames(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        return frames_sorted(g)[cols]

    edges = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t[cols[:4]], batch_format="pandas")
        .groupby("user_id")
        .map_groups(edge_frames, batch_format="pandas")
    )
    return interior.union(edges)
