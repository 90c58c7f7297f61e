"""Algebraic event-log aggregations: pivot (conditional aggregation),
per-user activity profile with distinct-type counts, and JSON-props field
extraction.

All three are combiner-friendly (sum/min/max/count), so they ride the
partial-aggregate sorted exchange in stages/groupagg.py — each map task
pre-aggregates its batch before any shuffle, so the exchange moves one row
per key per block regardless of corpus size.  No reference analog (the
reference has no event log); these are the training-data-pipeline side of
SURVEY §2's aggregation family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .groupagg import grouped_agg

# the corpus's closed event-type vocabulary (TESTDATA.md); anything else
# lands only in n_total
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(events: rd.Dataset) -> rd.Dataset:
    """Per user: one count column per event type plus a total — the
    pivot/crosstab shape (oracle: SUM(CASE WHEN ...)).  One-hot int64
    columns per batch, then the algebraic exchange; output cardinality is
    |users|, exchange volume ≤ |types|+2 columns × one row per user per
    block."""

    def one_hot(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy()
        out = {"user_id": b["user_id"].astype("int64")}
        for t in EVENT_TYPES:
            out[f"n_{t}"] = pd.array((et == t).astype(np.int64), dtype="int64")
        out["n_total"] = pd.array(np.ones(len(b), dtype=np.int64), dtype="int64")
        return pd.DataFrame(out)

    keyed = events.select_columns(["user_id", "event_type"]).map_batches(
        one_hot, batch_format="pandas", batch_size=None
    )
    aggs = [(f"n_{t}", "sum", f"n_{t}") for t in EVENT_TYPES]
    aggs.append(("n_total", "sum", "n_total"))
    return grouped_agg(keyed, ["user_id"], aggs)


def user_type_profile(events: rd.Dataset) -> rd.Dataset:
    """Per user: event count, DISTINCT event-type count, first/last event
    time — the grouped COUNT(DISTINCT) shape.  Two algebraic exchanges:
    (user, type)-keyed partials first (cardinality ≤ |users|·|types|), then
    a user-keyed roll-up where COUNT of the intermediate rows IS the
    distinct-type count.  Never a per-group Python reduce."""

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "event_type": b["event_type"],
                "ts_us": b["ts"].astype("int64"),
            }
        )

    keyed = events.select_columns(["user_id", "event_type", "ts"]).map_batches(
        prep, batch_format="pandas", batch_size=None
    )
    per_type = grouped_agg(
        keyed,
        ["user_id", "event_type"],
        [("ts_us", "count", "n"), ("ts_us", "min", "ts_min"), ("ts_us", "max", "ts_max")],
    )
    return grouped_agg(
        per_type,
        ["user_id"],
        [
            ("n", "sum", "n_events"),
            ("n", "count", "n_types"),
            ("ts_min", "min", "first_ts_us"),
            ("ts_max", "max", "last_ts_us"),
        ],
    )


def user_moments(events: rd.Dataset) -> rd.Dataset:
    """Per user: exact integer first and second moments of value (count,
    Σv, Σv², min, max in fixed-point units) plus the float mean — the
    streaming-statistics aggregate (variance/stddev derive from the
    moments downstream).  Values are scaled to e3 so the squared sums are
    exact int64 (v_e3² ≤ 1.5e10; per-user event counts bound the group
    sum well under 2⁶³ — a 10⁸-event user would still fit).  Algebraic,
    so it rides the partial-agg exchange.  Mean is computed as the same
    float64 division on both sides (IEEE-identical to the oracle)."""

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        v = np.round(b["value"].to_numpy() * 1e3).astype("int64")
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "v_e3": pd.array(v, dtype="int64"),
                "v2_e6": pd.array(v * v, dtype="int64"),
            }
        )

    keyed = events.select_columns(["user_id", "value"]).map_batches(
        prep, batch_format="pandas", batch_size=None
    )
    agg = grouped_agg(
        keyed,
        ["user_id"],
        [
            ("v_e3", "count", "n"),
            ("v_e3", "sum", "sum_e3"),
            ("v2_e6", "sum", "sumsq_e6"),
            ("v_e3", "min", "min_e3"),
            ("v_e3", "max", "max_e3"),
        ],
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["mean_e3"] = b["sum_e3"].to_numpy() / b["n"].to_numpy()
        return b

    return agg.map_batches(finish, batch_format="pandas")


def funnel_stages(
    events: rd.Dataset,
    steps: tuple[str, str, str] = ("signup", "click", "purchase"),
) -> rd.Dataset:
    """Ordered conversion funnel: per user who performed step 1, the
    earliest step-1 time, the earliest step-2 event AFTER it, the earliest
    step-3 event after that, and the reached stage (1–3) — the
    event-analytics funnel shape.

    Broadcast-free composition: each step is a filtered algebraic
    grouped-min, chained to the previous step's frontier via the
    sorted-merge equi-join (the frontier is user-cardinality — itself
    corpus-scale at 10¹² events, so it joins, never broadcasts); the
    final assembly is two LEFT joins back onto the step-1 base."""
    from .join import equi_join

    import pyarrow as pa
    import pyarrow.compute as pc

    def step_events(etype: str) -> rd.Dataset:
        # arrow, not pandas: an empty pandas result block is schema-less
        # and flips downstream sorts into pandas mode (int64 → double)
        def prep(t: pa.Table) -> pa.Table:
            kept = t.filter(pc.equal(t["event_type"], etype))
            return pa.table(
                {
                    "user_id": pc.cast(kept["user_id"], pa.int64()),
                    "ts_us": pc.cast(kept["ts"], pa.int64()),
                }
            )

        return events.select_columns(["user_id", "event_type", "ts"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    _I64IN = {"user_id": pa.int64(), "ts_us": pa.int64()}
    t1 = grouped_agg(step_events(steps[0]), ["user_id"], [("ts_us", "min", "t1_us")],
                     types=_I64IN)

    # every funnel column is int64; declaring it keeps equi_join working
    # when a step has NO qualifying events (empty pandas-lineage frontier
    # has no schema to peek)
    _I64 = {c: pa.int64() for c in ("t1_us", "t2_us", "t3_us", "ts_us")}

    def next_frontier(prev: rd.Dataset, prev_col: str, etype: str, alias: str) -> rd.Dataset:
        joined = equi_join(prev, step_events(etype), "user_id", [prev_col], ["ts_us"],
                           types=_I64)

        def after(t: pa.Table) -> pa.Table:
            kept = t.filter(pc.greater(t["ts_us"], t[prev_col]))
            return pa.table(
                {
                    "user_id": pc.cast(kept["user_id"], pa.int64()),
                    "ts_us": pc.cast(kept["ts_us"], pa.int64()),
                }
            )

        stepped = joined.map_batches(after, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)
        return grouped_agg(stepped, ["user_id"], [("ts_us", "min", alias)],
                           types=_I64IN)

    t2 = next_frontier(t1, "t1_us", steps[1], "t2_us")
    t3 = next_frontier(t2, "t2_us", steps[2], "t3_us")

    base = equi_join(t2, t1, "user_id", ["t2_us"], ["t1_us"], how="left", types=_I64)
    full = equi_join(t3, base, "user_id", ["t3_us"], ["t2_us", "t1_us"], how="left",
                     types=_I64)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        has2 = b["t2_us"].notna().to_numpy()
        has3 = b["t3_us"].notna().to_numpy()
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "t1_us": b["t1_us"].astype("int64"),
                "t2_us": b["t2_us"].fillna(0).astype("int64"),
                "t3_us": b["t3_us"].fillna(0).astype("int64"),
                "stage": pd.array(
                    1 + has2.astype(np.int64) + has3.astype(np.int64), dtype="int64"
                ),
            }
        )

    return full.map_batches(finish, batch_format="pandas")


def daily_retention(events: rd.Dataset) -> rd.Dataset:
    """Cohort retention: per day, how many users were active, and how many
    of those return the NEXT day — the activity-analytics retention curve.

    Three key-bounded steps: distinct (user, day) via the algebraic
    exchange (corpus → user-days), a next-day flag per user on ONE
    (user_id, day) sort (a lead comparison over the distinct days — the
    windows scaffold's kernel shape), and a day-keyed roll-up."""
    from .windows import _sorted_user_op

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "day": (b["ts"].astype("int64") // 86_400_000_000).astype("int64"),
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    keyed = events.select_columns(["user_id", "ts"]).map_batches(
        prep, batch_format="pandas", batch_size=None
    )
    active = grouped_agg(keyed, ["user_id", "day"], [("one", "count", "n")])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        d = df["day"].to_numpy()
        nd = len(df)
        nxt = np.zeros(nd, dtype=np.int64)
        if nd > 1:
            nxt[:-1] = ((u[1:] == u[:-1]) & (d[1:] == d[:-1] + 1)).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": pd.array(u, dtype="int64"),
                "day": pd.array(d, dtype="int64"),
                "retained": pd.array(nxt, dtype="int64"),
                "one": pd.array(np.ones(nd, dtype=np.int64), dtype="int64"),
            }
        )

    flagged = _sorted_user_op(
        active.map_batches(lambda b: b[["user_id", "day"]], batch_format="pandas",
                           batch_size=None),
        ["user_id", "day"],
        ["user_id", "day"],
        [False, False],
        kernel,
        {"user_id": "int64", "day": "int64", "retained": "int64", "one": "int64"},
    )
    return grouped_agg(
        flagged, ["day"],
        [("one", "sum", "n_active"), ("retained", "sum", "n_retained")],
    )


def props_field_stats(events: rd.Dataset) -> rd.Dataset:
    """Per event type: count / sum / min / max of the integer `k` field
    embedded in the JSON `props` string — the semi-structured-extraction
    shape (oracle: CAST(regexp_extract(props, '[0-9]+') AS BIGINT)).
    Extraction is one vectorized pandas str.extract per batch; the
    aggregation is algebraic over a 5-key space."""

    def extract(b: pd.DataFrame) -> pa.Table:
        k = (
            b["props"]
            .fillna("")
            .str.extract(r"([0-9]+)", expand=False)
            .fillna("0")
            .astype("int64")
        )
        # Arrow out: a size-0 pandas OBJECT column trips Ray's size
        # estimator (np.vectorize on empty input) and spams every block;
        # Arrow empties keep their schema and skip that path
        return pa.table(
            {
                "event_type": pa.array(b["event_type"], pa.string()),
                "k": pa.array(k.to_numpy(), pa.int64()),
            }
        )

    keyed = events.select_columns(["event_type", "props"]).map_batches(
        extract, batch_format="pandas", batch_size=None
    )
    return grouped_agg(
        keyed,
        ["event_type"],
        [
            ("k", "count", "n"),
            ("k", "sum", "k_sum"),
            ("k", "min", "k_min"),
            ("k", "max", "k_max"),
        ],
    )


def mode_event_per_user(events: rd.Dataset) -> rd.Dataset:
    """Grouped MODE: each user's most frequent event_type (ties broken by
    event_type ascending), with its count — an algebraic grouped count
    followed by one keep_first argmin exchange on the (small) per-(user,
    type) count table; never a per-user materialization."""
    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "event_type": b["event_type"],
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    counts = grouped_agg(
        events.select_columns(["user_id", "event_type"]).map_batches(
            keyed, batch_format="pandas", batch_size=None
        ),
        ["user_id", "event_type"],
        [("one", "count", "n")],
    )

    def negate(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["neg_n"] = -b["n"].astype("int64")
        return b

    from .orderedagg import keep_first

    top = keep_first(
        counts.map_batches(negate, batch_format="pandas", batch_size=None),
        "user_id",
        ["neg_n", "event_type"],
    )
    return top.map_batches(
        lambda b: b[["user_id", "event_type", "n"]], batch_format="pandas"
    )


def event_transitions(events: rd.Dataset) -> rd.Dataset:
    """Markov transition counts: for every ordered pair of event types,
    how often one immediately follows the other within a user's stream —
    the behavioral-sequence primitive (funnel discovery, next-action
    models).  One ordered scan emitting consecutive-pair rows per run,
    then a key-bounded (|types|²) count exchange."""
    from .windows import _sorted_user_op

    # event_type must ride the scan; windows._prep_events only scales
    # numerics, so project directly and sort on (user, ts, event_id)
    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "ts_us": b["ts"].astype("int64"),
                "event_id": b["event_id"].astype("int64"),
                "event_type": b["event_type"],
            }
        )

    prepped = events.select_columns(["user_id", "ts", "event_id", "event_type"]).map_batches(
        keyed, batch_format="pandas", batch_size=None
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"type_from": pd.array([], dtype="object"),
             "type_to": pd.array([], dtype="object")}
        )
        n = len(df)
        if n < 2:
            return empty
        u = df["user_id"].to_numpy()
        t = df["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        return pd.DataFrame({"type_from": t[:-1][same], "type_to": t[1:][same]})

    pairs = _sorted_user_op(
        prepped, ["user_id", "ts_us", "event_id", "event_type"],
        ["user_id", "ts_us", "event_id"], [False, False, False],
        kernel, {"type_from": "object", "type_to": "object"},
    )

    def one(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "type_from": b["type_from"],
                "type_to": b["type_to"],
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    return grouped_agg(
        pairs.map_batches(one, batch_format="pandas", batch_size=None),
        ["type_from", "type_to"],
        [("one", "sum", "n")],
    )


def running_distinct_types(events: rd.Dataset) -> rd.Dataset:
    """Running COUNT(DISTINCT event_type) per user over time — "how many
    distinct actions has this user taken so far", the cumulative-novelty
    curve.  SQL window functions cannot COUNT(DISTINCT) directly; here it
    is one ordered scan: flag each row that is its (user, type)'s first
    occurrence (vectorized duplicated() on the time-sorted frame), then a
    segmented cumsum of the flags."""
    from .windows import _run_firsts, _sorted_user_op

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "ts_us": b["ts"].astype("int64"),
                "event_id": b["event_id"].astype("int64"),
                "event_type": b["event_type"],
            }
        )

    prepped = events.select_columns(["user_id", "ts", "event_id", "event_type"]).map_batches(
        keyed, batch_format="pandas", batch_size=None
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="int64"),
                    "event_id": pd.array([], dtype="int64"),
                    "ts_us": pd.array([], dtype="int64"),
                    "n_types_seen": pd.array([], dtype="int64"),
                }
            )
        first = (~df.duplicated(["user_id", "event_type"])).to_numpy().astype(np.int64)
        cs = np.cumsum(first)
        _, run_first = _run_firsts(df["user_id"].to_numpy())
        seen = cs - (cs[run_first] - first[run_first])
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "ts_us": df["ts_us"].to_numpy(),
                "n_types_seen": pd.array(seen, dtype="int64"),
            }
        )

    return _sorted_user_op(
        prepped, ["user_id", "ts_us", "event_id", "event_type"],
        ["user_id", "ts_us", "event_id"], [False, False, False],
        kernel,
        {"user_id": "int64", "event_id": "int64", "ts_us": "int64",
         "n_types_seen": "int64"},
    )


def window_distinct_users(events: rd.Dataset, width_sec: int = 3600) -> rd.Dataset:
    """COUNT(DISTINCT user_id) per tumbling window — the time-bucketed
    distinct the per-user profile (user_type_profile) does per key, here
    per window: two algebraic exchanges (distinct (window, user) pairs,
    then pair counts per window), so neither pass ever materializes a
    window's users in one place."""

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        epoch_us = b["ts"].astype("int64")
        return pd.DataFrame(
            {
                "window_id": (epoch_us // (width_sec * 1_000_000)).astype("int64"),
                "user_id": b["user_id"].astype("int64"),
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    pairs = grouped_agg(
        events.select_columns(["ts", "user_id"]).map_batches(
            keyed, batch_format="pandas", batch_size=None
        ),
        ["window_id", "user_id"],
        [("one", "count", "c")],
    )

    def one(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_id": b["window_id"].astype("int64"),
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    return grouped_agg(
        pairs.map_batches(one, batch_format="pandas", batch_size=None),
        ["window_id"],
        [("one", "sum", "n_users")],
    )


def event_type_cooccurrence(events: rd.Dataset) -> rd.Dataset:
    """Market-basket pair counts: for every unordered pair of event types,
    how many users performed BOTH — the co-occurrence / association-rule
    primitive.

    Shape: distinct (user, type) pairs via one algebraic exchange, then a
    per-user pair expansion on the ordered scan (each user's distinct
    types are contiguous after the sort; pairs per user are C(t,2) with t
    bounded by the type vocabulary, never the event count), then a final
    key-bounded pair-count exchange.  The expansion kernel is vectorized
    by run size (one triu_indices per distinct per-user type count)."""

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "event_type": b["event_type"],
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    distinct = grouped_agg(
        events.select_columns(["user_id", "event_type"]).map_batches(
            keyed, batch_format="pandas", batch_size=None
        ),
        ["user_id", "event_type"],
        [("one", "count", "c")],
    ).select_columns(["user_id", "event_type"])

    from .windows import _sorted_user_op

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"type_a": pd.array([], dtype="object"),
                 "type_b": pd.array([], dtype="object")}
            )
        u = df["user_id"].to_numpy()
        t = df["event_type"].to_numpy()
        n = len(df)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        a_parts, b_parts = [], []
        for c in np.unique(counts):
            if c < 2:
                continue
            runs = starts[counts == c]
            ii, jj = np.triu_indices(int(c), k=1)
            a_parts.append(t[(runs[:, None] + ii[None, :]).ravel()])
            b_parts.append(t[(runs[:, None] + jj[None, :]).ravel()])
        if not a_parts:
            return pd.DataFrame(
                {"type_a": pd.array([], dtype="object"),
                 "type_b": pd.array([], dtype="object")}
            )
        return pd.DataFrame(
            {"type_a": np.concatenate(a_parts), "type_b": np.concatenate(b_parts)}
        )

    pairs = _sorted_user_op(
        distinct, ["user_id", "event_type"], ["user_id", "event_type"],
        [False, False], kernel, {"type_a": "object", "type_b": "object"},
    )

    def one(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "type_a": b["type_a"],
                "type_b": b["type_b"],
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    return grouped_agg(
        pairs.map_batches(one, batch_format="pandas", batch_size=None),
        ["type_a", "type_b"],
        [("one", "sum", "n_users")],
    )


def association_rules(events: rd.Dataset, min_support: int = 5) -> rd.Dataset:
    """Directed association rules over event types: for every ordered pair
    (ante → cons) of types co-performed by ≥ min_support users, the rule's
    support (n_both), antecedent support (n_ante = users with ante), and
    confidence n_both / n_ante — the market-basket step after
    event_type_cooccurrence's pair counts.

    Shape: pair supports ride the existing cooccurrence exchange chain;
    per-type supports are ONE grouped count whose result is bounded by the
    type DOMAIN (not the corpus), so the antecedent attach is a broadcast
    dict by construction.  Confidence is one float64 division of
    bit-identical integers on both engines (the doc_weighted_sample
    precedent), so it is oracle-exact."""

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "event_type": b["event_type"],
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    distinct = grouped_agg(
        events.select_columns(["user_id", "event_type"]).map_batches(
            keyed, batch_format="pandas", batch_size=None
        ),
        ["user_id", "event_type"],
        [("one", "count", "c")],
    ).select_columns(["user_id", "event_type"])
    supports = grouped_agg(
        distinct.map_batches(
            lambda b: pd.DataFrame(
                {"event_type": b["event_type"],
                 "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64")}
            ),
            batch_format="pandas", batch_size=None,
        ),
        ["event_type"], [("one", "count", "n")],
    )
    sup = {
        t: int(n)
        for b in supports.iter_batches(batch_format="pandas")
        for t, n in zip(b["event_type"], b["n"])
    }
    sup_ref = ray.put(sup)
    pairs = event_type_cooccurrence(events)

    def rules(b: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(sup_ref)
        keep = b["n_users"].to_numpy() >= min_support
        b = b[keep]
        ante = list(b["type_a"]) + list(b["type_b"])
        cons = list(b["type_b"]) + list(b["type_a"])
        n_both = np.concatenate([b["n_users"].to_numpy()] * 2).astype(np.int64)
        n_ante = np.array([lut[t] for t in ante], dtype=np.int64)
        return pd.DataFrame(
            {
                "ante": pd.Series(ante, dtype="object"),
                "cons": pd.Series(cons, dtype="object"),
                "n_both": pd.array(n_both, dtype="int64"),
                "n_ante": pd.array(n_ante, dtype="int64"),
                "conf": pd.array(
                    n_both.astype(np.float64) / n_ante.astype(np.float64),
                    dtype="float64",
                ),
            }
        )

    return pairs.map_batches(rules, batch_format="pandas", batch_size=None)


def equi_depth_histogram(events: rd.Dataset, k: int = 8) -> rd.Dataset:
    """Equi-depth (equal-count) histogram of the value column — the
    data-profiling complement of the fixed-width `ev_histogram`: ntile(k)
    buckets over the total order (value_e6, event_id), so bucket
    BOUNDARIES adapt while counts stay equal (first n%k buckets carry one
    extra row — exact ntile semantics).  Per bucket: (bucket, n, min_e6,
    max_e6) — the quantile-boundary summary optimizers and data-balance
    checks consume.

    Shape: ONE global range sort with the O(blocks) offset-map row number
    (ranks.global_row_number), a map-only ntile assignment computed from
    the global rank (pure integer arithmetic — no second pass), and one
    algebraic grouped_agg whose key space is bounded by k."""
    from .groupagg import grouped_agg
    from .ranks import global_row_number
    from .windows import _prep_events

    empty = pa.table({
        "bucket": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
        "min_e6": pa.array([], pa.int64()),
        "max_e6": pa.array([], pa.int64()),
    })
    prepped, _cols = _prep_events(events, ("event_id", "value_e6"))
    prepped = prepped.materialize()
    n_total = prepped.count()
    if n_total == 0:
        return rd.from_arrow(empty)
    q, r = divmod(n_total, int(k))
    cut = (q + 1) * r
    q_safe = max(q, 1)  # q == 0 (n < k) puts every row below `cut`

    rn = global_row_number(prepped, ["value_e6", "event_id"], out_col="rn")

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        r0 = b["rn"].to_numpy() - 1
        bucket = np.where(
            r0 < cut, r0 // (q + 1), r + (r0 - cut) // q_safe
        ) + 1
        return pd.DataFrame(
            {
                "bucket": pd.array(bucket.astype(np.int64), dtype="int64"),
                "value_e6": b["value_e6"].astype("int64"),
            }
        )

    rows = rn.map_batches(assign, batch_format="pandas", batch_size=None)
    return grouped_agg(
        rows, ["bucket"],
        [("value_e6", "count", "n"), ("value_e6", "min", "min_e6"),
         ("value_e6", "max", "max_e6")],
    )


def session_overlap_pairs(events: rd.Dataset, gap_sec: int = 1800,
                          bucket_sec: int = 3600,
                          min_events: int = 2) -> rd.Dataset:
    """Interval-overlap self-join of the session table — concurrent-user
    analysis: for every user pair (user_a < user_b) with at least one pair
    of time-overlapping sessions, the count of overlapping session pairs.
    The interval×interval join primitive (ev_range_join is point-in-
    interval; this closes the join-shape family).

    Scale shape: each session emits one (bucket) row per `bucket_sec` time
    chunk it spans — overlap ⟹ the two sessions share ≥1 chunk, so recall
    is exactly 1 — and candidates ride the SAME guarded `_bucket_pairs`
    sorted-run machinery as the dedup family (MAX_BUCKET skew guard = the
    concurrency bound made loud), then `_verified_pairs` attaches each
    candidate session's (start, end) payload on the sorted exchange and
    keeps exact overlaps (closed intervals: s1 ≤ e2 ∧ s2 ≤ e1).  The final
    user-pair roll-up is one algebraic grouped count.  Session identity
    packs (user_id << 20 | session_idx): user ids must fit 43 bits and a
    user's session count 20 (asserted).

    Only sessions with ≥ min_events events qualify (the ev_range_join
    precedent): singleton "sessions" are isolated events, not concurrent
    activity, and at dense corpora they dominate the session table —
    keeping them makes the per-bucket pair expansion quadratic in RAW
    event concurrency instead of genuine-session concurrency."""
    import ray

    from .dedupe import _ATTACH_SCHEMA, _bucket_pairs, _verified_pairs
    from .windows import sessionize

    bucket_us = bucket_sec * 1_000_000
    sessions = (
        sessionize(events, gap_sec=gap_sec)
        .filter(expr=f"n_events >= {int(min_events)}")
        .materialize()
    )

    def pack(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy().astype(np.int64)
        s = b["session_idx"].to_numpy().astype(np.int64)
        assert (u < (1 << 43)).all() and (s < (1 << 20)).all(), \
            "session_overlap_pairs: id packing overflow"
        return pd.DataFrame({
            "sid": pd.array((u << 20) | s, dtype="int64"),
            "start_us": b["start_us"].astype("int64"),
            "end_us": b["end_us"].astype("int64"),
        })

    packed = sessions.map_batches(pack, batch_format="pandas",
                                  batch_size=None).materialize()

    def buckets(b: pd.DataFrame) -> pd.DataFrame:
        s = b["start_us"].to_numpy() // bucket_us
        e = b["end_us"].to_numpy() // bucket_us
        counts = (e - s + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b)), counts)
        offs = (
            np.concatenate([np.arange(c) for c in counts])
            if len(counts) else np.array([], dtype=np.int64)
        )
        return pd.DataFrame({
            "band_id": pd.array(np.zeros(len(idx), dtype=np.int32), dtype="int32"),
            "band_hash": pd.array(s[idx] + offs, dtype="int64"),
            "doc_id": pd.array(b["sid"].to_numpy()[idx], dtype="int64"),
        })

    cands = _bucket_pairs(
        packed.map_batches(buckets, batch_format="pandas", batch_size=None),
        distinct_pairs=True,
    )

    def rows_factory(id_ref):
        def span_rows(batch: pd.DataFrame) -> pa.Table:
            cand = ray.get(id_ref)
            ids = batch["sid"].to_numpy().astype(np.int64)
            pos = np.searchsorted(cand, ids)
            pos[pos >= len(cand)] = 0
            sub = batch[cand[pos] == ids]
            spans = [[int(a), int(b)]
                     for a, b in zip(sub["start_us"], sub["end_us"])]
            return pa.table(
                {
                    "key": pa.array(sub["sid"].to_numpy().astype(np.int64), pa.int64()),
                    "doc_a": pa.array(np.full(len(sub), -1, dtype=np.int64), pa.int64()),
                    "doc_b": pa.array(np.full(len(sub), -1, dtype=np.int64), pa.int64()),
                    "shingles": pa.array(spans, pa.list_(pa.int64())),
                },
                schema=_ATTACH_SCHEMA,
            )

        return span_rows

    verified = _verified_pairs(packed, cands, rows_factory, 1.0,
                               _overlap_score, "ov", out_a="sid_a",
                               out_b="sid_b")

    def to_users(t: pa.Table) -> pd.DataFrame:
        sa = t["sid_a"].to_numpy(zero_copy_only=False).astype(np.int64) >> 20
        sb = t["sid_b"].to_numpy(zero_copy_only=False).astype(np.int64) >> 20
        keep = sa != sb
        sa, sb = sa[keep], sb[keep]
        return pd.DataFrame({
            "user_a": pd.array(np.minimum(sa, sb), dtype="int64"),
            "user_b": pd.array(np.maximum(sa, sb), dtype="int64"),
            "one": pd.array(np.ones(len(sa), dtype=np.int64), dtype="int64"),
        })

    return grouped_agg(
        verified.map_batches(to_users, batch_format="pyarrow", batch_size=None),
        ["user_a", "user_b"], [("one", "sum", "n_overlaps")],
    )


def _overlap_score(sa: np.ndarray, sb: np.ndarray) -> float:
    """1.0 iff the two [start, end] closed intervals (2-element int64
    payloads) overlap — integer comparison, no float boundary."""
    if sa.size != 2 or sb.size != 2:
        return 0.0
    return 1.0 if (sa[0] <= sb[1] and sb[0] <= sa[1]) else 0.0
