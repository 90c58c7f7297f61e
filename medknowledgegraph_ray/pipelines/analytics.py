"""Generic analytical operator parity over the provided testdata tables.

These exercise the engine's generic operator surface (grouped aggregation
with partial pre-aggregation, broadcast hash join, grouped top-k, distinct,
filter pushdown at the read) against tables the driver has pre-registered
as DuckDB views — straightforward oracles, no generated data involved.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources import readers
from ..stages.groupagg import rename_after_groupby
from .. import config


def lineitem_agg(sf_dir: str) -> rd.Dataset:
    """Pricing-summary-style grouped aggregate with per-batch partial
    pre-aggregation (the two-phase pattern; only one row per key per block
    crosses the exchange).

    Money columns are converted to scaled int64 PER ROW (cents / 1e-4
    units) before summation, so the sums are exact integers and equality
    with the oracle does not depend on float summation order.  The scaled
    values land on no exact .5 rounding boundary in the testdata (verified),
    so half-even (numpy) vs half-away (DuckDB) cannot diverge."""
    ds = readers.read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        rev_e4 = pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), pa.int64())
        t2 = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "price_c": price_c,
                "rev_e4": rev_e4,
            }
        )
        g = t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_c", "sum"), ("rev_e4", "sum"), ("qty", "count")]
        )
        return rename_after_groupby(
            g, ["l_returnflag", "l_linestatus"],
            ["qty", "price_c", "rev_e4", "qty"], ["sum", "sum", "sum", "count"],
            ["sum_qty", "sum_base_price_c", "sum_revenue_e4", "n_rows"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price_c", alias_name="sum_base_price_c"),
        Sum("sum_revenue_e4", alias_name="sum_revenue_e4"),
        Sum("n_rows", alias_name="n_rows"),
    )

    def finalize(t: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_qty", "sum_base_price_c", "sum_revenue_e4", "n_rows"):
            t[c] = t[c].astype("int64")
        return t

    return merged.map_batches(finalize, batch_format="pandas")


def top_customers(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Global top-k customers by revenue, then a k-key join against customer.

    Scale shape: per-block PARTIAL top-k (each block of the per-customer
    revenue aggregate forwards at most k rows) before the single-block
    final pick, so the funnel carries O(k × blocks), never the full
    customer cardinality; the customer table is only read for the k
    winning keys (predicate pushdown), never gathered to the driver.
    The partial uses the identical total order (revenue desc, custkey asc)
    as the final pick, so restriction-to-k is exact."""
    orders = readers.read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        t2 = pa.table({"o_custkey": t["o_custkey"], "revenue_c": cents})
        g = t2.group_by("o_custkey").aggregate([("revenue_c", "sum")])
        return rename_after_groupby(g, ["o_custkey"], ["revenue_c"], ["sum"], ["revenue_c"])

    per_cust = orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = per_cust.groupby("o_custkey").aggregate(Sum("revenue_c", alias_name="revenue_c"))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["revenue_c"] = df["revenue_c"].astype("int64")
        return df.sort_values(["revenue_c", "o_custkey"], ascending=[False, True],
                              kind="mergesort").head(k)

    top = (
        merged.map_batches(pick, batch_format="pandas", batch_size=None)  # per-block partial
        .repartition(1)
        .map_batches(pick, batch_format="pandas", batch_size=None)
        .to_pandas()  # exactly k rows
    )
    keys = top["o_custkey"].tolist()
    cust_rows = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=pc.field("c_custkey").isin(keys),
    ).take_all()  # ≤ k rows
    cust_map = {r["c_custkey"]: (r["c_name"], r["c_nationkey"]) for r in cust_rows}
    top["c_name"] = top["o_custkey"].map(lambda ck: cust_map.get(ck, ("", -1))[0])
    top["c_nationkey"] = top["o_custkey"].map(lambda ck: cust_map.get(ck, ("", -1))[1]).astype("int32")
    out = top[["o_custkey", "revenue_c", "c_name", "c_nationkey"]].reset_index(drop=True)
    return rd.from_pandas(out)  # k rows


def orders_by_status(sf_dir: str) -> rd.Dataset:
    """Grouped count + min/max over a date column.  Timestamps are emitted
    as integer epoch-microseconds (first_us/last_us) — int64 round-trips
    identically through Ray/pandas and DuckDB where timestamp dtypes may
    not; money as exact integer cents."""
    ds = readers.read_table(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice", "o_orderdate"])

    def prep(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderstatus": t["o_orderstatus"],
                "total_c": np.round(t["o_totalprice"].to_numpy() * 100.0).astype("int64"),
                "date_us": t["o_orderdate"].astype("int64"),
            }
        )

    out = ds.map_batches(prep, batch_format="pandas").groupby("o_orderstatus").aggregate(
        Count(alias_name="n_orders"),
        Sum("total_c", alias_name="total_c"),
        Min("date_us", alias_name="first_us"),
        Max("date_us", alias_name="last_us"),
    )

    def finalize(t: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_orders", "total_c", "first_us", "last_us"):
            t[c] = t[c].astype("int64")
        return t

    return out.map_batches(finalize, batch_format="pandas")


def filter_pushdown_scan(sf_dir: str) -> rd.Dataset:
    """Predicate + projection pushed into the parquet read (row-group
    pruning): high-value open orders only."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == "O") & (pc.field("o_totalprice") > 200000.0),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice_c": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def nation_region_counts(sf_dir: str) -> rd.Dataset:
    """Two-level broadcast join (nation → region) + grouped count of
    customers per region name."""
    nation = {r["n_nationkey"]: r["n_regionkey"] for r in readers.read_table(sf_dir, "nation").take_all()}
    region = {r["r_regionkey"]: r["r_name"] for r in readers.read_table(sf_dir, "region").take_all()}
    cust = readers.read_table(sf_dir, "customer", columns=["c_nationkey"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        t["r_name"] = t["c_nationkey"].map(lambda nk: region[nation[nk]])
        g = t.groupby("r_name").size().reset_index(name="n_customers")
        return g

    partials = cust.map_batches(partial, batch_format="pandas")
    out = partials.groupby("r_name").aggregate(Sum("n_customers", alias_name="n_customers"))
    return out.map_batches(
        lambda t: t.assign(n_customers=t["n_customers"].astype("int64")), batch_format="pandas"
    )


def lineitem_rollup(sf_dir: str) -> "pd.DataFrame":
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): all three aggregation
    levels, with 'ALL' marking rolled-up dimensions.

    Only the finest level touches the corpus (lineitem_agg's two-phase
    partial exchange); the coarser levels are re-aggregated from that
    result, whose cardinality is bounded by |flag| x |status| — a few rows,
    so the funnel is key-bounded, not corpus-bounded."""
    fin = lineitem_agg(sf_dir).to_pandas()
    vals = ["sum_qty", "sum_base_price_c", "sum_revenue_e4", "n_rows"]
    lvl1 = fin.groupby("l_returnflag", as_index=False)[vals].sum()
    lvl1.insert(1, "l_linestatus", "ALL")
    lvl0 = fin[vals].sum().to_frame().T
    lvl0.insert(0, "l_returnflag", "ALL")
    lvl0.insert(1, "l_linestatus", "ALL")
    out = pd.concat([fin, lvl1, lvl0], ignore_index=True)
    for c in vals:
        out[c] = out[c].astype("int64")
    return out


def lineitem_cube(sf_dir: str) -> "pd.DataFrame":
    """GROUP BY CUBE(l_returnflag, l_linestatus): all FOUR aggregation
    levels (rollup's three plus the status-only marginal).  Same key-bounded
    funnel as lineitem_rollup — only the finest level touches the corpus."""
    fin = lineitem_agg(sf_dir).to_pandas()
    vals = ["sum_qty", "sum_base_price_c", "sum_revenue_e4", "n_rows"]
    by_flag = fin.groupby("l_returnflag", as_index=False)[vals].sum()
    by_flag.insert(1, "l_linestatus", "ALL")
    by_status = fin.groupby("l_linestatus", as_index=False)[vals].sum()
    by_status.insert(0, "l_returnflag", "ALL")
    total = fin[vals].sum().to_frame().T
    total.insert(0, "l_returnflag", "ALL")
    total.insert(1, "l_linestatus", "ALL")
    out = pd.concat([fin, by_flag, by_status, total], ignore_index=True)
    for c in vals:
        out[c] = out[c].astype("int64")
    return out


def lineitem_grouping_sets(sf_dir: str) -> "pd.DataFrame":
    """GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)): the two
    single-dimension marginals WITHOUT the finest level or grand total —
    the arbitrary-set member of the rollup/cube family.  Same key-bounded
    funnel: one corpus pass (lineitem_agg), marginals re-aggregated from
    its few rows."""
    fin = lineitem_agg(sf_dir).to_pandas()
    vals = ["sum_qty", "sum_base_price_c", "sum_revenue_e4", "n_rows"]
    by_flag = fin.groupby("l_returnflag", as_index=False)[vals].sum()
    by_flag.insert(1, "l_linestatus", "ALL")
    by_status = fin.groupby("l_linestatus", as_index=False)[vals].sum()
    by_status.insert(0, "l_returnflag", "ALL")
    out = pd.concat([by_flag, by_status], ignore_index=True)
    for c in vals:
        out[c] = out[c].astype("int64")
    return out


def per_customer_order_totals(sf_dir: str) -> rd.Dataset:
    """Per-customer order revenue (exact cents) and order count — the fact
    table pre-aggregated on the partial exchange (corpus → |customers|
    rows).  The shared build side of revenue_by_region and
    customer_order_profile."""
    from ..stages.groupagg import grouped_agg

    orders = readers.read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        return pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "revenue_c": cents,
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    return grouped_agg(
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None),
        ["c_custkey"],
        [("revenue_c", "sum", "revenue_c"), ("one", "sum", "n_orders")],
    )


def customer_order_profile(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER equi-join: every customer keeps a row; order-less
    customers take 0 counts (stages/join.py how="left" on the sorted
    exchange, neither side broadcast)."""
    from ..stages.join import equi_join

    cust = readers.read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    joined = equi_join(
        per_customer_order_totals(sf_dir), cust, "c_custkey",
        ["revenue_c", "n_orders"], ["c_name"], how="left",
    )

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].astype("int64"),
                "c_name": b["c_name"],
                "n_orders": b["n_orders"].fillna(0).astype("int64"),
                "total_c": b["revenue_c"].fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(fill, batch_format="pandas")


def revenue_by_region(sf_dir: str) -> rd.Dataset:
    """Star-schema fact aggregation through a dimension chain: total order
    revenue (exact cents) and order count per REGION —
    orders ⋈ customer ⋈ nation ⋈ region, GROUP BY region.

    Composition of the engine's join strategies by side size: the fact
    table pre-aggregates per customer (per_customer_order_totals), the
    customer dimension joins DISTRIBUTED via the sorted-merge equi-join
    (neither side broadcast — at production scale customer is itself
    corpus-sized), and the tiny nation/region dims broadcast as dicts.
    Final region roll-up is key-bounded."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    cust = readers.read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = equi_join(
        per_customer_order_totals(sf_dir), cust, "c_custkey",
        ["revenue_c", "n_orders"], ["c_nationkey"],
    )
    nation = {r["n_nationkey"]: r["n_regionkey"]
              for r in readers.read_table(sf_dir, "nation").take_all()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in readers.read_table(sf_dir, "region").take_all()}

    def to_region(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "r_name": b["c_nationkey"].map(lambda nk: region[nation[nk]]),
                "revenue_c": b["revenue_c"].astype("int64"),
                "n_orders": b["n_orders"].astype("int64"),
            }
        )

    return grouped_agg(
        joined.map_batches(to_region, batch_format="pandas", batch_size=None),
        ["r_name"],
        [("revenue_c", "sum", "revenue_c"), ("n_orders", "sum", "n_orders")],
    )


# small-side gate for gathering the filtered build keys driver-side; past
# it the bloom build itself must distribute (per-block partial bit arrays
# OR-merged driver-side — each partial is the same 128 KiB)
BLOOM_BUILD_MAX = 2_000_000


def segment_orders_bloom(sf_dir: str, segment: str = "BUILDING") -> rd.Dataset:
    """Order count + exact revenue cents per order status, restricted to
    customers of one market segment — the selective-dimension join shape
    where a Bloom pre-filter (stages/bloom.py) prunes the fact-table
    exchange: non-matching orders die at the scan, the exact sorted-merge
    join then drops the filter's few false positives, so the result is
    bit-identical to the unfiltered join at a fraction of the exchanged
    volume."""
    from ..stages import bloom
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    cust = readers.read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).filter(expr=f"c_mktsegment == '{segment}'")

    def ckey(t: pa.Table) -> pa.Table:
        return pa.table({"custkey": pc.cast(t["c_custkey"], pa.int64())})

    cust = cust.map_batches(ckey, batch_format="pyarrow", batch_size=None).materialize()
    # bounded single gather: limit(+1) caps driver memory even when the
    # gate trips, and avoids a separate count() execution of the filter
    capped = cust.limit(BLOOM_BUILD_MAX + 1).to_pandas()
    if len(capped) > BLOOM_BUILD_MAX:
        raise NotImplementedError(
            f"bloom build side exceeds {BLOOM_BUILD_MAX} rows: gather "
            "per-block partial bit arrays and OR-merge instead of a "
            "driver-side id gather"
        )
    build_ids = capped["custkey"].to_numpy()

    orders = readers.read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderstatus", "o_totalprice"]
    )

    def okey(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
                    pa.int64(),
                ),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    probe = bloom.bloom_prefilter(
        orders.map_batches(okey, batch_format="pyarrow", batch_size=None),
        "custkey", build_ids,
    )
    joined = equi_join(cust, probe, "custkey", [], ["o_orderstatus", "price_c", "one"])
    return grouped_agg(
        joined, ["o_orderstatus"],
        [("one", "sum", "n_orders"), ("price_c", "sum", "total_cents")],
    )


def promo_revenue_ratio(sf_dir: str) -> rd.Dataset:
    """Promotion revenue share (TPC-H Q14 shape): lineitem ⋈ part on
    partkey, revenue split by whether the part is a PROMO type, one output
    row (promo_rev_e4, total_rev_e4, promo_ratio).

    EXACT: revenue per line is cents × (100 − discount%) — int64 at e-4
    dollar scale on both sides — so the two sums are integer-exact and the
    ratio is one float64 division, identical op order to the oracle.  The
    part dimension joins DISTRIBUTED (build side unique on p_partkey, no
    broadcast: at production scale part is itself large); the single-row
    roll-up reduces per-block partials, never the corpus."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    part = readers.read_table(sf_dir, "part", columns=["p_partkey", "p_type"])

    def pkey(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "partkey": pc.cast(t["p_partkey"], pa.int64()),
                "promo": pc.cast(pc.equal(t["p_type"], pa.scalar("PROMO")), pa.int64()),
            }
        )

    li = readers.read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    )

    def lkey(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))), pa.int64()
        )
        disc = pc.cast(
            pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table(
            {
                "partkey": pc.cast(t["l_partkey"], pa.int64()),
                "rev_e4": pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), disc)),
            }
        )

    joined = equi_join(
        part.map_batches(pkey, batch_format="pyarrow", batch_size=None),
        li.map_batches(lkey, batch_format="pyarrow", batch_size=None),
        "partkey", ["promo"], ["rev_e4"],
    )

    def split(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "promo_rev_e4": pc.multiply(t["rev_e4"], t["promo"]),
                "rev_e4": t["rev_e4"],
            }
        )

    agg = grouped_agg(
        joined.map_batches(split, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("promo_rev_e4", "sum", "promo_rev_e4"), ("rev_e4", "sum", "total_rev_e4")],
    ).to_pandas()
    promo = agg["promo_rev_e4"].astype("int64")
    total = agg["total_rev_e4"].astype("int64")
    ratio = np.round(promo.to_numpy().astype(np.float64)
                     / total.to_numpy().astype(np.float64), 6)
    return pd.DataFrame(
        {
            "promo_rev_e4": promo,
            "total_rev_e4": total,
            "promo_ratio": pd.array(ratio, dtype="float64"),
        }
    )


# dimension tables within this many rows broadcast as sorted numpy arrays
# (ray.put once, searchsorted per batch — same gate scale as
# tfidf.VOCAB_BROADCAST_MAX); larger dims ride the sorted-exchange
# equi-join so nothing corpus-sized ever lands on one worker
DIM_BROADCAST_MAX = config.gate(2_000_000)


def _attach_dim(
    probe: rd.Dataset,
    dim: rd.Dataset,
    key: str,
    val_cols: list[str],
    probe_cols: list[str],
    force: str | None = None,
) -> rd.Dataset:
    """Attach `val_cols` from a unique-keyed int64 dimension to every probe
    row (FK integrity required: a probe key missing from the dim raises on
    the broadcast path and is dropped by the join path, so callers must
    hold the reference's complete-FK contract).  Output columns:
    [key] + probe_cols + val_cols, all preserved dtypes."""
    import ray

    from ..stages.join import equi_join

    mode = force or ("broadcast" if dim.count() <= DIM_BROADCAST_MAX else "join")
    if mode == "join":
        j = equi_join(dim, probe, key, val_cols, probe_cols)
        return j.map_batches(
            lambda t: t.select([key] + probe_cols + val_cols),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    # empty blocks can carry a divergent (pre-map) schema — drop them
    # before the concat; they add no keys
    tabs = [t for t in ray.get(dim.to_arrow_refs()) if t.num_rows > 0]
    if not tabs:
        raise ValueError(f"_attach_dim: dimension on {key} is empty")
    tab = pa.concat_tables(tabs).combine_chunks()
    keys = tab[key].to_numpy()
    order = np.argsort(keys, kind="stable")
    ref = ray.put(
        (keys[order], {c: tab[c].to_numpy()[order] for c in val_cols})
    )

    def attach(t: pa.Table) -> pa.Table:
        skeys, vals = ray.get(ref)
        pk = t[key].to_numpy()
        idx = np.searchsorted(skeys, pk)
        ok = (idx < len(skeys)) & (skeys[np.minimum(idx, len(skeys) - 1)] == pk)
        if not ok.all():
            missing = pk[~ok][:5]
            raise ValueError(f"_attach_dim: probe keys missing from dim {key}: {missing}")
        out = {key: t[key]}
        for c in probe_cols:
            out[c] = t[c]
        for c in val_cols:
            out[c] = pa.array(vals[c][idx])
        return pa.table(out)

    return probe.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def order_count_distribution(sf_dir: str, status: str = "O") -> rd.Dataset:
    """Customer distribution by order count (TPC-H Q13 shape): how many
    customers placed exactly k orders of the given status — INCLUDING the
    zero-order bucket, i.e. LEFT-join semantics without materializing the
    left join.

    Scale shape: the per-customer counts stay distributed (grouped_agg,
    corpus → |customers| rows); only the counts-of-counts histogram — whose
    cardinality is bounded by the max per-customer order count — is
    gathered, and the zero bucket falls out arithmetically:
    |customer| − |customers with ≥1 matching order| (both O(1) driver
    scalars), so no customer row ever reaches the driver."""
    from ..stages.groupagg import grouped_agg

    orders = readers.read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar(status)))
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    counts = grouped_agg(
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None),
        ["o_custkey"], [("one", "sum", "c_count")],
        types={"o_custkey": pa.int64(), "one": pa.int64()},
    )

    def to_hist(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": t["c_count"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    dist = grouped_agg(
        counts.map_batches(to_hist, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None),
        ["c_count"], [("one", "sum", "custdist")],
        types={"c_count": pa.int64(), "one": pa.int64()},
    ).to_pandas()  # counts-of-counts: ≤ max-orders-per-customer rows
    n_total = readers.read_table(sf_dir, "customer", columns=["c_custkey"]).count()
    zero = n_total - int(dist["custdist"].sum())
    if zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    dist["c_count"] = dist["c_count"].astype("int64")
    dist["custdist"] = dist["custdist"].astype("int64")
    dist = dist.sort_values(["custdist", "c_count"], ascending=[False, False],
                            kind="mergesort").reset_index(drop=True)
    return rd.from_pandas(dist)


def large_quantity_orders(sf_dir: str, threshold: int = 300) -> rd.Dataset:
    """Large-volume orders (TPC-H Q18 shape): orders whose total lineitem
    quantity exceeds `threshold`, joined back to orders and customer for
    the report row, top-100 by order value.

    Scale shape: GROUP BY + HAVING on the fact table first (grouped_agg,
    corpus → |orders| → tiny hot set), then the hot set is the UNIQUE-keyed
    build side of two sorted-merge equi-joins — orders, then customer —
    so neither full table is ever broadcast or gathered; the final sort is
    over the hot rows only."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    li = readers.read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }
        )

    sums = grouped_agg(
        li.map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["o_orderkey"], [("qty", "sum", "sum_qty")],
        types={"o_orderkey": pa.int64(), "qty": pa.int64()},
    )
    hot = sums.filter(expr=f"sum_qty > {int(threshold)}")

    orders = readers.read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "odate_us": pc.cast(t["o_orderdate"], pa.int64()),
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )

    j1 = equi_join(
        hot, orders.map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey", ["sum_qty"], ["c_custkey", "odate_us", "price_c"],
        types={"o_orderkey": pa.int64(), "sum_qty": pa.int64(),
               "c_custkey": pa.int64(), "odate_us": pa.int64(),
               "price_c": pa.int64()},
    )
    cust = readers.read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def c_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"c_custkey": pc.cast(t["c_custkey"], pa.int64()), "c_name": t["c_name"]}
        )

    j2 = equi_join(
        cust.map_batches(c_prep, batch_format="pyarrow", zero_copy_batch=True),
        j1, "c_custkey", ["c_name"],
        ["o_orderkey", "odate_us", "price_c", "sum_qty"],
        types={"c_custkey": pa.int64(), "c_name": pa.string(),
               "o_orderkey": pa.int64(), "odate_us": pa.int64(),
               "price_c": pa.int64(), "sum_qty": pa.int64()},
    )
    return j2.sort(["price_c", "o_orderkey"], descending=[True, False]).limit(100)


def dormant_rich_customers(sf_dir: str, cutoff: str = "2000-07-01") -> rd.Dataset:
    """Above-average-balance customers with no recent orders, rolled up per
    nation (TPC-H Q22 shape: scalar subquery + NOT EXISTS + GROUP BY).

    Exactness: the mean comparison is the integer cross-multiplication
    acctbal_c · n_pos > sum_c (no float average, so no boundary-row ULP
    divergence vs the oracle).  Scale shape: the positive-balance total is
    a per-block partial reduce (O(blocks) driver rows); the NOT EXISTS is
    the payload-carrying sorted-exchange anti-join (stages/setops.
    anti_join_cols — the recent-orders side is a corpus fraction, never a
    broadcast set); the nation roll-up is key-bounded."""
    from ..stages.groupagg import grouped_agg
    from ..stages.setops import anti_join_cols

    cust = readers.read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def c_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                "acctbal_c": pc.cast(
                    pc.round(pc.multiply(t["c_acctbal"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    cb = cust.map_batches(c_prep, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)

    def pos_partial(t: pa.Table) -> pa.Table:
        bal = t["acctbal_c"].to_numpy()
        pos = bal[bal > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    parts = cb.map_batches(pos_partial, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None).take_all()  # O(blocks) rows
    sum_c = sum(r["s"] for r in parts)
    n_pos = sum(r["n"] for r in parts)

    def rich_filter(t: pa.Table) -> pa.Table:
        mask = pc.greater(
            pc.multiply(t["acctbal_c"], pa.scalar(n_pos, pa.int64())),
            pa.scalar(sum_c, pa.int64()),
        )
        return t.filter(mask)

    rich = cb.map_batches(rich_filter, batch_format="pyarrow", zero_copy_batch=True)

    cut = pd.Timestamp(cutoff).to_pydatetime()
    orders = readers.read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def recent(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(cut)))
        return pa.table({"c_custkey": pc.cast(t["o_custkey"], pa.int64())})

    recent_keys = orders.map_batches(recent, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)
    surv = anti_join_cols(
        rich, recent_keys, key="c_custkey",
        cols=["c_nationkey", "acctbal_c"],
        dtypes={"c_nationkey": "int64", "acctbal_c": "int64"},
    )

    def to_agg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": b["c_nationkey"].astype("int64"),
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
                "acctbal_c": b["acctbal_c"].astype("int64"),
            }
        )

    return grouped_agg(
        surv.map_batches(to_agg, batch_format="pandas", batch_size=None),
        ["c_nationkey"],
        [("one", "sum", "numcust"), ("acctbal_c", "sum", "totacctbal_c")],
        types={"c_nationkey": pa.int64(), "one": pa.int64(),
               "acctbal_c": pa.int64()},
    ).sort("c_nationkey")


def nation_volume(sf_dir: str, force_dim: str | None = None) -> rd.Dataset:
    """Cross-nation shipping volume (TPC-H Q7 shape): revenue between
    supplier nation and customer nation per order year, over
    lineitem ⋈ orders ⋈ supplier ⋈ customer ⋈ nation².

    Join strategy by side size: orders joins DISTRIBUTED (unique-keyed
    build of the sorted-merge equi-join — it is fact-sized); supplier and
    customer attach via the size-gated dim attach (_attach_dim: broadcast
    sorted arrays under DIM_BROADCAST_MAX, sorted-exchange join above);
    the 25-row nation name map is a driver dict on the final key-bounded
    aggregate.  Revenue is exact integer 1e-4 units per row (the
    agg_lineitem scaling), summed associatively."""
    from ..stages.groupagg import grouped_agg

    j3 = _li_with_nations(sf_dir, force_dim)

    def cross_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["s_nat"], t["c_nat"]))

    agg = grouped_agg(
        j3.map_batches(cross_only, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["s_nat", "c_nat", "o_year"], [("rev_e4", "sum", "revenue_e4")],
        types={"s_nat": pa.int64(), "c_nat": pa.int64(), "o_year": pa.int64(),
               "rev_e4": pa.int64()},
    )
    names = {int(r["n_nationkey"]): r["n_name"]
             for r in readers.read_table(sf_dir, "nation").take_all()}  # 25 rows

    def name_up(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "supp_nation": b["s_nat"].map(names),
                "cust_nation": b["c_nat"].map(names),
                "l_year": b["o_year"].astype("int64"),
                "revenue_e4": b["revenue_e4"].astype("int64"),
            }
        )

    return agg.map_batches(name_up, batch_format="pandas", batch_size=None).sort(
        ["supp_nation", "cust_nation", "l_year"]
    )


def local_supply_volume(sf_dir: str, force_dim: str | None = None) -> rd.Dataset:
    """Locally supplied revenue per region and order year (TPC-H Q5
    shape: the same five-table join chain as nation_volume, restricted to
    lineitems whose supplier and customer share a nation, rolled up
    through the nation → region dimension).

    The heavy work is identical to nation_volume (shared
    _li_with_nations); the region roll-up happens AFTER the key-bounded
    (nation, year) aggregate — ≤ |nations|·|years| rows reach the driver,
    where the 25-row nation → region map applies."""
    from ..stages.groupagg import grouped_agg

    j3 = _li_with_nations(sf_dir, force_dim)

    def local_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["s_nat"], t["c_nat"]))

    agg = grouped_agg(
        j3.map_batches(local_only, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["c_nat", "o_year"], [("rev_e4", "sum", "revenue_e4")],
        types={"c_nat": pa.int64(), "o_year": pa.int64(), "rev_e4": pa.int64()},
    ).to_pandas()  # ≤ |nations| × |years| rows
    nat2reg = {int(r["n_nationkey"]): int(r["n_regionkey"])
               for r in readers.read_table(sf_dir, "nation").take_all()}
    reg = {int(r["r_regionkey"]): r["r_name"]
           for r in readers.read_table(sf_dir, "region").take_all()}
    agg["r_name"] = agg["c_nat"].map(lambda nk: reg[nat2reg[nk]])
    out = (
        agg.groupby(["r_name", "o_year"], as_index=False)["revenue_e4"].sum()
        .sort_values(["r_name", "o_year"], kind="mergesort")
        .reset_index(drop=True)
    )
    out["o_year"] = out["o_year"].astype("int64")
    out["revenue_e4"] = out["revenue_e4"].astype("int64")
    return rd.from_pandas(out[["r_name", "o_year", "revenue_e4"]])


def _li_with_nations(sf_dir: str, force_dim: str | None = None) -> rd.Dataset:
    """Shared join chain of nation_volume / local_supply_volume:
    lineitem ⋈ orders (sorted-merge) with supplier- and customer-nation
    keys attached (size-gated dim attach) →
    (o_orderkey, o_year, rev_e4, s_nat, c_nat)."""
    from ..stages.join import equi_join

    li = readers.read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev_e4": pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), pa.int64()),
            }
        )

    orders = readers.read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    j1 = equi_join(
        orders.map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        li.map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey", ["c_custkey", "o_year"], ["s_suppkey", "rev_e4"],
    )

    supp = readers.read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = supp.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_nat": pc.cast(t["s_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j2 = _attach_dim(j1, supp, "s_suppkey", ["s_nat"],
                     ["c_custkey", "o_year", "rev_e4"], force=force_dim)

    cust = readers.read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_nat": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return _attach_dim(j2, cust, "c_custkey", ["c_nat"],
                       ["o_year", "rev_e4", "s_nat"], force=force_dim)


def shipping_priority(
    sf_dir: str, segment: str = "BUILDING", date: str = "1998-03-15", k: int = 10
) -> rd.Dataset:
    """Unshipped high-revenue orders (TPC-H Q3 shape): revenue of lineitems
    shipped after `date` for orders placed before it by customers in
    `segment`, top-k orders by revenue.

    Scale shape: all three filters ride the scan; the segment restriction
    is a sorted-merge semi-join via equi_join with no carried columns
    (customer is corpus-sized — never a broadcast key set); the order
    restriction is a second equi_join whose unique-keyed build is the
    filtered orders; revenue aggregates per order on the partial exchange;
    the final top-k is the restriction-exact partial-top-k funnel."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join
    from ..stages.skew import partial_topk_pandas

    cut = pd.Timestamp(date).to_pydatetime()
    cust = readers.read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def c_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], pa.scalar(segment)))
        return pa.table({"c_custkey": pc.cast(t["c_custkey"], pa.int64())})

    orders = readers.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))
        return pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "odate_us": pc.cast(t["o_orderdate"], pa.int64()),
            }
        )

    seg_orders = equi_join(
        cust.map_batches(c_prep, batch_format="pyarrow", zero_copy_batch=True),
        orders.map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        "c_custkey", [], ["o_orderkey", "odate_us"],
        types={"c_custkey": pa.int64(), "o_orderkey": pa.int64(),
               "odate_us": pa.int64()},
    )

    li = readers.read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "rev_e4": pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), pa.int64()),
            }
        )

    j = equi_join(
        seg_orders.map_batches(
            lambda t: t.select(["o_orderkey", "odate_us"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        li.map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey", ["odate_us"], ["rev_e4"],
        types={"o_orderkey": pa.int64(), "odate_us": pa.int64(),
               "rev_e4": pa.int64()},
    )
    per_order = grouped_agg(
        j, ["o_orderkey", "odate_us"], [("rev_e4", "sum", "revenue_e4")],
        types={"o_orderkey": pa.int64(), "odate_us": pa.int64(),
               "rev_e4": pa.int64()},
    )

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["revenue_e4", "o_orderkey"], ascending=[False, True],
                             kind="mergesort").head(k)

    out = partial_topk_pandas(per_order, pick)
    for c in ("o_orderkey", "odate_us", "revenue_e4"):
        out[c] = out[c].astype("int64")
    return rd.from_pandas(out[["o_orderkey", "odate_us", "revenue_e4"]])


def returned_item_customers(
    sf_dir: str, start: str = "1997-10-01", end: str = "1998-01-01", k: int = 20
) -> rd.Dataset:
    """Top-k customers by revenue lost to returned items in a quarter
    (TPC-H Q10 shape): lineitems flagged 'R' of orders placed in
    [start, end), rolled up per customer, joined to the customer/nation
    dimensions for the report row.

    Scale shape: quarter + returnflag filters ride the scans; the
    order→lineitem restriction is a sorted-merge equi-join (unique-keyed
    filtered orders build); per-customer revenue aggregates on the partial
    exchange; the top-k funnel is restriction-exact; only the k winning
    customers are read back (predicate-pushdown point lookup) and the
    25-row nation map is a driver dict."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join
    from ..stages.skew import partial_topk_pandas

    lo = pd.Timestamp(start).to_pydatetime()
    hi = pd.Timestamp(end).to_pydatetime()
    orders = readers.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def o_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)),
        )
        t = t.filter(m)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
            }
        )

    li = readers.read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "rev_e4": pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), pa.int64()),
            }
        )

    j = equi_join(
        orders.map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        li.map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey", ["c_custkey"], ["rev_e4"],
        types={"o_orderkey": pa.int64(), "c_custkey": pa.int64(),
               "rev_e4": pa.int64()},
    )
    per_cust = grouped_agg(
        j.map_batches(
            lambda t: t.select(["c_custkey", "rev_e4"]),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        ),
        ["c_custkey"], [("rev_e4", "sum", "revenue_e4")],
        types={"c_custkey": pa.int64(), "rev_e4": pa.int64()},
    )

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["revenue_e4", "c_custkey"], ascending=[False, True],
                             kind="mergesort").head(k)

    top = partial_topk_pandas(per_cust, pick)
    keys = [int(x) for x in top["c_custkey"]]
    cust_rows = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filter=pc.field("c_custkey").isin(keys),
    ).take_all()  # ≤ k rows
    cmap = {int(r["c_custkey"]): r for r in cust_rows}
    names = {int(r["n_nationkey"]): r["n_name"]
             for r in readers.read_table(sf_dir, "nation").take_all()}  # 25 rows
    top["c_name"] = [cmap[ck]["c_name"] for ck in keys]
    top["acctbal_c"] = pd.array(
        [int(round(cmap[ck]["c_acctbal"] * 100)) for ck in keys], dtype="int64"
    )
    top["n_name"] = [names[int(cmap[ck]["c_nationkey"])] for ck in keys]
    top["c_custkey"] = top["c_custkey"].astype("int64")
    top["revenue_e4"] = top["revenue_e4"].astype("int64")
    return rd.from_pandas(
        top[["c_custkey", "c_name", "acctbal_c", "n_name", "revenue_e4"]]
    )


def market_share(
    sf_dir: str, region: str = "AMERICA", supp_nation: int = 20,
    force_dim: str | None = None,
) -> rd.Dataset:
    """National market share (TPC-H Q8 shape): the fraction of revenue to
    `region`'s customers supplied by nation `supp_nation`, per order year.

    Same shared join chain (_li_with_nations); the region restriction
    applies via the 25-row nation → region driver map inside the scan
    pass, the conditional numerator is a masked per-row column, and both
    sums ride one key-bounded grouped_agg.  The share itself is ONE
    float64 division of the two bit-identical int64 sums — oracle-exact
    (the join_promo_ratio precedent)."""
    from ..stages.groupagg import grouped_agg

    j3 = _li_with_nations(sf_dir, force_dim)
    nat2reg = {int(r["n_nationkey"]): int(r["n_regionkey"])
               for r in readers.read_table(sf_dir, "nation").take_all()}
    reg_ids = {int(r["r_regionkey"]) for r in
               readers.read_table(sf_dir, "region").take_all()
               if r["r_name"] == region}
    keep_nats = [n for n, rg in nat2reg.items() if rg in reg_ids]

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["c_nat"], value_set=pa.array(keep_nats, pa.int64())))
        num = pc.if_else(
            pc.equal(t["s_nat"], pa.scalar(int(supp_nation), pa.int64())),
            t["rev_e4"], pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {"o_year": t["o_year"], "nation_e4": num, "total_e4": t["rev_e4"]}
        )

    agg = grouped_agg(
        j3.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["o_year"],
        [("nation_e4", "sum", "nation_e4"), ("total_e4", "sum", "total_e4")],
        types={"o_year": pa.int64(), "nation_e4": pa.int64(),
               "total_e4": pa.int64()},
    )

    def share(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_year": b["o_year"].astype("int64"),
                "nation_e4": b["nation_e4"].astype("int64"),
                "total_e4": b["total_e4"].astype("int64"),
                "mkt_share": b["nation_e4"].astype("float64").to_numpy()
                / b["total_e4"].astype("float64").to_numpy(),
            }
        )

    return agg.map_batches(share, batch_format="pandas", batch_size=None).sort("o_year")


# (brand, size_lo, size_hi, qty_lo, qty_hi) disjunct groups — the Q19
# predicate shape; shared by the engine and its oracle SQL
Q19_DISJUNCTS = [
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#3", 10, 30, 10, 35),
    ("Brand#5", 20, 50, 20, 50),
]


def disjunctive_revenue(sf_dir: str, force_dim: str | None = None) -> rd.Dataset:
    """Discounted revenue under OR'd predicate groups spanning BOTH join
    sides (TPC-H Q19 shape): each disjunct constrains part attributes
    (brand, size band) AND lineitem attributes (quantity band), so no
    single side's scan filter can decide a row — the canonical case where
    the predicate must evaluate AFTER the join.

    Scale shape: lineitem prunes to 4 columns at the read; the part
    attributes attach via the size-gated dim attach (_attach_dim —
    broadcast sorted arrays under DIM_BROADCAST_MAX, sorted-exchange
    equi-join above); the OR-mask is one vectorized Arrow pass; the global
    sum is a per-block partial reduce (O(blocks) driver rows, no
    exchange).  Output: one row (revenue_e4, n_rows), both int64-exact."""
    li = readers.read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                "rev_e4": pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), pa.int64()),
            }
        )

    part = readers.read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    brands = sorted({b for b, *_ in Q19_DISJUNCTS})

    def p_prep(t: pa.Table) -> pa.Table:
        # brand as a small int code so the broadcast dim stays numeric
        # (codes are positions in the sorted disjunct brand list; -1 =
        # brand outside every disjunct)
        code = pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        for i, b in enumerate(brands):
            code = pc.if_else(pc.equal(t["p_brand"], pa.scalar(b)),
                              pa.scalar(i, pa.int64()), code)
        return pa.table(
            {
                "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                "brand_code": code,
                "p_size": pc.cast(t["p_size"], pa.int64()),
            }
        )

    j = _attach_dim(
        li.map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True),
        part.map_batches(p_prep, batch_format="pyarrow", zero_copy_batch=True),
        "p_partkey", ["brand_code", "p_size"], ["qty", "rev_e4"],
        force=force_dim,
    )

    def disjunct_sum(t: pa.Table) -> pa.Table:
        code = t["brand_code"].to_numpy()
        size = t["p_size"].to_numpy()
        qty = t["qty"].to_numpy()
        rev = t["rev_e4"].to_numpy()
        mask = np.zeros(t.num_rows, dtype=bool)
        for b, slo, shi, qlo, qhi in Q19_DISJUNCTS:
            mask |= (
                (code == brands.index(b))
                & (size >= slo) & (size <= shi)
                & (qty >= qlo) & (qty <= qhi)
            )
        return pa.table(
            {
                "revenue_e4": pa.array([int(rev[mask].sum())], pa.int64()),
                "n_rows": pa.array([int(mask.sum())], pa.int64()),
            }
        )

    parts_rows = j.map_batches(disjunct_sum, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None).take_all()
    out = pd.DataFrame(
        {
            "revenue_e4": pd.array([sum(r["revenue_e4"] for r in parts_rows)], dtype="int64"),
            "n_rows": pd.array([sum(r["n_rows"] for r in parts_rows)], dtype="int64"),
        }
    )
    return rd.from_pandas(out)


def _semi_filter(
    probe: rd.Dataset,
    keys: rd.Dataset,
    key: str,
    probe_cols: list[str],
    force: str | None = None,
) -> rd.Dataset:
    """Keep probe rows whose int64 `key` appears in the unique-keyed `keys`
    dataset — the dimension-predicate semi-join (filter the fact table by a
    filtered dimension's key set).  Size-gated like _attach_dim: a sorted
    key array broadcast under DIM_BROADCAST_MAX, the sorted-merge equi-join
    (build=keys, no build payload) above it."""
    import ray

    from ..stages.join import equi_join

    mode = force or ("broadcast" if keys.count() <= DIM_BROADCAST_MAX else "join")
    if mode == "join":
        return equi_join(keys, probe, key, [], probe_cols)
    arr = np.sort(
        np.concatenate(
            [t[key].to_numpy() for t in ray.get(keys.to_arrow_refs()) if t.num_rows]
            or [np.array([], dtype=np.int64)]
        ).astype(np.int64)
    )
    ref = ray.put(arr)

    def keep(t: pa.Table) -> pa.Table:
        skeys = ray.get(ref)
        pk = t[key].to_numpy().astype(np.int64)
        idx = np.searchsorted(skeys, pk)
        ok = (idx < len(skeys)) & (skeys[np.minimum(idx, len(skeys) - 1)] == pk)
        return t.select([key] + probe_cols).filter(pa.array(ok))

    return probe.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _li_part_filtered(
    sf_dir: str, part_pred, part_cols: list[str], li_cols: list[str], prep,
    probe_cols: list[str], force: str | None = None,
) -> rd.Dataset:
    """lineitem prepped by `prep` (must emit int64 p_partkey plus
    `probe_cols`), restricted to parts passing `part_pred` (an
    Arrow-table → BooleanArray mask over `part_cols`)."""
    part = readers.read_table(sf_dir, "part", columns=["p_partkey"] + part_cols)
    keys = part.map_batches(
        lambda t: pa.table(
            {"p_partkey": pc.cast(t.filter(part_pred(t))["p_partkey"], pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = readers.read_table(sf_dir, "lineitem", columns=li_cols)
    probe = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return _semi_filter(probe, keys, "p_partkey", probe_cols, force=force)


def min_cost_part(sf_dir: str, max_size: int = 5, force_dim: str | None = None) -> rd.Dataset:
    """Cheapest offer per part (TPC-H Q2 shape re-expressed over the
    provided tables): among lineitems for small parts (p_size ≤ max_size),
    the minimum extended price and the supplier offering it (argmin,
    suppkey-asc tiebreak), with supplier name and nation attached.

    Scale shape: dimension-predicate semi-join prunes the fact scan to the
    hot part set; the per-part argmin is ONE keep_first sorted exchange
    (interior runs take row 1; only block-edge parts re-reduce); supplier
    attaches via the size-gated dim attach; the 25-row nation map applies
    driver-side on the key-bounded winners."""
    from ..stages.orderedagg import keep_first

    def pred(t: pa.Table):
        return pc.less_equal(t["p_size"], pa.scalar(max_size))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )

    li = _li_part_filtered(
        sf_dir, pred, ["p_size"], ["l_partkey", "l_suppkey", "l_extendedprice"],
        prep, ["s_suppkey", "price_c"], force=force_dim,
    )
    winners = keep_first(li, "p_partkey", ["price_c", "s_suppkey"])

    supp = readers.read_table(sf_dir, "supplier",
                              columns=["s_suppkey", "s_name", "s_nationkey"])
    supp = supp.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": t["s_name"],
                "s_nat": pc.cast(t["s_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = _attach_dim(winners, supp, "s_suppkey", ["s_name", "s_nat"],
                    ["p_partkey", "price_c"], force=force_dim)
    names = {int(r["n_nationkey"]): r["n_name"]
             for r in readers.read_table(sf_dir, "nation").take_all()}  # 25 rows

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_partkey": b["p_partkey"].astype("int64"),
                "price_c": b["price_c"].astype("int64"),
                "s_suppkey": b["s_suppkey"].astype("int64"),
                "s_name": b["s_name"],
                "n_name": b["s_nat"].map(names),
            }
        )

    return j.map_batches(finish, batch_format="pandas", batch_size=None).sort("p_partkey")


def priority_returns(sf_dir: str, lo: str = "1996-01-01", hi: str = "1996-04-01") -> rd.Dataset:
    """Order-priority count among orders of a quarter that had at least one
    returned lineitem (TPC-H Q4 shape: EXISTS semi-join from the fact
    side, then a key-bounded priority rollup).

    Scale shape: the returned-lineitem side first collapses to DISTINCT
    order keys via the algebraic grouped_agg (corpus → |orders| rows max),
    which then forms the unique-keyed build of ONE sorted-merge inner join
    against the date-windowed orders — the payload-free semi-join; the
    priority rollup is 5-key-bounded."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    li = readers.read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def r_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    rk = grouped_agg(
        li.map_batches(r_keys, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["o_orderkey"], [("one", "count", "n_r")],
        types={"o_orderkey": pa.int64(), "one": pa.int64()},
    )

    orders = readers.read_table(sf_dir, "orders",
                                columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    lo_d, hi_d = np.datetime64(lo), np.datetime64(hi)

    def o_prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        mask = pc.and_(
            pc.greater_equal(d, pa.scalar(lo_d.astype("datetime64[us]"))),
            pc.less(d, pa.scalar(hi_d.astype("datetime64[us]"))),
        )
        t = t.filter(mask)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    j = equi_join(
        rk, orders.map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey", ["n_r"], ["o_orderpriority"],
        types={"o_orderkey": pa.int64(), "n_r": pa.int64(),
               "o_orderpriority": pa.string()},
    )

    def one_col(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    agg = grouped_agg(
        j.map_batches(one_col, batch_format="pyarrow", zero_copy_batch=True,
                      batch_size=None),
        ["o_orderpriority"], [("one", "count", "n_orders")],
        types={"o_orderpriority": pa.string(), "one": pa.int64()},
    )
    return agg.sort("o_orderpriority")


def product_profit(sf_dir: str, token: str = "widget", force_dim: str | None = None) -> rd.Dataset:
    """Profit by supplier nation and order year for one product family
    (TPC-H Q9 shape over the provided tables): amount = revenue −
    0.6·retailprice·qty (p_retailprice stands in for ps_supplycost, which
    the testdata catalog does not carry), for parts whose name contains
    `token`.

    Scale shape: the part predicate prunes the fact scan via the size-gated
    semi-join; the part cost and supplier nation attach via the size-gated
    dim attach; order year arrives through ONE sorted-merge join keyed on
    o_orderkey (orders is fact-sized — never broadcast); the rollup is
    (nation × year)-bounded.  All money flows as exact integer 1e-4 units:
    amount_e4 = rev_e4 − qty·retail_c·60."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    def pred(t: pa.Table):
        return pc.match_substring(t["p_name"], token)

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                "rev_e4": pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), pa.int64()),
            }
        )

    li = _li_part_filtered(
        sf_dir, pred, ["p_name"],
        ["l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
        prep, ["o_orderkey", "s_suppkey", "qty", "rev_e4"], force=force_dim,
    )

    part = readers.read_table(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    part = part.map_batches(
        lambda t: pa.table(
            {
                "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                "retail_c": pc.cast(
                    pc.round(pc.multiply(t["p_retailprice"], pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _attach_dim(li, part, "p_partkey", ["retail_c"],
                     ["o_orderkey", "s_suppkey", "qty", "rev_e4"], force=force_dim)

    supp = readers.read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = supp.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_nat": pc.cast(t["s_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _attach_dim(li, supp, "s_suppkey", ["s_nat"],
                     ["o_orderkey", "qty", "rev_e4", "retail_c"], force=force_dim)

    def amount(t: pa.Table) -> pa.Table:
        cost_e4 = pc.multiply(pc.multiply(t["qty"], t["retail_c"]), pa.scalar(60))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "s_nat": t["s_nat"],
                "amount_e4": pc.subtract(t["rev_e4"], cost_e4),
            }
        )

    li = li.map_batches(amount, batch_format="pyarrow", zero_copy_batch=True)

    orders = readers.read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    j = equi_join(
        orders.map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        li, "o_orderkey", ["o_year"], ["s_nat", "amount_e4"],
        types={"o_orderkey": pa.int64(), "o_year": pa.int64(),
               "s_nat": pa.int64(), "amount_e4": pa.int64()},
    )
    agg = grouped_agg(
        j, ["s_nat", "o_year"], [("amount_e4", "sum", "amount_e4")],
        types={"s_nat": pa.int64(), "o_year": pa.int64(), "amount_e4": pa.int64()},
    )
    names = {int(r["n_nationkey"]): r["n_name"]
             for r in readers.read_table(sf_dir, "nation").take_all()}  # 25 rows

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "nation": b["s_nat"].map(names),
                "o_year": b["o_year"].astype("int64"),
                "amount_e4": b["amount_e4"].astype("int64"),
            }
        )

    return agg.map_batches(finish, batch_format="pandas", batch_size=None).sort(
        ["nation", "o_year"]
    )


def top_revenue_supplier(
    sf_dir: str, lo: str = "1996-01-01", hi: str = "1996-04-01",
    force_dim: str | None = None,
) -> rd.Dataset:
    """Supplier(s) with the maximum quarterly revenue (TPC-H Q15 shape:
    grouped revenue → global MAX → all argmax rows, ties included).

    Scale shape: revenue per supplier is one algebraic grouped_agg
    (supplier-bounded); the global max funnels through per-block partial
    maxima (O(blocks) driver rows, never the full supplier set); the
    winner filter runs distributed and only winner rows attach the
    supplier name."""
    from ..stages.groupagg import grouped_agg

    li = readers.read_table(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo_d, hi_d = np.datetime64(lo), np.datetime64(hi)

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["l_shipdate"], pa.timestamp("us"))
        mask = pc.and_(
            pc.greater_equal(d, pa.scalar(lo_d.astype("datetime64[us]"))),
            pc.less(d, pa.scalar(hi_d.astype("datetime64[us]"))),
        )
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev_e4": pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))), pa.int64()),
            }
        )

    rev = grouped_agg(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["s_suppkey"], [("rev_e4", "sum", "revenue_e4")],
        types={"s_suppkey": pa.int64(), "rev_e4": pa.int64()},
    ).materialize()  # consumed twice: max funnel + winner filter

    def block_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array([pc.max(t["revenue_e4"]).as_py()], pa.int64())})

    maxima = rev.map_batches(block_max, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None).take_all()  # O(blocks)
    if not maxima:
        return rev  # empty window: typed empty (s_suppkey, revenue_e4)
    m = max(r["m"] for r in maxima)
    winners = rev.filter(expr=f"revenue_e4 == {int(m)}")

    supp = readers.read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    supp = supp.map_batches(
        lambda t: pa.table(
            {"s_suppkey": pc.cast(t["s_suppkey"], pa.int64()), "s_name": t["s_name"]}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = _attach_dim(winners, supp, "s_suppkey", ["s_name"], ["revenue_e4"],
                    force=force_dim)
    return j.sort("s_suppkey")


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#13",
                           force_dim: str | None = None) -> pd.DataFrame:
    """Revenue lost to small-quantity orders of one brand (TPC-H Q17
    shape: per-part average quantity as a correlated scalar, re-joined to
    the same fact rows): total extended price of lineitems whose quantity
    is below 20 % of their part's average order quantity, and its yearly
    average.

    Exactness: the threshold compare is the integer cross-multiplication
    5·qty·n_li < sum_qty (no float average); the single yearly-average
    division total_c / 700.0 mirrors the oracle's op order.  Scale shape:
    brand predicate → semi-join prune; per-part stats via grouped_agg
    (part-bounded); stats re-join the fact rows as the unique-keyed build
    of ONE sorted-merge join; the final total funnels through per-block
    partial sums (O(blocks) driver rows)."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    def pred(t: pa.Table):
        return pc.equal(t["p_brand"], pa.scalar(brand))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
                    pa.int64(),
                ),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    li = _li_part_filtered(
        sf_dir, pred, ["p_brand"], ["l_partkey", "l_quantity", "l_extendedprice"],
        prep, ["qty", "price_c", "one"], force=force_dim,
    ).materialize()  # consumed twice: stats + re-join probe

    stats = grouped_agg(
        li, ["p_partkey"], [("qty", "sum", "sum_qty"), ("one", "count", "n_li")],
        types={"p_partkey": pa.int64(), "qty": pa.int64(), "one": pa.int64()},
    )
    j = equi_join(
        stats, li, "p_partkey", ["sum_qty", "n_li"], ["qty", "price_c"],
        types={"p_partkey": pa.int64(), "sum_qty": pa.int64(),
               "n_li": pa.int64(), "qty": pa.int64(), "price_c": pa.int64()},
    )

    def partial_sum(t: pa.Table) -> pa.Table:
        small = pc.less(
            pc.multiply(pc.multiply(t["qty"], pa.scalar(5)), t["n_li"]),
            t["sum_qty"],
        )
        kept = t.filter(small)
        s = pc.sum(kept["price_c"]).as_py() or 0
        return pa.table({"s": pa.array([int(s)], pa.int64())})

    parts = j.map_batches(partial_sum, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None).take_all()  # O(blocks)
    total_c = int(sum(r["s"] for r in parts))
    return pd.DataFrame(
        {
            "total_price_c": pd.array([total_c], dtype="int64"),
            "avg_yearly": pd.array([float(total_c) / 700.0], dtype="float64"),
        }
    )


def sole_return_suppliers(sf_dir: str, k: int = 25) -> rd.Dataset:
    """Suppliers solely responsible for a returned item in multi-supplier
    finalized orders (TPC-H Q21 shape re-expressed with the catalog's
    return flag standing in for the receipt/commit lateness predicate):
    per supplier, the number of status-'F' orders with ≥ 2 distinct
    suppliers where THIS supplier is the only one whose lineitem came back
    'R', ranked desc.

    Scale shape: (order, supplier) pairs collapse via grouped_agg with a
    MAX(has_r) flag (corpus → pair-bounded); the per-order supplier/bad
    counts are a second key-bounded grouped_agg; the 'F' restriction and
    the per-order counts re-attach through sorted-merge joins (orders is
    fact-sized, per-order stats are unique-keyed builds — nothing
    broadcast); the final per-supplier count is supplier-bounded and the
    top-k funnels through per-block partials."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    li = readers.read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "r": pc.cast(pc.equal(t["l_returnflag"], pa.scalar("R")), pa.int64()),
            }
        )

    pairs = grouped_agg(
        li.map_batches(pair_prep, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["o_orderkey", "s_suppkey"], [("r", "max", "has_r")],
        types={"o_orderkey": pa.int64(), "s_suppkey": pa.int64(), "r": pa.int64()},
    ).materialize()  # consumed twice: per-order stats + probe side

    def one_col(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    per_order = grouped_agg(
        pairs.map_batches(one_col, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None),
        ["o_orderkey"], [("one", "count", "n_supp"), ("has_r", "sum", "n_bad")],
        types={"o_orderkey": pa.int64(), "one": pa.int64(), "has_r": pa.int64()},
    )

    orders = readers.read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])

    def f_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        return pa.table({"o_orderkey": pc.cast(t["o_orderkey"], pa.int64())})

    pairs_f = equi_join(
        orders.map_batches(f_keys, batch_format="pyarrow", zero_copy_batch=True),
        pairs, "o_orderkey", [], ["s_suppkey", "has_r"],
        types={"o_orderkey": pa.int64(), "s_suppkey": pa.int64(),
               "has_r": pa.int64()},
    )
    j = equi_join(
        per_order, pairs_f, "o_orderkey", ["n_supp", "n_bad"], ["s_suppkey", "has_r"],
        types={"o_orderkey": pa.int64(), "n_supp": pa.int64(), "n_bad": pa.int64(),
               "s_suppkey": pa.int64(), "has_r": pa.int64()},
    )

    def culprits(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.equal(t["has_r"], pa.scalar(1)),
                    pc.equal(t["n_bad"], pa.scalar(1))),
            pc.greater_equal(t["n_supp"], pa.scalar(2)),
        )
        t = t.filter(mask)
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    counts = grouped_agg(
        j.map_batches(culprits, batch_format="pyarrow", zero_copy_batch=True,
                      batch_size=None),
        ["s_suppkey"], [("one", "count", "numwait")],
        types={"s_suppkey": pa.int64(), "one": pa.int64()},
    )

    names = {
        int(r["s_suppkey"]): r["s_name"]
        for r in readers.read_table(
            sf_dir, "supplier", columns=["s_suppkey", "s_name"]
        ).take_all()
    }  # supplier names only for the ≤ k winners below would need a join;
    # the supplier table is dimension-bounded (DIM_BROADCAST_MAX class)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["numwait"] = b["numwait"].astype("int64")
        b["s_suppkey"] = b["s_suppkey"].astype("int64")
        return b.sort_values(["numwait", "s_suppkey"], ascending=[False, True],
                             kind="mergesort").head(k)

    top = (
        counts.map_batches(pick, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(pick, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    top["s_name"] = top["s_suppkey"].map(names)
    return rd.from_pandas(top[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True))


def forecast_revenue(sf_dir: str, year: str = "1996") -> rd.Dataset:
    """Discount-forecast revenue (TPC-H Q6 shape): one global sum of
    l_extendedprice × l_discount over a ship-year window, a discount band
    and a quantity cap — the pure scan-plus-rollup query.

    Scale shape: column-pruned read, ALL predicates applied map-side on
    integer-scaled values (disc_e2 ∈ [5, 7], qty < 24 — no float compares
    can diverge from the oracle), per-block partial sums; only one
    (sum, count) row per block crosses to the single-key reduce.  EXACT:
    rev_e4 = price_c × disc_e2 is int64 at the e-4 dollar scale."""
    from ..stages.groupagg import grouped_agg

    li = readers.read_table(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = np.datetime64(f"{year}-01-01").astype("datetime64[us]")
    hi = np.datetime64(f"{int(year) + 1}-01-01").astype("datetime64[us]")

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["l_shipdate"], pa.timestamp("us"))
        disc_e2 = pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))), pa.int64())
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        mask = pc.and_(
            pc.and_(pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(disc_e2, pa.scalar(5)),
                        pc.less_equal(disc_e2, pa.scalar(7))),
                pc.less(qty, pa.scalar(24)),
            ),
        )
        t2 = t.filter(mask)
        price_c = pc.cast(
            pc.round(pc.multiply(t2["l_extendedprice"], pa.scalar(100.0))), pa.int64()
        )
        d2 = pc.cast(pc.round(pc.multiply(t2["l_discount"], pa.scalar(100.0))), pa.int64())
        return pa.table(
            {
                "k": pa.array(np.zeros(t2.num_rows, dtype=np.int64)),
                "rev_e4": pc.multiply(price_c, d2),
                "one": pa.array(np.ones(t2.num_rows, dtype=np.int64)),
            }
        )

    agg = grouped_agg(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["k"], [("rev_e4", "sum", "revenue_e4"), ("one", "count", "n_lines")],
        types={"k": pa.int64(), "rev_e4": pa.int64(), "one": pa.int64()},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "revenue_e4": b["revenue_e4"].astype("int64"),
                "n_lines": b["n_lines"].astype("int64"),
            }
        )

    return agg.map_batches(finish, batch_format="pandas", batch_size=None)


def line_priority_counts(sf_dir: str, year: str = "1996") -> rd.Dataset:
    """High- vs low-priority line counts per return flag (TPC-H Q12 shape
    re-expressed over the provided columns: l_returnflag stands in for the
    catalog's missing l_shipmode): lineitems shipped in `year` join their
    order's priority; per flag, how many lines belong to urgent/high
    orders vs the rest.

    Scale shape: orders collapses map-side to (key, is_high ∈ {0,1}) and
    forms the unique-keyed build of ONE sorted-merge join against the
    date-windowed lineitem probe; the two conditional counts are per-block
    partial sums over a 3-key space."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join

    orders = readers.read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def o_prep(t: pa.Table) -> pa.Table:
        hi = pc.or_(
            pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT")),
            pc.equal(t["o_orderpriority"], pa.scalar("2-HIGH")),
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "is_high": pc.cast(hi, pa.int64()),
            }
        )

    li = readers.read_table(sf_dir, "lineitem",
                            columns=["l_orderkey", "l_returnflag", "l_shipdate"])
    lo = np.datetime64(f"{year}-01-01").astype("datetime64[us]")
    hi_d = np.datetime64(f"{int(year) + 1}-01-01").astype("datetime64[us]")

    def l_prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["l_shipdate"], pa.timestamp("us"))
        t = t.filter(pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                             pc.less(d, pa.scalar(hi_d))))
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "l_returnflag": t["l_returnflag"],
            }
        )

    j = equi_join(
        orders.map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True),
        li.map_batches(l_prep, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey", ["is_high"], ["l_returnflag"],
        types={"o_orderkey": pa.int64(), "is_high": pa.int64(),
               "l_returnflag": pa.string()},
    )

    def split(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "high": t["is_high"],
                "low": pc.subtract(pa.scalar(1, pa.int64()), t["is_high"]),
            }
        )

    agg = grouped_agg(
        j.map_batches(split, batch_format="pyarrow", zero_copy_batch=True,
                      batch_size=None),
        ["l_returnflag"],
        [("high", "sum", "high_line_count"), ("low", "sum", "low_line_count")],
        types={"l_returnflag": pa.string(), "high": pa.int64(), "low": pa.int64()},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["high_line_count"] = b["high_line_count"].astype("int64")
        b["low_line_count"] = b["low_line_count"].astype("int64")
        return b

    return agg.map_batches(finish, batch_format="pandas", batch_size=None).sort("l_returnflag")


def part_supplier_variety(
    sf_dir: str, ex_brand: str = "Brand#13", ex_type: str = "PROMO",
    max_size: int = 10,
) -> rd.Dataset:
    """Distinct-supplier count per (brand, size) for qualifying parts,
    excluding flagged suppliers (TPC-H Q16 shape: the NOT-IN side is the
    negative-balance supplier set, standing in for the catalog's missing
    complaint comments).

    Scale shape: the part predicate filters the unique-keyed build of ONE
    sorted-merge join against lineitem; the triple distinct collapses via
    the algebraic grouped_agg (corpus → |brand×size×supplier| rows max);
    the supplier exclusion is the payload-carrying sorted-exchange
    anti-join (setops.anti_join_cols — NOT broadcast, suppliers with
    complaints are corpus-derived at production scale); the final count
    per (brand, size) is key-bounded."""
    from ..stages.groupagg import grouped_agg
    from ..stages.join import equi_join
    from ..stages.setops import anti_join_cols

    part = readers.read_table(sf_dir, "part",
                              columns=["p_partkey", "p_brand", "p_type", "p_size"])

    def p_prep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.not_equal(t["p_brand"], pa.scalar(ex_brand)),
                    pc.not_equal(t["p_type"], pa.scalar(ex_type))),
            pc.less_equal(t["p_size"], pa.scalar(max_size)),
        )
        t = t.filter(mask)
        return pa.table(
            {
                "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                "p_brand": t["p_brand"],
                "p_size": pc.cast(t["p_size"], pa.int64()),
            }
        )

    li = readers.read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            }
        )

    j = equi_join(
        part.map_batches(p_prep, batch_format="pyarrow", zero_copy_batch=True),
        li.map_batches(l_prep, batch_format="pyarrow", zero_copy_batch=True),
        "p_partkey", ["p_brand", "p_size"], ["s_suppkey"],
        types={"p_partkey": pa.int64(), "p_brand": pa.string(),
               "p_size": pa.int64(), "s_suppkey": pa.int64()},
    )

    def one_col(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    triples = grouped_agg(
        j.map_batches(one_col, batch_format="pyarrow", zero_copy_batch=True,
                      batch_size=None),
        ["p_brand", "p_size", "s_suppkey"], [("one", "count", "n")],
        types={"p_brand": pa.string(), "p_size": pa.int64(),
               "s_suppkey": pa.int64(), "one": pa.int64()},
    )

    supp = readers.read_table(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def bad(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["s_acctbal"], pa.scalar(0.0)))
        return pa.table({"s_suppkey": pc.cast(t["s_suppkey"], pa.int64())})

    kept = anti_join_cols(
        triples, supp.map_batches(bad, batch_format="pyarrow", zero_copy_batch=True),
        key="s_suppkey", cols=["p_brand", "p_size"],
        dtypes={"p_brand": "object", "p_size": "int64"},
    )

    def one2(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": b["p_brand"],
                "p_size": b["p_size"].astype("int64"),
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    counts = grouped_agg(
        kept.map_batches(one2, batch_format="pandas", batch_size=None),
        ["p_brand", "p_size"], [("one", "count", "supplier_cnt")],
        types={"p_brand": pa.string(), "p_size": pa.int64(), "one": pa.int64()},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["supplier_cnt"] = b["supplier_cnt"].astype("int64")
        b["p_size"] = b["p_size"].astype("int64")
        return b

    return counts.map_batches(finish, batch_format="pandas",
                              batch_size=None).sort(
        ["supplier_cnt", "p_brand", "p_size"], descending=[True, False, False]
    )


def heavy_suppliers(
    sf_dir: str, token: str = "widget", year: str = "1996",
    threshold: int = 300, force_dim: str | None = None,
) -> rd.Dataset:
    """Suppliers who shipped more than `threshold` units of matching parts
    in a year (TPC-H Q20 shape: the nested part-predicate → quantity-sum
    → supplier semi-join chain), with name and nation attached.

    Scale shape: the part-name predicate prunes the fact scan through the
    size-gated dimension semi-join (_semi_filter); the per-supplier
    quantity sum is algebraic (corpus → |supplier| rows max); the name
    attach rides the size-gated dim attach and the 25-row nation map
    applies driver-side on the key-bounded winners."""
    from ..stages.groupagg import grouped_agg

    lo = np.datetime64(f"{year}-01-01").astype("datetime64[us]")
    hi = np.datetime64(f"{int(year) + 1}-01-01").astype("datetime64[us]")

    def pred(t: pa.Table):
        return pc.match_substring(t["p_name"], token)

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["l_shipdate"], pa.timestamp("us"))
        t = t.filter(pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                             pc.less(d, pa.scalar(hi))))
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }
        )

    li = _li_part_filtered(
        sf_dir, pred, ["p_name"], ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        prep, ["s_suppkey", "qty"], force=force_dim,
    )

    sums = grouped_agg(
        li.map_batches(
            lambda t: t.select(["s_suppkey", "qty"]),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        ),
        ["s_suppkey"], [("qty", "sum", "sum_qty")],
        types={"s_suppkey": pa.int64(), "qty": pa.int64()},
    )

    def over(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "sum_qty": pc.cast(t["sum_qty"], pa.int64()),
            }
        ).filter(pc.greater(pc.cast(t["sum_qty"], pa.int64()),
                            pa.scalar(threshold, pa.int64())))

    winners = sums.map_batches(over, batch_format="pyarrow")

    supp = readers.read_table(sf_dir, "supplier",
                              columns=["s_suppkey", "s_name", "s_nationkey"])
    supp = supp.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": t["s_name"],
                "s_nat": pc.cast(t["s_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = _attach_dim(winners, supp, "s_suppkey", ["s_name", "s_nat"],
                    ["sum_qty"], force=force_dim)
    names = {int(r["n_nationkey"]): r["n_name"]
             for r in readers.read_table(sf_dir, "nation").take_all()}  # 25 rows

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "s_suppkey": b["s_suppkey"].astype("int64"),
                "s_name": b["s_name"],
                "n_name": b["s_nat"].astype("int64").map(names),
                "sum_qty": b["sum_qty"].astype("int64"),
            }
        )

    return j.map_batches(finish, batch_format="pandas").sort("s_suppkey")


def lineitem_unpivot(sf_dir: str) -> rd.Dataset:
    """UNPIVOT / melt: the lineitem measure columns re-emitted as long-form
    (l_orderkey, l_linenumber, measure, val_e2) rows — the wide→long
    reshape (the inverse of eventagg.pivot_event_counts) every
    feature-store export needs.

    Map-only flat expansion (4 rows out per row in), zero exchange at any
    scale; money/quantity measures land as exact cent-scaled int64 so the
    UNION-ALL oracle matches bit-for-bit."""
    li = readers.read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    )
    measures = [
        ("quantity", "l_quantity"),
        ("extendedprice", "l_extendedprice"),
        ("discount", "l_discount"),
        ("tax", "l_tax"),
    ]

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ok = pc.cast(t["l_orderkey"], pa.int64())
        ln = pc.cast(t["l_linenumber"], pa.int64())
        parts = []
        for name, col in measures:
            parts.append(
                pa.table(
                    {
                        "l_orderkey": ok,
                        "l_linenumber": ln,
                        "measure": pa.array([name] * n, pa.string()),
                        "val_e2": pc.cast(
                            pc.round(
                                pc.multiply(
                                    pc.cast(t[col], pa.float64()), pa.scalar(100.0)
                                )
                            ),
                            pa.int64(),
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    return li.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def _part_supplier_edges(sf_dir: str) -> rd.Dataset:
    """Symmetrized DISTINCT part–supplier co-purchase edges: nodes are
    parts (id 2·p_partkey) and suppliers (id 2·s_suppkey + 1), one
    undirected edge per distinct (l_partkey, l_suppkey) lineitem pairing.
    The distinct is one grouped count over the symmetrized pair rows
    (heavy side, fully distributed)."""
    from ..stages.groupagg import grouped_agg

    li = readers.read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def sym(t: pa.Table) -> pa.Table:
        p = pc.cast(t["l_partkey"], pa.int64()).to_numpy(zero_copy_only=False) * 2
        s = pc.cast(t["l_suppkey"], pa.int64()).to_numpy(zero_copy_only=False) * 2 + 1
        return pa.table(
            {
                "node": pa.array(np.concatenate([p, s])),
                "dst": pa.array(np.concatenate([s, p])),
                "one": pa.array(np.ones(2 * t.num_rows, dtype=np.int64)),
            }
        )

    return grouped_agg(
        li.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["node", "dst"], [("one", "sum", "n")],
    ).select_columns(["node", "dst"])


def part_supplier_pagerank(sf_dir: str, iters: int = 10) -> rd.Dataset:
    """PageRank centrality over the part–supplier co-purchase graph — the
    "which parts/suppliers sit at the center of the trade network" question
    over the reference's node/edge sink analog.  Edges via
    _part_supplier_edges; the rank iteration is stages/graphalgo.pagerank —
    integer-exact, size-gated driver/distributed with test-forced parity."""
    from ..stages import graphalgo

    return graphalgo.pagerank(_part_supplier_edges(sf_dir), iters=iters)


def part_supplier_kcore(sf_dir: str, k: int = 10) -> rd.Dataset:
    """k-core of the part–supplier co-purchase graph: peel every node with
    fewer than k distinct trade partners until the dense trading core
    remains — the dense-subgraph pruning a near-dup pair graph gets before
    review, run here over the reference's edge-sink analog.  Peeling is
    stages/graphalgo.kcore (size-gated driver/distributed, test-forced
    parity); the oracle unrolls the same peel rounds in SQL."""
    from ..stages import graphalgo

    return graphalgo.kcore(_part_supplier_edges(sf_dir), k=k)


def _nation_trade_edges(sf_dir: str) -> rd.Dataset:
    """Canonical (a < b) edge list of the thresholded nation trade graph:
    nations are connected when their mutual trade revenue (customer-side ⊕
    supplier-side summed over the unordered pair) exceeds 0.8× the mean
    pair revenue.

    The heavy reduction (lineitem → per-pair revenue) is the shared
    distributed join chain (_li_with_nations) plus one grouped sum; the
    thresholding runs driver-side on the pair table, which is bounded by
    the nation-pair DOMAIN (≤ n_nations², independent of corpus size).
    The edge threshold is exact integer cross-multiplication
    (10·pair_rev·n_pairs > 8·total_rev ⟺ pair_rev > 0.8·mean), so no
    float enters."""
    from ..stages.groupagg import grouped_agg

    j3 = _li_with_nations(sf_dir)

    def pair_prep(t: pa.Table) -> pa.Table:
        s = t["s_nat"].to_numpy(zero_copy_only=False)
        c = t["c_nat"].to_numpy(zero_copy_only=False)
        rev = t["rev_e4"].to_numpy(zero_copy_only=False)
        keep = s != c
        return pa.table(
            {
                "a": pa.array(np.minimum(s[keep], c[keep])),
                "b": pa.array(np.maximum(s[keep], c[keep])),
                "rev_e4": pa.array(rev[keep]),
            }
        )

    pairs = grouped_agg(
        j3.map_batches(pair_prep, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["a", "b"], [("rev_e4", "sum", "r")],
    ).to_pandas()
    total = int(pairs["r"].sum())
    n_pairs = len(pairs)
    keep = 10 * pairs["r"].to_numpy() * n_pairs > 8 * total
    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array(pairs["a"].to_numpy()[keep], pa.int64()),
                "b": pa.array(pairs["b"].to_numpy()[keep], pa.int64()),
            }
        )
    )


def nation_trade_triangles(sf_dir: str) -> rd.Dataset:
    """Triangle count of the nation trade graph (_nation_trade_edges) — a
    local-clustering summary of the Q7-style volume analysis.  Counting is
    stages/graphalgo.triangle_count (size-gated driver/distributed,
    test-forced parity)."""
    from ..stages import graphalgo

    return graphalgo.triangle_count(_nation_trade_edges(sf_dir))


def nation_trade_link_predict(sf_dir: str):
    """Top-20 missing-edge candidates of the nation trade graph by
    common-neighbor count (stages/graphalgo.link_predict) — "which trade
    link does the thresholded graph most suggest", the completion query
    for any derived graph."""
    from ..stages import graphalgo

    return graphalgo.link_predict(_nation_trade_edges(sf_dir), k=20)


def nation_trade_jaccard(sf_dir: str) -> rd.Dataset:
    """Per-edge neighborhood Jaccard similarity of the nation trade graph
    (_nation_trade_edges) — the link-prediction / edge-strength feature
    (stages/graphalgo.edge_jaccard, size-gated driver/distributed).  The
    Σ deg² wedge cost of exact per-edge common-neighbor counting is safe
    here by construction: the graph is bounded by the nation DOMAIN."""
    from ..stages import graphalgo

    return graphalgo.edge_jaccard(_nation_trade_edges(sf_dir))


def price_quantity_skyline(sf_dir: str) -> rd.Dataset:
    """Pareto frontier of the trade table: the cheapest extended price at
    every quantity level no cheaper line beats — minimize price_e2,
    maximize qty (stages/skyline.skyline_2d: grouped per-x max, then the
    two-pass global prefix-max scan; driver sees O(blocks) rows)."""
    from ..stages import skyline

    li = readers.read_table(sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "price_e2": pa.array(
                    np.round(
                        pc.cast(t["l_extendedprice"], pa.float64()).to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64)
                ),
                "qty": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    return skyline.skyline_2d(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        "price_e2", "qty",
    )


def part_supplier_degree_hist(sf_dir: str) -> rd.Dataset:
    """Degree distribution of the part–supplier co-purchase graph (how
    many nodes have each trade-partner count) — the first QA report run
    on any derived graph before centrality/peeling.  Two algebraic
    grouped counts: corpus → node degrees → counts-of-counts; the second
    key space is bounded by the degree DOMAIN."""
    from ..stages.groupagg import grouped_agg

    deg = grouped_agg(
        _part_supplier_edges(sf_dir).map_batches(
            lambda t: pa.table(
                {"node": t["node"],
                 "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow", batch_size=None,
        ),
        ["node"], [("one", "sum", "deg")],
    )
    return grouped_agg(
        deg.map_batches(
            lambda t: pa.table(
                {"deg": t["deg"],
                 "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow", batch_size=None,
        ),
        ["deg"], [("one", "sum", "n_nodes")],
    )
