"""Star-schema join + aggregation pack (extension surface, SURVEY.md §2.4).

The reference has **no join operator of any kind** (SURVEY.md §2.3 —
its inverted index is a group-by); these operators are the standard
warehouse queries the fixture star schema exists for, adapted TPC-H
shapes over the driver tables (FIXTURES.md §B).

Scale design, applied uniformly:
- **Force-broadcast ONLY scale-invariant sides.** region (5 rows),
  nation (25), single-row scalar aggregates, and filtered singletons
  get an explicit ``F.broadcast`` hint — they are the same size at any
  SF. customer/supplier/part SCALE LINEARLY with SF (TPC-H-style;
  measured across the sf0.001/0.01/0.1 fixtures), so a forced
  broadcast would OOM at SF1000 (customer ≈ 150M rows); those sides
  carry NO hint — Spark's size stats auto-broadcast them while small
  and AQE converts to broadcast at runtime when a filter shrinks them
  below the threshold, which is the correct decision at every scale.
- **Fact⋈fact (lineitem⋈orders) stays a shuffle join on the join
  key** — at 100 TB that exchange is unavoidable without bucketing;
  both sides hash on the same key so AQE can split skewed partitions.
- **Aggregate before join when the group key allows it** (q3 groups
  by o_orderkey: lineitem pre-aggregates to one row per orderkey
  before joining orders, shrinking the join input by the fan-out).
- Filters sit directly on base scans so Catalyst pushes them into the
  parquet reader (verify via .explain: PushedFilters).
- Float outputs rounded in-query so the DuckDB differential hash is
  stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: pricing summary by returnflag/linestatus.

    Pure scan→filter→hash-agg; partial aggregation makes the exchange
    carry ≤ (flags×statuses) rows per task regardless of input size.
    """
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k unshipped orders by revenue.

    lineitem pre-aggregates to per-orderkey revenue *before* the join
    (fan-out collapse), the filtered customer side is left to stats/AQE (auto-broadcast
    while small), and top-k is
    TakeOrderedAndProject — k rows per partition reach the driver.
    Deterministic tie-break on o_orderkey.
    """
    cut = F.lit(date).cast("timestamp")
    rev = (
        lineitem.where(F.col("l_shipdate") > cut)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    return (
        orders.where(F.col("o_orderdate") < cut)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(rev, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderkey"),
            F.round(F.col("rev"), 2).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_orderpriority"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


def q5_local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier
    share the nation. nation⋈region force-broadcasts (bounded); the
    customer/supplier sides are stats/AQE-decided. Exchanges: the
    lineitem⋈orders join and the final small group-by.
    """
    nations = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cn_name"))
    supp = supplier.join(
        F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_nationkey").alias("sn_key"))

    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")

    return (
        lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("cn_key") == F.col("sn_key")))
        .groupBy(F.col("cn_name").alias("n_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from a discount-band what-if.
    Scan → fully-pushed-down filters → single global agg; the ideal
    minimal-plan query (one partial agg row per task)."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 20
) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns.
    Returned lines pre-aggregate per order, join orders (fact⋈fact on
    the key), then per-customer agg joins the customer dim last (stats/AQE
    pick the strategy — per_cust is one row per customer)."""
    returned = (
        lineitem.where(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    per_cust = (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev"))
    )
    return (
        per_cust.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment", F.round("rev", 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def q12_late_shipments(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q12 shape (adapted to this schema): per linestatus, how
    many late-shipped lines belong to high- vs low-priority orders.
    Conditional aggregation after one fact⋈fact join."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_count"),
        )
    )


def q14_promo_revenue_share(
    part: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
) -> DataFrame:
    """TPC-H Q14 shape: % of revenue from PROMO parts in a window.
    Join strategy for the part side is stats/AQE-decided; one
    conditional-sum aggregate."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(part.select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))) / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, min_qty: float = 250.0
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with their customers. HAVING-style pre-filter collapses
    lineitem to qualifying orderkeys BEFORE any join."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") >= min_qty)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


def q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    late_days: int = 30,
) -> DataFrame:
    """TPC-H Q4 shape (adapted: the fixture has no l_commitdate /
    l_receiptdate, so a line is "late" if shipped more than
    ``late_days`` after the order date). EXISTS becomes a LEFT SEMI
    join — the equi-key carries the hash join, the lateness predicate
    rides as the join filter, and only o_orderkey ships for the probe.
    """
    sel = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).join(
        lineitem.select("l_orderkey", "l_shipdate"),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: cross-border revenue between two nations by
    (supplier nation, customer nation, ship year). The 2-row nation
    filter force-broadcasts into both dim joins; the only big exchange
    is lineitem⋈orders."""
    two = nation.where(F.col("n_name").isin(nation_a, nation_b))
    supp = supplier.join(
        F.broadcast(two), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(two), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    return (
        lineitem.select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
    )


def q8_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "AMERICA",
    target_nation: str = "NATION_1",
) -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of supply revenue into
    one region's customers, per order year. Conditional-sum ratio;
    bounded nation/region sides force-broadcast, the rest is
    stats/AQE-decided; one fact⋈fact exchange."""
    rnations = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(rnations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "5-LOW"
) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers (the left join is the point of the
    query). The fixture lacks o_comment, so the excluded-order filter
    stands in on o_orderpriority. Orders pre-aggregate per custkey
    before touching the customer dim."""
    cnt = (
        orders.where(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    per_cust = customer.select("c_custkey").join(
        cnt, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q17_small_quantity_revenue(
    part: DataFrame, lineitem: DataFrame, brand: str = "Brand#1", fraction: float = 0.2
) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in small-quantity lines of one
    brand (yearly average). The correlated scalar subquery
    (0.2 * per-part avg quantity) decorrelates into a pre-aggregated
    per-part average joined back — one row per qualifying part, so the
    join stays key-partitioned and AQE broadcasts it when small (it
    scales with the part table, so no forced hint)."""
    parts = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(parts, F.col("l_partkey") == F.col("p_partkey"))
    avgs = li.groupBy("p_partkey").agg((fraction * F.avg("l_quantity")).alias("qty_cut"))
    return (
        li.join(avgs.withColumnRenamed("p_partkey", "a_partkey"),
                F.col("p_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q19_discounted_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (brand, size, quantity-band)
    predicate — the classic OR-of-ANDs join filter. The part-side
    strategy is stats/AQE-decided; the OR predicate evaluates inside
    the join's codegen
    (no per-branch scans)."""
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & size.between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        lineitem.join(
            part.select("p_partkey", "p_brand", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q22_sales_opportunity(
    customer: DataFrame, orders: DataFrame, since: str = "1999-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no orders since
    ``since`` (lapsed accounts — every fixture customer has *some*
    order, so "never ordered" would be vacuously empty), grouped by
    market segment (the fixture has no phone column, so mktsegment
    stands in for the country code). The global positive-balance
    average is a scalar broadcast (cross join of one row); the
    no-recent-orders test is a LEFT ANTI shipping only the filtered
    o_custkey side."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("bal_cut")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("bal_cut"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def orders_above_customer_avg(orders: DataFrame) -> DataFrame:
    """Correlated-subquery shape (order price > its customer's average)
    expressed as a window — the decorrelated form that scales: one
    exchange on o_custkey instead of a per-row subquery."""
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("cust_avg", 6).alias("cust_avg"),
        )
    )


def top_customers_by_revenue(customer: DataFrame, orders: DataFrame, k: int = 10) -> DataFrame:
    """Top-k customers by total order value; join after aggregation so
    the broadcast-joined side is one row per customer, then global
    top-k via orderBy+limit.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        F.count("*").alias("n_orders"),
    )
    return (
        per_cust.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(k)
    )


def orders_with_lineitems_semi(orders: DataFrame, lineitem: DataFrame, min_qty: float = 45.0) -> DataFrame:
    """LEFT SEMI: orders having ≥1 line with quantity above threshold,
    counted per priority. Semi-join ships only the join key of the
    filtered lineitem side; no fan-out duplication.
    """
    big = lineitem.where(F.col("l_quantity") >= min_qty).select("l_orderkey")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def customers_without_orders_anti(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI: customers that never ordered — the standard
    orphan-detection shape; ships only o_custkey."""
    return (
        customer.join(orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def revenue_rank_in_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k customers per nation by revenue — Window.partitionBy +
    row_number ≤ k: the scalable per-group top-k (single exchange on
    the partition key, no global sort). Deterministic tie-break on
    c_custkey.
    """
    per_cust = orders.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    joined = per_cust.join(
        customer.select("c_custkey", "c_name", "c_nationkey"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("n_name", "c_custkey", "c_name", "revenue", F.col("rnk").cast("long").alias("rnk"))
    )


def q2_min_cost_supplier(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    size: int = 15,
    type_name: str = "STANDARD",
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape (adapted: the fixture has no partsupp table, so
    the supply relation derives from lineitem — a (part, supplier)
    pair's supply cost is its cheapest observed unit price
    ``min(l_extendedprice / l_quantity)``).

    The correlated min-cost subquery decorrelates into a per-part min
    joined back. Only nation⋈region force-broadcasts; the part/
    supplier-derived sides scale with SF and are stats/AQE-decided.
    Top-k orders on a full unique key so the LIMIT is deterministic.
    """
    rsupp = supplier.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.where(F.col("r_name") == region_name)),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey", "n_name")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts = part.where(
        (F.col("p_size") == size) & (F.col("p_type") == type_name)
    ).select("p_partkey", "p_name")
    supply = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(rsupp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_cost = supply.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        supply.join(
            min_cost,
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # unrounded: the division is the same IEEE double in any
            # engine, while round() half-ties (price/qty often ends
            # .xxxx5 exactly) break differently between engines.
            "supply_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(k)
    )


def q9_product_type_profit(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_fragment: str = "widget",
    cost_factor: float = 0.6,
) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp → per-unit supply cost is
    proxied as ``cost_factor * p_retailprice``). Profit by (supplier
    nation, order year) over parts whose name contains the fragment.

    The nation side force-broadcasts; part/supplier sides are
    stats/AQE-decided. The only big exchange is lineitem⋈orders, then
    one hash agg. The profit terms are cast to
    decimal(18,4) before SUM so the aggregate is exact and
    summation-order independent (double sums are not).
    """
    parts = part.where(F.col("p_name").contains(name_fragment)).select(
        "p_partkey", "p_retailprice"
    )
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(cost_factor) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum(amount.cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
    )


def q11_important_stock(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_3",
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp → a part's "stock value"
    from one nation's suppliers is the revenue shipped by those
    suppliers). Parts whose value exceeds ``fraction`` of the nation
    total — the HAVING-over-global-scalar shape: the total is a
    one-row aggregate cross-joined back as a broadcast, not a
    correlated rescan.
    """
    nsupp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    per_part = (
        lineitem.join(nsupp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("value"))
    )
    total = per_part.agg(F.sum("value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.lit(fraction) * F.col("total_value"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).cast("double").alias("value"),
        )
    )


def q15_top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    quarter. The view becomes a per-supplier aggregate; the scalar max
    is a one-row broadcast compared in decimal so the equality is
    exact (a double-sum tie would be engine/order dependent).
    """
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("total_revenue"))
    )
    max_rev = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier.select("s_suppkey", "s_name"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
    )


def q16_supplier_part_counts(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    exclude_brand: str = "Brand#5",
    sizes: tuple = (1, 9, 14, 19, 23, 36, 45, 3),
) -> DataFrame:
    """TPC-H Q16 shape (adapted: the (part, supplier) relation derives
    from lineitem; "customer complaints" — the NOT IN supplier
    exclusion — is proxied by negative account balance). Distinct
    supplier count per (brand, type, size): the distinct pairs shrink
    first (hash-agg on the pair), the excluded-supplier set anti-joins
    (strategy stats/AQE-decided), then one count-distinct agg.
    """
    parts = part.where(
        (F.col("p_brand") != exclude_brand) & F.col("p_size").isin(list(sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_dominant_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "small",
    year: int = 1997,
    share: float = 0.5,
    nation_name: str = "NATION_1",
) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availqty → a supplier
    "has excess stock" of a part if it shipped more than ``share`` of
    that part's total quantity in the year — the dominant supplier).

    Two-level aggregation: per (part, supplier) quantity, then per
    part total joined back (key-partitioned; AQE broadcasts it when
    small); the qualifying supplier set reaches the supplier dim as a
    left-semi.
    """
    parts = part.where(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    li = lineitem.where(F.year("l_shipdate") == year).join(
        parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("supp_qty"))
    per_part = per_ps.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        per_ps.join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("supp_qty") > F.lit(share) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(nation.where(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


def q21_suppliers_kept_waiting(
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_2",
    late_days: int = 30,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q21 shape (adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = shipped more than
    ``late_days`` after the order date — same convention as Q4).

    Suppliers who were the ONLY late supplier on a multi-supplier
    finalized order. The EXISTS (another supplier) / NOT EXISTS
    (another late supplier) pair decorrelates into one per-(order,
    supplier) aggregate plus order-level window counts — a single
    orderkey exchange instead of two correlated self-joins of
    lineitem.
    """
    li = lineitem.join(
        orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ).cast("int"),
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("is_late").alias("late"))
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.withColumn("n_supp", F.count("*").over(w)).withColumn(
        "n_late", F.sum("late").over(w)
    )
    waiting = flagged.where(
        (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(
            supplier.join(
                F.broadcast(nation.where(F.col("n_name") == nation_name)),
                F.col("s_nationkey") == F.col("n_nationkey"),
                "left_semi",
            ).select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def nation_share_shift(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Market-share shift report: each nation's share of yearly order
    revenue and its year-over-year share delta — the percent-of-total
    + lag composition every BI rollup ships (the share *shift* is what
    an analyst actually reads; absolute revenue is q5's job).

    Plan: the fact table collapses to a (nation, year) decimal
    aggregate FIRST (broadcast dims), so both windows — the per-year
    total and the per-nation lag — run over the tiny rollup, not the
    fact stream. First-year rows (no prior share) are excluded rather
    than emitted as NULLs. Returns (n_name, o_year, revenue, share,
    share_shift).
    """
    rev = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    wy = Window.partitionBy("o_year")
    wn = Window.partitionBy("n_name").orderBy("o_year")
    shared = rev.select(
        "n_name",
        "o_year",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        # both sides cast double BEFORE dividing: a decimal÷decimal
        # quotient's engine-specific scale could pre-round below 6dp
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(wy).cast("double"), 6
        ).alias("share"),
    )
    return (
        shared.withColumn("prev_share", F.lag("share").over(wn))
        .where(F.col("prev_share").isNotNull())
        .select(
            "n_name",
            "o_year",
            "revenue",
            "share",
            F.round(F.col("share") - F.col("prev_share"), 6).alias("share_shift"),
        )
    )


def order_ship_latency(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-to-first-ship latency percentiles per order priority — the
    fulfillment-SLA readout (p50/p90/p99 in days from order date to
    the earliest line shipment).

    The lineitem stream collapses to min(l_shipdate) per order BEFORE
    joining orders (agg then join — the join carries one row per
    order, not per line); latency is an exact integer-microsecond
    difference scaled to days; percentiles are exact interpolated
    aggregates per priority. Returns (o_orderpriority, n_orders, p50,
    p90, p99), days rounded 6.
    """
    first_ship = lineitem.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.min("l_shipdate").alias("ship_ts")
    )
    lat = orders.join(first_ship, orders.o_orderkey == first_ship.okey).select(
        "o_orderpriority",
        (
            (F.unix_micros("ship_ts") - F.unix_micros("o_orderdate"))
            / F.lit(86_400_000_000.0)
        ).alias("lat_days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.percentile("lat_days", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("lat_days", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("lat_days", F.lit(0.99)), 6).alias("p99"),
    )
