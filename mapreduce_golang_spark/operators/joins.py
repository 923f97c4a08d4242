"""Star-schema join + aggregation pack (extension surface, SURVEY.md §2.4).

The reference has **no join operator of any kind** (SURVEY.md §2.3 —
its inverted index is a group-by); these operators are the standard
warehouse queries the fixture star schema exists for, adapted TPC-H
shapes over the driver tables (FIXTURES.md §B).

Scale design, applied uniformly:
- **Broadcast the dims.** region/nation/supplier/part/customer are
  bounded (fixed cardinality as SF grows — TESTDATA.md scales only
  fact tables), so every dim side carries an explicit
  ``F.broadcast`` hint: no shuffle of the fact table for those joins.
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
    (fan-out collapse), the customer dim broadcasts, and top-k is
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
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
    share the nation. All dims broadcast; the only exchanges are the
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("cn_key") == F.col("sn_key")))
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
    the key), then per-customer agg with the dim broadcast last."""
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
        per_cust.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
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
    Part dim broadcasts; one conditional-sum aggregate."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
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
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
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
    (supplier nation, customer nation, ship year). Both nation-tagged
    dims broadcast; the only big exchange is lineitem⋈orders."""
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
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
    one region's customers, per order year. Conditional-sum ratio after
    all-broadcast dim joins; one fact⋈fact exchange."""
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
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
    per-part average joined back — broadcastable because it is one row
    per part, bounded by the dim."""
    parts = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    avgs = li.groupBy("p_partkey").agg((fraction * F.avg("l_quantity")).alias("qty_cut"))
    return (
        li.join(F.broadcast(avgs.withColumnRenamed("p_partkey", "a_partkey")),
                F.col("p_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q19_discounted_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (brand, size, quantity-band)
    predicate — the classic OR-of-ANDs join filter. The part dim
    broadcasts; the OR predicate evaluates inside the join's codegen
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
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
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
        per_cust.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
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
        F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("n_name", "c_custkey", "c_name", "revenue", F.col("rnk").cast("long").alias("rnk"))
    )
