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
