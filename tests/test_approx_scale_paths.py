"""Approximate-aggregate drop-ins: several operators document "at
extreme cardinality swap the exact aggregate for its approx_* sibling"
(MAD anomalies' grouped medians, SLA percentiles, distinct-user counts).
That claim is only honest if the approximate path actually lands within
its documented error bound on our data — these tests pin it.

Exact percentiles/count-distinct hold per-group state proportional to
group size; the approx forms (Greenwald-Khanna sketch for percentiles,
HyperLogLog++ for count distinct) hold bounded state per group, which
is what makes them the 100 TB path. Both are partial-aggregable, so the
swap changes only the aggregate buffer, not the plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_golang_spark.sources.tables import load_table


def test_approx_percentile_within_accuracy_bound(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    acc = 1000  # guarantees rank error <= n/acc
    row = events.agg(
        F.percentile("value", F.lit(0.5)).alias("exact_p50"),
        F.percentile("value", F.lit(0.99)).alias("exact_p99"),
        F.expr(f"approx_percentile(value, 0.5, {acc})").alias("apx_p50"),
        F.expr(f"approx_percentile(value, 0.99, {acc})").alias("apx_p99"),
        F.count("*").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).first()
    # rank error n/acc translates to a value band; on our smooth value
    # distribution the band is a small slice of the data range
    spread = row.hi - row.lo
    assert abs(row.apx_p50 - row.exact_p50) <= max(0.05 * spread, 1e-9)
    assert abs(row.apx_p99 - row.exact_p99) <= max(0.05 * spread, 1e-9)


def test_approx_percentile_grouped_matches_exact_ranks(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    both = (
        events.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("exact"),
            F.expr("approx_percentile(value, 0.5, 1000)").alias("apx"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    )
    assert len(both) > 0
    for r in both:
        assert abs(r.apx - r.exact) <= max(0.05 * (r.hi - r.lo), 1e-9), r.event_type


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rsd = 0.02
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd).alias("apx"),
    ).first()
    # HLL++ standard error is rsd; 5 sigma is a deterministic-enough bound
    assert abs(row.apx - row.exact) <= max(5 * rsd * row.exact, 3)
