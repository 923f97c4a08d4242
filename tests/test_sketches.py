"""Mergeable-sketch surface: Apache DataSketches HLL (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate) and count-min sketch.

Mergeability is THE property that makes sketches work at 100 TB: each
partition/day builds its own sketch, the tiny binaries union
associatively, and the estimate comes off the merged state — no
re-scan, no exact-distinct shuffle. These tests pin (a) union of
per-group sketches == one-shot sketch, exactly, and (b) estimates land
within the algorithms' published error bounds of exact answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_golang_spark.sources.tables import load_table


def test_hll_union_of_partial_sketches_matches_global(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    one_shot = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est
    merged = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    # same algorithm, same data — the merged estimate is identical
    assert merged == one_shot
    exact = events.select("user_id").distinct().count()
    # lgConfigK=12 default → relative error ~1.6%; allow 5% headroom
    assert abs(one_shot - exact) <= max(2, 0.05 * exact)


def test_count_min_sketch_bounds_point_queries(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    eps, conf = 0.001, 0.99
    sk_bytes = bytes(
        events.agg(
            F.count_min_sketch("event_type", F.lit(eps), F.lit(conf), F.lit(42)).alias("sk")
        ).collect()[0].sk
    )
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(sk_bytes)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    exact = dict(
        events.groupBy("event_type").count().rdd.map(tuple).collect()
    )
    total = sum(exact.values())
    for k, n in exact.items():
        est = cms.estimateCount(k)
        # CMS never underestimates; overestimate bounded by eps * total
        assert n <= est <= n + eps * total
