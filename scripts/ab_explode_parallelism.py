#!/usr/bin/env python
"""Straggler probe: does spreading the pair-explode stage over more
partitions cut the derivation wall? AQE coalesces the postings
exchange on PRE-explode bytes; the explode then multiplies rows
(sum df^2 per shingle), so heavy posting lists pile into one task
(the observed (3+1)/4 straggler). A/B: current vs repartition(N)
before the explode (extra round-robin exchange, but the explode's
quadratic work spreads over all cores)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.operators.dedup import (
    DEFAULT_MAX_DOC_FREQ,
    word_shingles,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
threshold = 0.5
cap = DEFAULT_MAX_DOC_FREQ

spark = get_spark(app_name="ab-explode-par")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.limit(10).write.format("noop").mode("overwrite").save()

# materialize cold_post ONCE so the A/B isolates the explode+agg stage
sh = word_shingles(docs).localCheckpoint(eager=False)
freq = sh.groupBy("shingle").agg(F.count("*").alias("df_")).localCheckpoint(eager=False)
doc_stats = (
    sh.join(freq, "shingle")
    .groupBy("doc_id")
    .agg(
        F.count("*").alias("n_sh"),
        F.sum((F.col("df_") > cap).cast("long")).alias("n_hot_sh"),
    )
)
cold_post = (
    sh.join(freq.where(F.col("df_") <= cap).select("shingle"), "shingle")
    .join(doc_stats, "doc_id")
    .groupBy("shingle")
    .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh", "n_hot_sh"))).alias("docs"))
    .localCheckpoint(eager=True)
)
print(f"cold_post rows {cold_post.count()}, partitions {cold_post.rdd.getNumPartitions()}")

pair_expr = F.expr(
    "flatten(transform(docs, (x, i) -> "
    "  transform(slice(docs, i + 2, size(docs) - i - 1), "
    "            y -> named_struct('a', x, 'b', y))))"
)

def agg_of(src):
    exploded = src.select(F.explode(pair_expr).alias("p")).where(
        F.least("p.a.n_sh", "p.b.n_sh")
        / (F.col("p.a.n_sh") + F.col("p.b.n_sh") - F.least("p.a.n_sh", "p.b.n_sh"))
        >= threshold
    )
    return (
        exploded.groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.n_sh").alias("n_a"),
            F.col("p.b.n_sh").alias("n_b"),
            F.col("p.a.n_hot_sh").alias("n_hot_a"),
            F.col("p.b.n_hot_sh").alias("n_hot_b"),
        ).agg(F.count("*").alias("n_cold"))
    )

variants = {
    "asis": lambda: agg_of(cold_post),
    "rep8": lambda: agg_of(cold_post.repartition(8)),
    "rep32": lambda: agg_of(cold_post.repartition(32)),
}
walls = {k: [] for k in variants}
names = list(variants)
for r in range(reps):
    order = names if r % 2 == 0 else names[::-1]
    for name in order:
        t0 = time.perf_counter()
        variants[name]().write.format("noop").mode("overwrite").save()
        walls[name].append(time.perf_counter() - t0)
for name, ws in walls.items():
    print(f"{name:6s} min {min(ws):.3f}  all {[round(w,3) for w in ws]}")
spark.stop()
