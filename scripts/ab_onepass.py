#!/usr/bin/env python
"""Interleaved A/B: current 3-branch guarded pair stats (doc_stats,
cold postings, hot sets each re-join shingles x freq) vs a ONE-PASS
per-doc restructure that computes doc stats, the doc's cold-shingle
array, and its hot set in a single groupBy(doc_id) over the tagged
stream, then builds postings by re-exploding the cold arrays.
Exchange count drops from ~7 to ~4; at sf0.1 the derivation is
job/exchange-bound (xxhash64 byte-shrink A/B was a wash), so this is
the round-13 verdict-#2 lever. Checks identical pair sets first."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.operators.dedup import (
    DEFAULT_MAX_DOC_FREQ,
    _guarded_pair_stats,
    word_shingles,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
threshold = 0.5
keep = lambda ub, n_a, n_b: ub / (n_a + n_b - ub) >= threshold


def onepass_stats(shingles: DataFrame, max_doc_freq: int, keep_ub=None) -> DataFrame:
    shingles = shingles.localCheckpoint(eager=False)
    freq = (
        shingles.groupBy("shingle")
        .agg(F.count("*").alias("df_"))
        .localCheckpoint(eager=False)
    )
    # ONE pass over the tagged stream: doc stats + the doc's own cold
    # shingle array + its hot set, all from a single groupBy(doc_id)
    per_doc = (
        shingles.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum((F.col("df_") > max_doc_freq).cast("long")).alias("n_hot_sh"),
            F.collect_list(
                F.when(F.col("df_") <= max_doc_freq, F.col("shingle"))
            ).alias("cold_shingles"),
            F.collect_list(
                F.when(F.col("df_") > max_doc_freq, F.col("shingle"))
            ).alias("hot_set"),
        )
        .localCheckpoint(eager=False)
    )
    cold_post = (
        per_doc.select(
            "doc_id", "n_sh", "n_hot_sh", F.explode("cold_shingles").alias("shingle")
        )
        .groupBy("shingle")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "n_sh", "n_hot_sh"))
            ).alias("docs")
        )
    )
    pair_expr = F.expr(
        "flatten(transform(docs, (x, i) -> "
        "  transform(slice(docs, i + 2, size(docs) - i - 1), "
        "            y -> named_struct('a', x, 'b', y))))"
    )
    exploded = cold_post.select(F.explode(pair_expr).alias("p"))
    if keep_ub is not None:
        exploded = exploded.where(
            keep_ub(
                F.least("p.a.n_sh", "p.b.n_sh"),
                F.col("p.a.n_sh"),
                F.col("p.b.n_sh"),
            )
        )
    cold_common = (
        exploded.groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.n_sh").alias("n_a"),
            F.col("p.b.n_sh").alias("n_b"),
            F.col("p.a.n_hot_sh").alias("n_hot_a"),
            F.col("p.b.n_hot_sh").alias("n_hot_b"),
        ).agg(F.count("*").alias("n_cold"))
    )
    if keep_ub is not None:
        ub = F.col("n_cold") + F.least("n_hot_a", "n_hot_b")
        cold_common = cold_common.where(keep_ub(ub, F.col("n_a"), F.col("n_b")))
    hot_sets = per_doc.where(F.col("n_hot_sh") > 0).select("doc_id", "hot_set")
    return (
        cold_common.join(
            hot_sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hot_set", "hot_a"),
            "doc_a",
            "left",
        )
        .join(
            hot_sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hot_set", "hot_b"),
            "doc_b",
            "left",
        )
        .withColumn(
            "n_hot",
            F.when(
                F.col("hot_a").isNotNull() & F.col("hot_b").isNotNull(),
                F.size(F.array_intersect("hot_a", "hot_b")),
            ).otherwise(F.lit(0)),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_cold") + F.col("n_hot")).alias("n_common"),
            "n_a",
            "n_b",
        )
    )


spark = get_spark(app_name="ab-onepass")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.limit(10).write.format("noop").mode("overwrite").save()


def finish(stats):
    return stats.where(
        F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")) >= threshold
    )


def run_cur():
    return finish(_guarded_pair_stats(word_shingles(docs), DEFAULT_MAX_DOC_FREQ, keep_ub=keep))


def run_new():
    return finish(onepass_stats(word_shingles(docs), DEFAULT_MAX_DOC_FREQ, keep_ub=keep))


a = run_cur().select("doc_a", "doc_b", "n_common", "n_a", "n_b")
b = run_new().select("doc_a", "doc_b", "n_common", "n_a", "n_b")
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print(f"pair-set symmetric diff rows: {diff}", flush=True)

walls = {"cur": [], "new": []}
for r in range(reps):
    order = (("cur", run_cur), ("new", run_new)) if r % 2 == 0 else (
        ("new", run_new), ("cur", run_cur))
    for name, fn in order:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        walls[name].append(time.perf_counter() - t0)
for name, ws in walls.items():
    print(f"{name:4s} min {min(ws):.3f}  all {[round(w,3) for w in ws]}")
spark.stop()
