#!/usr/bin/env python
"""Interleaved A/B: string-shingle vs xxhash64-keyed guarded pair
stats (round-13 verdict #2). Also checks collision-freedom of
xxhash64 over the fixture's distinct shingles and that both variants
produce identical pair sets."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.operators.dedup import (
    DEFAULT_MAX_DOC_FREQ,
    _guarded_pair_stats,
    word_shingles,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
spark = get_spark(app_name="ab-hashkeys")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.limit(10).write.format("noop").mode("overwrite").save()

threshold = 0.5
keep = lambda ub, n_a, n_b: ub / (n_a + n_b - ub) >= threshold

def run_str():
    sh = word_shingles(docs)
    stats = _guarded_pair_stats(sh, DEFAULT_MAX_DOC_FREQ, keep_ub=keep)
    return stats.where(
        F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")) >= threshold
    )

def run_hash():
    sh = word_shingles(docs).select("doc_id", F.xxhash64("shingle").alias("shingle"))
    stats = _guarded_pair_stats(sh, DEFAULT_MAX_DOC_FREQ, keep_ub=keep)
    return stats.where(
        F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")) >= threshold
    )

# collision check over the fixture
sh = word_shingles(docs)
n_str, n_hash = sh.agg(
    F.countDistinct("shingle"), F.countDistinct(F.xxhash64("shingle"))
).first()
print(f"distinct shingles {n_str}, distinct xxhash64 {n_hash}, collisions {n_str - n_hash}")

# identical outputs
a = run_str().select("doc_a", "doc_b", "n_common", "n_a", "n_b")
b = run_hash().select("doc_a", "doc_b", "n_common", "n_a", "n_b")
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print(f"pair-set symmetric diff rows: {diff}")

walls = {"str": [], "hash": []}
for r in range(reps):
    for name, fn in (("str", run_str), ("hash", run_hash)) if r % 2 == 0 else (
        ("hash", run_hash), ("str", run_str)
    ):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        walls[name].append(time.perf_counter() - t0)
for name, ws in walls.items():
    print(f"{name:5s} min {min(ws):.3f}  all {[round(w,3) for w in ws]}")
spark.stop()
