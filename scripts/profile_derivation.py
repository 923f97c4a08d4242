#!/usr/bin/env python
"""Stage-level profiler for the shared shingle→postings→pair
derivation (round-13 verdict #2). Times each materialization boundary
of ngram_jaccard_pairs' guarded path in ONE fresh session, caches
cleared, so the increments attribute wall to stages:

  t0 shingle checkpoint   (word_shingles + localCheckpoint)
  t1 freq checkpoint      (groupBy shingle)
  t2 doc_stats            (shingles⋈freq → groupBy doc)
  t3 cold postings agg    (join + collect_list structs)
  t4 pair explode + agg   (cold_common)
  t5 hot sets + verify    (full pairs result)

Each timed via .write(noop) of the cumulative prefix, so t_k includes
t_{k-1}'s lineage EXCEPT what the lazy localCheckpoints materialized
(they cache on first action). Run twice; read the second block (warm
JIT), deltas between cumulative walls are the stage costs.
"""
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
    ngram_jaccard_pairs,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="profile-derivation")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.limit(10).write.format("noop").mode("overwrite").save()  # warmup

def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    w = time.perf_counter() - t0
    print(f"{label:28s} {w:7.3f} s", flush=True)
    return w

cap = DEFAULT_MAX_DOC_FREQ
for rep in range(2):
    print(f"--- rep {rep} ---")
    total0 = time.perf_counter()
    shingles = word_shingles(docs).localCheckpoint(eager=False)
    t("shingles checkpoint", shingles)
    freq = (
        shingles.groupBy("shingle").agg(F.count("*").alias("df_")).localCheckpoint(eager=False)
    )
    t("freq checkpoint", freq)
    doc_stats = (
        shingles.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum((F.col("df_") > cap).cast("long")).alias("n_hot_sh"),
        )
    )
    t("doc_stats", doc_stats)
    cold_post = (
        shingles.join(freq.where(F.col("df_") <= cap).select("shingle"), "shingle")
        .join(doc_stats, "doc_id")
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh", "n_hot_sh"))).alias("docs"))
    )
    t("cold postings", cold_post)
    pair_expr = F.expr(
        "flatten(transform(docs, (x, i) -> "
        "  transform(slice(docs, i + 2, size(docs) - i - 1), "
        "            y -> named_struct('a', x, 'b', y))))"
    )
    exploded = cold_post.select(F.explode(pair_expr).alias("p"))
    cold_common = (
        exploded.groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
        ).agg(F.count("*").alias("n_cold"))
    )
    t("pair explode+agg", cold_common)
    print(f"{'(cumulative above)':28s} {time.perf_counter()-total0:7.3f} s")
    t("FULL ngram_jaccard_pairs", ngram_jaccard_pairs(docs))
spark.stop()
