#!/usr/bin/env python
"""A/B: documents loaded as-is (1 input partition at fixture scale)
vs hash-repartitioned to defaultParallelism on doc_id before the
per-doc CPU work (regex tokenize/shingle/quality). Measures the three
round-13 target queries end-to-end, caches cleared per pass."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.operators import corpus, dedup
from mapreduce_golang_spark.operators.graph import dup_cluster_size_hist

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(app_name="ab-widen-docs")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10).write.format("noop").mode(
    "overwrite"
).save()


def docs_narrow():
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def docs_wide():
    d = docs_narrow()
    n = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < n:
        d = d.repartition(n, "doc_id")
    return d


def pairs_of(d):
    return dedup.ngram_jaccard_pairs(d).localCheckpoint(eager=True)


QUERIES = {
    "ngram_jaccard_pairs": lambda d: dedup.ngram_jaccard_pairs(d),
    "dup_cluster_size_hist": lambda d: dup_cluster_size_hist(d, pairs=pairs_of(d)),
    "corpus_funnel_report": lambda d: corpus.corpus_funnel_report(d, pairs=pairs_of(d)),
}

walls: dict[str, list[float]] = {}
for r in range(reps):
    arms = (("narrow", docs_narrow), ("wide", docs_wide))
    if r % 2:
        arms = arms[::-1]
    for arm, loader in arms:
        for qname, q in QUERIES.items():
            t0 = time.perf_counter()
            q(loader()).write.format("noop").mode("overwrite").save()
            walls.setdefault(f"{arm}:{qname}", []).append(time.perf_counter() - t0)
for key in sorted(walls):
    ws = walls[key]
    print(f"{key:35s} min {min(ws):.3f}  all {[round(w,3) for w in ws]}")
spark.stop()
