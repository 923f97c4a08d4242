#!/usr/bin/env python
"""Round-14 A/B: split_leakage_audit with the derived pair graph
localCheckpoint'ed ONCE (the near_dup_pipeline idiom, dedup.py:767).

Why this site and not the other pairs consumers: the components leg
eagerly materializes its right-sized EDGES in a separate job at
DataFrame-construction time, and separate jobs cannot share exchanges
(ReusedExchange is per-query) — so the ngram_jaccard_pairs derivation
runs once for the components setup and AGAIN for the two audit legs of
the final query (those two share via AQE runtime exchange reuse, as
the estimate-error A/B measured). Checkpointing pairs up front makes
every consumer read the one materialized table. Outputs identical by
construction (same pairs values, checkpoint changes nothing).

Usage: python scripts/ab_split_audit_ckpt.py [reps]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import DataFrame

import __spark_entry__ as entrymod
from mapreduce_golang_spark.operators import mixing
from mapreduce_golang_spark.operators.dedup import ngram_jaccard_pairs
from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.sources.tables import load_table

spark = get_spark(app_name="ab-split-audit-ckpt")
spark.sparkContext.setLogLevel("ERROR")
entrymod.queries()["wc"](spark, sf_dir).write.format("noop").mode("overwrite").save()


def audit_new(df: DataFrame) -> DataFrame:
    pairs = ngram_jaccard_pairs(df).localCheckpoint(eager=True)
    return mixing.split_leakage_audit(df, pairs=pairs)


def rows(df: DataFrame):
    return sorted([tuple(r) for r in df.collect()])


docs = load_table(spark, sf_dir, "documents")

old_rows = rows(mixing.split_leakage_audit(docs))
new_rows = rows(audit_new(docs))
same = old_rows == new_rows
print(f"split_leakage_audit ckpt: outputs identical = {same}  (n={len(old_rows)})")
if not same:
    print("  OLD:", old_rows[:5])
    print("  NEW:", new_rows[:5])
    sys.exit(1)

walls = {"old": [], "new": []}
for rr in range(reps):
    order = [
        ("old", lambda: mixing.split_leakage_audit(docs)),
        ("new", lambda: audit_new(docs)),
    ]
    if rr % 2:
        order.reverse()
    for tag, mk in order:
        gc.collect()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        walls[tag].append(time.perf_counter() - t0)
for tag in ("old", "new"):
    ws = walls[tag]
    print(f"  {tag}: min {min(ws):.2f}  med {statistics.median(ws):.2f}  max {max(ws):.2f}")

spark.stop()
