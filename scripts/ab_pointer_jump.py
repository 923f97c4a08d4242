#!/usr/bin/env python
"""Interleaved A/B for round-12 advice #2: in near_dup_components each
hop's pointer-jump ``lookup`` broadcast is built from the
UN-MATERIALIZED ``prop`` subtree, so on the small (broadcast) path the
propagation join + neighbor-min agg execute twice per hop — once as
the probe stream, once inside the broadcast build. Correctness is
unaffected (path-equality tests pin it); this measures whether
materializing ``prop`` (localCheckpoint per hop) buys anything at
fixture scale, or whether the double-compute is cheaper than the extra
materialization job per hop (the same mechanism that made the fused
2-hop job slower in round 12).

Arms share the SAME materialized pair graph so the loop is isolated.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.operators.dedup import (
    GRAPH_BROADCAST_MAX_ROWS,
    near_dup_components,
    ngram_jaccard_pairs,
    right_size_graph,
    right_size_graph_counted,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

spark = get_spark(app_name="ab-pointer-jump")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.limit(10).write.format("noop").mode("overwrite").save()
pairs = ngram_jaccard_pairs(docs).localCheckpoint(eager=True)
print(f"pair graph: {pairs.count()} edges", flush=True)


def components_matprop(df: DataFrame, pairs: DataFrame, max_iter: int = 15) -> DataFrame:
    """near_dup_components with prop MATERIALIZED before the pointer
    jump (the advice's first remedy) — otherwise identical."""
    edges = right_size_graph(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        ),
        "v",
    )
    labels, n_labels = right_size_graph_counted(
        df.select(F.col("doc_id").alias("u")).withColumn("label", F.col("u")), "u"
    )
    small = n_labels <= GRAPH_BROADCAST_MAX_ROWS

    def bc(t: DataFrame) -> DataFrame:
        return F.broadcast(t) if small else t

    def hop(lab: DataFrame) -> DataFrame:
        neighbor_min = (
            edges.join(bc(lab.select(F.col("u").alias("v"), "label")), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        prop = lab.join(bc(neighbor_min), "u", "left").select(
            "u", "old", F.least("label", F.coalesce("nmin", "label")).alias("label")
        ).localCheckpoint(eager=False)  # <-- the A/B delta
        lookup = prop.select(F.col("u").alias("label"), F.col("label").alias("ll"))
        return prop.join(bc(lookup), "label", "left").select(
            "u", "old", F.least("label", F.coalesce("ll", "label")).alias("label")
        )

    changed = -1
    for _ in range(max_iter):
        stepped = hop(labels.select("u", F.col("label").alias("old"), "label"))
        new_labels = stepped.select(
            "u", "label", (F.col("label") != F.col("old")).alias("moved")
        ).localCheckpoint(eager=True)
        changed = new_labels.where("moved").count()
        labels = new_labels.select("u", "label")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError("no convergence")
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("component_id"))


a = sorted(map(tuple, near_dup_components(docs, pairs=pairs).collect()))
b = sorted(map(tuple, components_matprop(docs, pairs).collect()))
print(f"results identical: {a == b} ({len(a)} rows)", flush=True)

walls = {"asis": [], "matprop": []}
arms = {
    "asis": lambda: near_dup_components(docs, pairs=pairs),
    "matprop": lambda: components_matprop(docs, pairs),
}
for r in range(reps):
    names = list(arms) if r % 2 == 0 else list(arms)[::-1]
    for name in names:
        t0 = time.perf_counter()
        arms[name]().write.format("noop").mode("overwrite").save()
        walls[name].append(time.perf_counter() - t0)
for name, ws in walls.items():
    print(f"{name:8s} min {min(ws):.3f}  all {[round(w,3) for w in ws]}")
spark.stop()
