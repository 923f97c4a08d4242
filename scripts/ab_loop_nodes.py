#!/usr/bin/env python
"""A/B (round 13): restrict the components label-propagation loop to
PAIR-GRAPH NODES instead of every doc. A doc with no near-dup edge can
never change labels — it is a singleton by construction — so carrying
the whole corpus through every hop's joins/checkpoint/convergence
count is pure waste: at fixture scale ~5 000 rows/hop vs ~400 graph
nodes; at 100 TB it is the difference between shuffling the corpus
per hop and shuffling only the dup-graph. Singletons join back ONCE
after convergence (left join + coalesce(label, u)).

Checks identical outputs first, then interleaved min-of-N on
(components alone, dup_cluster_size_hist composition).
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

spark = get_spark(app_name="ab-loop-nodes")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.limit(10).write.format("noop").mode("overwrite").save()
pairs = ngram_jaccard_pairs(docs).localCheckpoint(eager=True)
print(f"pair graph: {pairs.count()} edges", flush=True)


def components_nodes_only(df: DataFrame, pairs: DataFrame, max_iter: int = 15) -> DataFrame:
    edges = right_size_graph(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        ),
        "v",
    )
    labels, n_labels = right_size_graph_counted(
        edges.select("u").distinct().withColumn("label", F.col("u")), "u"
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
        )
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
    # singletons (no edges) rejoin once, after the loop
    return df.select(F.col("doc_id").alias("u")).join(bc(labels), "u", "left").select(
        F.col("u").alias("doc_id"),
        F.coalesce("label", F.col("u")).alias("component_id"),
    )


def hist_of(comp: DataFrame) -> DataFrame:
    sizes = comp.groupBy("component_id").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count("*").cast("long").alias("n_clusters"))


a = sorted(map(tuple, near_dup_components(docs, pairs=pairs).collect()))
b = sorted(map(tuple, components_nodes_only(docs, pairs).collect()))
print(f"results identical: {a == b} ({len(a)} rows)", flush=True)

arms = {
    "asis": lambda: near_dup_components(docs, pairs=pairs),
    "nodes": lambda: components_nodes_only(docs, pairs),
    "asis_hist": lambda: hist_of(near_dup_components(docs, pairs=pairs)),
    "nodes_hist": lambda: hist_of(components_nodes_only(docs, pairs)),
}
walls = {k: [] for k in arms}
names = list(arms)
for r in range(reps):
    order = names if r % 2 == 0 else names[::-1]
    for name in order:
        t0 = time.perf_counter()
        arms[name]().write.format("noop").mode("overwrite").save()
        walls[name].append(time.perf_counter() - t0)
for name, ws in walls.items():
    print(f"{name:10s} min {min(ws):.3f}  all {[round(w,3) for w in ws]}")
spark.stop()
