"""A/B: graph-loop convergence/setup counts as observed metrics riding
the checkpoint job (NEW, round 15) vs separate count() jobs after each
eager localCheckpoint (OLD, r11-r14 shape).

Isolates the LOOPS: the pair graph is derived once, checkpointed, and
passed to both forms. Interleaved min-of-N, outputs asserted identical.
Run alone on an idle host.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.operators import dedup, graph
from mapreduce_golang_spark.operators.dedup import (
    GRAPH_BROADCAST_MAX_ROWS,
    GRAPH_ROWS_PER_PARTITION,
)
from mapreduce_golang_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 6


def old_right_size_counted(df, key, min_parts=4, max_parts=2048):
    d = df.localCheckpoint(eager=True)
    n = d.count()
    k = int(max(min_parts, min(max_parts, n // GRAPH_ROWS_PER_PARTITION + 1)))
    if k != d.rdd.getNumPartitions():
        d = d.repartition(k, key).localCheckpoint(eager=True)
    return d, n


def old_components(df: DataFrame, pairs: DataFrame, max_iter: int = 15) -> DataFrame:
    edges = old_right_size_counted(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        ),
        "v",
    )[0]
    labels, n_labels = old_right_size_counted(
        edges.select("u").distinct().withColumn("label", F.col("u")), "u"
    )
    small = n_labels <= GRAPH_BROADCAST_MAX_ROWS

    def bc(t):
        return F.broadcast(t) if small else t

    def hop(lab):
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
    assert changed == 0
    return (
        df.select(F.col("doc_id").alias("u"))
        .join(bc(labels), "u", "left")
        .select(
            F.col("u").alias("doc_id"),
            F.coalesce("label", F.col("u")).alias("component_id"),
        )
    )


def old_kcore(df: DataFrame, pairs: DataFrame, k: int = 2, max_rounds: int = 10) -> DataFrame:
    edges, n_edges = old_right_size_counted(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct(),
        "u",
    )
    small = n_edges <= GRAPH_BROADCAST_MAX_ROWS

    def bc(t):
        return F.broadcast(t) if small else t

    def prune(e):
        keep = (
            e.groupBy("u").agg(F.count("*").alias("deg")).where(F.col("deg") >= k).select("u")
        )
        return (
            e.join(bc(keep), "u", "left_semi")
            .join(bc(keep.withColumnRenamed("u", "v")), "v", "left_semi")
            .select("u", "v")
        )

    for _ in range(max_rounds):
        if n_edges == 0:
            break
        pruned = prune(edges).localCheckpoint(eager=True)
        n_pruned = pruned.count()
        if n_pruned == n_edges:
            break
        edges, n_edges = pruned, n_pruned
    return (
        edges.groupBy("u")
        .agg(F.count("*").cast("long").alias("core_degree"))
        .select(F.col("u").alias("doc_id"), "core_degree")
    )


def old_pagerank(df: DataFrame, pairs: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    iterations, damping = graph.PAGERANK_ITERATIONS, graph.PAGERANK_DAMPING
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
    )
    edges = old_right_size_counted(
        sym.withColumn("deg", F.count("*").over(Window.partitionBy("u"))), "u"
    )[0]
    nodes = edges.select(F.col("u").alias("node")).distinct()
    n_nodes = nodes.count()
    small = n_nodes <= GRAPH_BROADCAST_MAX_ROWS
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for step in range(iterations):
        ranks = (
            edges.join(
                F.broadcast(ranks.withColumnRenamed("node", "u")) if small
                else ranks.withColumnRenamed("node", "u"),
                "u",
            )
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg((F.lit(base) + damping * F.sum("c")).alias("rank"))
        )
        if step % 2 == 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank"))


def main():
    spark = get_spark(app_name="ab-observe-counts")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    docs.limit(10).write.format("noop").mode("overwrite").save()
    pairs = dedup.ngram_jaccard_pairs(docs).localCheckpoint(eager=True)

    cases = {
        "components": (
            lambda: old_components(docs, pairs),
            lambda: dedup.near_dup_components(docs, pairs=pairs),
        ),
        "kcore": (
            lambda: old_kcore(docs, pairs),
            lambda: graph.kcore_docs(docs, pairs=pairs),
        ),
        "pagerank": (
            lambda: old_pagerank(docs, pairs),
            lambda: graph.near_dup_pagerank(docs, pairs=pairs),
        ),
    }
    for name, (old, new) in cases.items():
        a = sorted(tuple(r) for r in old().collect())
        b = sorted(tuple(r) for r in new().collect())
        assert a == b, f"{name}: outputs differ"
        print(f"{name}: outputs identical ({len(a)} rows)")

    for name, (old, new) in cases.items():
        walls = {"old": [], "new": []}
        for _ in range(N):
            for label, build in (("old", old), ("new", new)):
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                walls[label].append(time.perf_counter() - t0)
        for label, w in walls.items():
            w2 = sorted(w)
            print(
                f"{name} {label}: min {w2[0]:.3f}  med {w2[len(w2)//2]:.3f}"
                f"  all {[round(x, 3) for x in w]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
