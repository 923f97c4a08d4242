#!/usr/bin/env python
"""Round-14 C variants for embedding_pca_topvar:
   old  — current code
   C2   — widen_for_cpu(embeddings) before the d-squared in-row expansion
          (the posexplode x posexplode + partial agg run on the single
          fixture split otherwise)
   C3   — C2 + eager-checkpointed power iterations
Interleaved min-of-N, outputs must be identical."""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mapreduce_golang_spark.functions.tokenize import widen_for_cpu
from mapreduce_golang_spark.operators import similarity
from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.sources.tables import load_table

spark = get_spark(app_name="ab-pca-widen")
spark.sparkContext.setLogLevel("ERROR")
entrymod.queries()["wc"](spark, sf_dir).write.format("noop").mode("overwrite").save()


def pca_variant(embeddings: DataFrame, n_iters: int = 8, widen: bool = True, ckpt: bool = False) -> DataFrame:
    if widen:
        embeddings = widen_for_cpu(embeddings, key_col="vec_id")
    e = F.col("embedding").cast("array<double>")
    comp = embeddings.select(F.col("vec_id"), F.posexplode(e).alias("i", "xi"), e.alias("_e"))
    pairs = comp.select("i", "xi", F.posexplode("_e").alias("j", "xj"))
    s = pairs.groupBy("i", "j").agg(
        F.sum(F.col("xi") * F.col("xj")).alias("s"), F.count("*").alias("n")
    )
    mu = embeddings.select(F.posexplode(e).alias("i", "xi")).groupBy("i").agg(
        F.avg("xi").alias("mu")
    )
    cov = (
        s.join(F.broadcast(mu.select(F.col("i"), F.col("mu").alias("mu_i"))), "i")
        .join(F.broadcast(mu.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))), "j")
        .select(
            "i",
            "j",
            ((F.col("s") - F.col("n") * F.col("mu_i") * F.col("mu_j")) / (F.col("n") - 1)).alias("c"),
            "n",
        )
        .localCheckpoint(eager=False)
    )
    wall = Window.partitionBy()
    v = (
        cov.select("i")
        .distinct()
        .select("i", (F.lit(1.0) / F.sqrt(F.count("*").over(wall))).alias("v"))
    )
    for _ in range(n_iters):
        w = (
            cov.join(F.broadcast(v.select(F.col("i").alias("j"), "v")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )
        v = w.select(
            "i", (F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(wall))).alias("v")
        )
        if ckpt:
            v = v.localCheckpoint(eager=True)
    return (
        cov.join(F.broadcast(v.select(F.col("i"), F.col("v").alias("vi"))), "i")
        .join(F.broadcast(v.select(F.col("i").alias("j"), F.col("v").alias("vj"))), "j")
        .agg(
            F.max("n").cast("long").alias("n_vectors"),
            F.count_distinct("i").cast("long").alias("dim"),
            F.round(F.sum(F.when(F.col("i") == F.col("j"), F.col("c")).otherwise(0.0)), 6).alias("trace"),
            F.round(F.sum(F.col("c") * F.col("vi") * F.col("vj")), 6).alias("top_eigenvalue"),
        )
        .select(
            "n_vectors",
            "dim",
            "trace",
            "top_eigenvalue",
            F.round(F.col("top_eigenvalue") / F.col("trace"), 6).alias("explained_ratio"),
        )
        .where(F.col("n_vectors").isNotNull())
    )


emb = load_table(spark, sf_dir, "embeddings")
variants = {
    "old": lambda: similarity.embedding_pca_topvar(emb),
    "C2w": lambda: pca_variant(emb, widen=True, ckpt=False),
    "C3wc": lambda: pca_variant(emb, widen=True, ckpt=True),
}

base = sorted(map(tuple, variants["old"]().collect()))
for tag, mk in variants.items():
    got = sorted(map(tuple, mk().collect()))
    print(f"{tag}: identical = {got == base}")

walls = {t: [] for t in variants}
names = list(variants)
for r in range(reps):
    order = names if r % 2 == 0 else names[::-1]
    for tag in order:
        gc.collect()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        variants[tag]().write.format("noop").mode("overwrite").save()
        walls[tag].append(time.perf_counter() - t0)
for tag in names:
    ws = walls[tag]
    print(f"{tag}: min {min(ws):.2f}  med {statistics.median(ws):.2f}  max {max(ws):.2f}")
spark.stop()
