#!/usr/bin/env python
"""Round-14 candidate A/Bs, interleaved min-of-N with exact output
equality (the round-13 A/B-before-believing discipline):

  A. bootstrap_mean_ci — widen_for_cpu(events) before the ×b explode
     (the expand + mixer + decimal partial agg currently run on the
     single parquet split of events.parquet).
  B. order_reconciliation_audit — widen_for_cpu(lineitem, l_orderkey)
     before the per-order decimal collapse (same single-split serial
     map; the groupBy reuses the widen exchange since both hash on
     l_orderkey at shuffle.partitions width).
  C. embedding_pca_topvar — eager-checkpoint the 64-row eigenvector
     between power iterations: the current plan nests 8 un-materialized
     broadcast builds and the final aggregate rebuilds the whole chain
     TWICE (vi and vj project differently, so no exchange reuse).
  D. sql_scripting_coverage_threshold — per-iteration full-table scan
     replaced by one pow2-bucket histogram (CACHE TABLE) the WHILE loop
     reads; frac arithmetic provably bit-identical (exact integer
     counts in double space).

Usage: python scripts/ab_r14_quartet.py [reps] [which: ABCD]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
which = sys.argv[2] if len(sys.argv) > 2 else "ABCD"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mapreduce_golang_spark.functions.tokenize import widen_for_cpu
from mapreduce_golang_spark.operators import analytics, similarity
from mapreduce_golang_spark.functions import sql_surface
from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.sources.tables import load_table

spark = get_spark(app_name="ab-r14-quartet")
spark.sparkContext.setLogLevel("ERROR")
entrymod.queries()["wc"](spark, sf_dir).write.format("noop").mode("overwrite").save()


# --- A: bootstrap widen -----------------------------------------------------
def bootstrap_new(events: DataFrame, b: int = analytics.BOOTSTRAP_REPLICATES) -> DataFrame:
    rep = widen_for_cpu(events, key_col="event_id").select(
        "event_type",
        "event_id",
        "value",
        F.explode(F.expr(f"sequence(1, {b})")).alias("bi"),
    ).select(
        "event_type",
        "bi",
        "value",
        F.expr(
            "CASE CAST(floor((event_id * 2654435761 + bi * 40503) / 256) AS BIGINT) % 4 "
            "WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 1 END"
        ).alias("w"),
    )
    means = (
        rep.groupBy("event_type", "bi")
        .agg(
            F.sum(F.col("w") * F.col("value").cast("decimal(18,6)")).alias("swv"),
            F.sum("w").cast("long").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select(
            "event_type",
            F.round(F.col("swv").cast("double") / F.col("sw"), 6).alias("m"),
        )
    )
    return means.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_boot"),
        F.round(
            F.sum(F.col("m").cast("decimal(12,6)")).cast("double") / F.count("*"), 6
        ).alias("boot_mean"),
        F.round(F.percentile("m", F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.975)), 6).alias("ci_hi"),
    )


# --- B: reconciliation widen ------------------------------------------------
def recon_new(orders: DataFrame, lineitem: DataFrame, tolerance: float = 0.01) -> DataFrame:
    per_order = widen_for_cpu(lineitem, key_col="l_orderkey").groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1.0 - F.col("l_discount"))
                * (1.0 + F.col("l_tax")),
                2,
            ).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("calc")
    )
    joined = orders.select("o_orderkey", "o_orderstatus", "o_totalprice").join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "left"
    )
    diff = F.round(F.abs(F.col("o_totalprice") - F.col("calc")), 2)
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count("calc").cast("long").alias("n_with_lines"),
            F.sum(F.col("calc").isNull().cast("long")).cast("long").alias("n_orphan"),
            F.sum((diff <= tolerance).cast("long")).cast("long").alias("n_reconciled"),
            F.round(
                F.sum((diff <= tolerance).cast("long")) / F.count("calc"), 6
            ).alias("reconcile_rate"),
            F.round(F.percentile(diff, F.lit(0.5)), 6).alias("p50_abs_diff"),
            F.round(F.max(diff), 2).alias("max_abs_diff"),
        )
        .orderBy("o_orderstatus")
    )


# --- C: pca checkpointed iterations ------------------------------------------
def pca_new(embeddings: DataFrame, n_iters: int = 8) -> DataFrame:
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
        ).localCheckpoint(eager=True)  # d rows; flat chain instead of nested rebuilds
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


# --- D: scripting over a cached pow2 histogram --------------------------------
def scripting_new(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql_script_orders_v")
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE thr DOUBLE DEFAULT 1.0;
              DECLARE frac DOUBLE DEFAULT 0.0;
              DECLARE total DOUBLE DEFAULT 0.0;
              DROP VIEW IF EXISTS sql_script_hist_v;
              CACHE TABLE sql_script_hist_v AS
                SELECT CAST(o_totalprice AS DOUBLE) <= 0.0 AS nonpos,
                       CAST(ceil(log2(greatest(CAST(o_totalprice AS DOUBLE), 1e-300))) AS BIGINT) AS b,
                       CAST(count(*) AS DOUBLE) AS n
                FROM sql_script_orders_v
                GROUP BY 1, 2;
              SET total = (SELECT sum(n) FROM sql_script_hist_v);
              WHILE frac < 0.9 DO
                SET thr = thr * 2;
                SET frac = (SELECT coalesce(sum(n), 0.0)
                            FROM sql_script_hist_v
                            WHERE nonpos OR b <= CAST(round(log2(thr)) AS BIGINT)) / total;
              END WHILE;
              UNCACHE TABLE sql_script_hist_v;
              DROP VIEW IF EXISTS sql_script_hist_v;
              SELECT CAST(thr AS DOUBLE) AS threshold,
                     round(frac, 6) AS covered_frac;
            END
            """
        )
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


def rows(df: DataFrame):
    return sorted([tuple(r) for r in df.collect()])


def ab(name, make_old, make_new):
    old_rows = rows(make_old())
    new_rows = rows(make_new())
    same = old_rows == new_rows
    print(f"{name}: outputs identical = {same}")
    if not same:
        print("  OLD:", old_rows[:5])
        print("  NEW:", new_rows[:5])
        return
    walls = {"old": [], "new": []}
    for r in range(reps):
        order = [("old", make_old), ("new", make_new)]
        if r % 2:
            order.reverse()
        for tag, mk in order:
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            walls[tag].append(time.perf_counter() - t0)
    for tag in ("old", "new"):
        ws = walls[tag]
        print(
            f"  {tag}: min {min(ws):.2f}  med {statistics.median(ws):.2f}  max {max(ws):.2f}"
        )


ev = load_table(spark, sf_dir, "events")
li = load_table(spark, sf_dir, "lineitem")
od = load_table(spark, sf_dir, "orders")
emb = load_table(spark, sf_dir, "embeddings")

if "A" in which:
    ab("A bootstrap_mean_ci", lambda: analytics.bootstrap_mean_ci(ev), lambda: bootstrap_new(ev))
if "B" in which:
    ab(
        "B order_reconciliation_audit",
        lambda: analytics.order_reconciliation_audit(od, li),
        lambda: recon_new(od, li),
    )
if "C" in which:
    ab(
        "C embedding_pca_topvar",
        lambda: similarity.embedding_pca_topvar(emb),
        lambda: pca_new(emb),
    )
if "D" in which:
    ab(
        "D sql_scripting_coverage_threshold",
        lambda: sql_surface.sql_scripting_coverage_threshold(spark, sf_dir),
        lambda: scripting_new(spark, sf_dir),
    )

spark.stop()
