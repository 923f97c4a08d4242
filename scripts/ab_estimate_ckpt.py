#!/usr/bin/env python
"""Round-14 A/B: minhash_estimate_error with the minhash table and the
candidate pair set localCheckpoint'ed (lazy), so the `agree` and
`true_j` legs read ONE materialized derivation instead of re-deriving
`cand` (mh agg + band self-join + distinct) on both sides of the final
join. The static plan shows the full derivation subtree twice with no
ReusedExchange; AQE *may* reuse the identical inner exchanges at
runtime (the r13 one-pass postings A/B found exactly that), so this
measures rather than assumes. Outputs must be bit-identical: md5
signatures are deterministic and checkpointing changes no values.

Usage: python scripts/ab_estimate_ckpt.py [reps]
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
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mapreduce_golang_spark.operators import dedup
from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.sources.tables import load_table

spark = get_spark(app_name="ab-estimate-ckpt")
spark.sparkContext.setLogLevel("ERROR")
entrymod.queries()["wc"](spark, sf_dir).write.format("noop").mode("overwrite").save()


def estimate_new(
    df: DataFrame,
    k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    shingles = dedup.word_shingles(df, k=k).localCheckpoint(eager=False)
    r = n_hashes // bands
    n_md5 = (n_hashes + 3) // 4
    hcols = [
        F.md5(F.concat(F.lit(str(g)), F.lit("#"), F.col("shingle"))).alias(f"h{g}")
        for g in range(n_md5)
    ]
    hashed = shingles.select("doc_id", *hcols)
    pieces = [
        F.substring(F.col(f"h{s // 4}"), (s % 4) * 8 + 1, 8) for s in range(n_hashes)
    ]
    mh = (
        hashed.select("doc_id", F.posexplode(F.array(*pieces)).alias("seed", "h"))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
        .localCheckpoint(eager=False)  # <- shared by cand AND both agree joins
    )
    band_sigs = (
        mh.withColumn("band", F.expr(f"seed DIV {r}"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda x: x["mh"]
                ),
                "|",
            ).alias("sig")
        )
    )
    ba = band_sigs.alias("ba")
    bb = band_sigs.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.sig") == F.col("bb.sig"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=False)  # <- shared by agree AND true_j
    )
    agree = (
        cand.join(mh.select(F.col("doc_id").alias("doc_a"), "seed", F.col("mh").alias("mh_a")), "doc_a")
        .join(
            mh.select(F.col("doc_id").alias("doc_b"), "seed", F.col("mh").alias("mh_b")),
            ["doc_b", "seed"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum((F.col("mh_a") == F.col("mh_b")).cast("long")).alias("n_agree"))
    )
    true_j = dedup._jaccard_for_pairs(cand, shingles)
    est = F.col("n_agree") / F.lit(float(n_hashes))
    return (
        agree.join(true_j, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round("jaccard_raw", 6).alias("jaccard"),
            F.round(F.abs(est - F.col("jaccard_raw")), 6).alias("abs_err"),
        )
    )


def rows(df: DataFrame):
    return sorted([tuple(r) for r in df.collect()])


docs = load_table(spark, sf_dir, "documents")

old_rows = rows(dedup.minhash_estimate_error(docs))
new_rows = rows(estimate_new(docs))
same = old_rows == new_rows
print(f"minhash_estimate_error ckpt: outputs identical = {same}  (n={len(old_rows)})")
if not same:
    print("  OLD:", old_rows[:5])
    print("  NEW:", new_rows[:5])
    sys.exit(1)

walls = {"old": [], "new": []}
for rr in range(reps):
    order = [("old", lambda: dedup.minhash_estimate_error(docs)), ("new", lambda: estimate_new(docs))]
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
