"""A/B: minhash_ml_crosscheck per-doc shingle-set table built once and
shared between the exact-Jaccard verify and HashingTF (NEW, round 15)
vs each leg re-aggregating the shingle stream (OLD, r13/r14 shape).

Interleaved min-of-N, outputs asserted identical (the query returns
one summary row). Run alone on an idle host.
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
from mapreduce_golang_spark.operators import dedup
from mapreduce_golang_spark.operators.dedup import (
    _jaccard_for_pairs,
    _minhash_band_candidates,
    word_shingles,
)
from mapreduce_golang_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 6


def old_crosscheck(df: DataFrame, num_features=None) -> DataFrame:
    """The r13/r14 form: independent set aggregations per leg."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    k, n_hashes, bands, threshold, seed = 3, 12, 4, 0.5, 42
    shingles = word_shingles(df, k=k).localCheckpoint(eager=False)
    if num_features is None:
        n_distinct = shingles.agg(F.approx_count_distinct("shingle").alias("n")).first()["n"]
        num_features = max(1 << 18, min(1 << 30, 1 << (4 * max(n_distinct, 1) - 1).bit_length()))
    _, cand = _minhash_band_candidates(shingles, n_hashes, bands)
    ours = (
        _jaccard_for_pairs(cand, shingles)
        .where(F.col("jaccard_raw") >= threshold)
        .select("doc_a", "doc_b")
    )
    sets_ = shingles.groupBy("doc_id").agg(F.collect_list("shingle").alias("sh"))
    feats = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=num_features, binary=True
    ).transform(sets_)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=n_hashes, seed=seed
    ).fit(feats)
    lib = (
        model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="jd")
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    both = (
        ours.withColumn("m", F.lit(1)).join(
            lib.withColumn("l", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
        )
    )
    n_ours = F.coalesce(F.sum(F.coalesce(F.col("m"), F.lit(0))), F.lit(0))
    n_lib = F.coalesce(F.sum(F.coalesce(F.col("l"), F.lit(0))), F.lit(0))
    n_common = F.coalesce(
        F.sum((F.col("m").isNotNull() & F.col("l").isNotNull()).cast("int")), F.lit(0)
    )
    n_union = F.count("*")
    return both.agg(
        n_ours.cast("long").alias("n_ours"),
        n_lib.cast("long").alias("n_lib"),
        n_common.cast("long").alias("n_common"),
        F.round(
            F.when(n_union > 0, n_common / n_union).otherwise(F.lit(1.0)), 6
        ).alias("agreement"),
    )


def main():
    spark = get_spark(app_name="ab-crosscheck-sets")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    docs.limit(10).write.format("noop").mode("overwrite").save()

    ref = old_crosscheck(docs).collect()
    new = dedup.minhash_ml_crosscheck(docs, num_features=None).collect()
    assert [tuple(r) for r in ref] == [tuple(r) for r in new], (ref, new)
    print("outputs identical:", [tuple(r) for r in new])

    walls = {"old": [], "new": []}
    for i in range(N):
        for label, build in (
            ("old", lambda: old_crosscheck(docs)),
            ("new", lambda: dedup.minhash_ml_crosscheck(docs, num_features=None)),
        ):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            walls[label].append(time.perf_counter() - t0)
    for label, w in walls.items():
        w2 = sorted(w)
        print(f"{label}: min {w2[0]:.3f}  med {w2[len(w2)//2]:.3f}  all {[round(x,3) for x in w]}")
    spark.stop()


if __name__ == "__main__":
    main()
