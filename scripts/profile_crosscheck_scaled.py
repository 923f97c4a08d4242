"""Phase profile of minhash_ml_crosscheck(num_features=None) — the
round-15 verdict item #3 target (window's most expensive query).

Times each leg with the noop sink, min-of-N interleaved where it
matters, and reports the corpus-scaled numFeatures the sizing pass
derives. Run alone on an idle host.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.operators import dedup
from mapreduce_golang_spark.operators.dedup import (
    _minhash_band_candidates,
    _jaccard_for_pairs,
    word_shingles,
)
from mapreduce_golang_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=3):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    print(f"{label:45s} min {min(walls):6.3f}  med {sorted(walls)[len(walls)//2]:6.3f}  (n={n})")
    return min(walls)


def main():
    spark = get_spark(app_name="profile-crosscheck")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    noop(docs.limit(10))  # warmup

    # --- phase 0: shingles + sizing -------------------------------
    def sizing():
        sh = word_shingles(docs).localCheckpoint(eager=False)
        n = sh.agg(F.approx_count_distinct("shingle").alias("n")).first()["n"]
        return n

    t0 = time.perf_counter()
    n_distinct = sizing()
    print(f"sizing pass (cold): {time.perf_counter()-t0:.3f} s, n_distinct={n_distinct}")
    nf_scaled = max(1 << 18, min(1 << 30, 1 << (4 * max(n_distinct, 1) - 1).bit_length()))
    print(f"numFeatures scaled = {nf_scaled} (2^{nf_scaled.bit_length()-1}) vs default 2^18={1<<18}")

    from pyspark.ml.feature import HashingTF, MinHashLSH

    def ours_leg():
        sh = word_shingles(docs).localCheckpoint(eager=False)
        _, cand = _minhash_band_candidates(sh, 12, 4)
        ours = (
            _jaccard_for_pairs(cand, sh)
            .where(F.col("jaccard_raw") >= 0.5)
            .select("doc_a", "doc_b")
        )
        noop(ours)

    def lib_leg(nf):
        sh = word_shingles(docs).localCheckpoint(eager=False)
        sets_ = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("sh"))
        feats = HashingTF(inputCol="sh", outputCol="features", numFeatures=nf, binary=True).transform(sets_)
        model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=12, seed=42).fit(feats)
        lib = (
            model.approxSimilarityJoin(feats, feats, 0.5, distCol="jd")
            .select(F.col("datasetA.doc_id").alias("doc_a"), F.col("datasetB.doc_id").alias("doc_b"))
            .where(F.col("doc_a") < F.col("doc_b"))
            .distinct()
        )
        noop(lib)

    def full(nf):
        noop(dedup.minhash_ml_crosscheck(docs, num_features=nf))

    timed("ours leg (band cand + exact jaccard)", ours_leg)
    timed(f"lib leg nf=2^18", lambda: lib_leg(1 << 18))
    timed(f"lib leg nf={nf_scaled}", lambda: lib_leg(nf_scaled))
    timed("full crosscheck nf=2^18", lambda: full(1 << 18))
    timed("full crosscheck nf=None (scaled)", lambda: full(None))
    spark.stop()


if __name__ == "__main__":
    main()
