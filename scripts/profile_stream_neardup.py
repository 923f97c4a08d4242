#!/usr/bin/env python
"""Wall attribution for streaming_near_dup_docs (round-14 verdict #4:
5.8 s in the clean r13 pass, now the suite ceiling). The cold protocol
charges the query everything between first action and final collect;
this script splits that wall into its mechanism costs in ONE session:

  A. machinery  — the identical drain (availableNow → memory sink →
                  dropDuplicatesWithinWatermark at 8 shuffle
                  partitions) with the signature replaced by a TRIVIAL
                  key (doc_id as string): stream-source discovery,
                  micro-batch planning, state-store open/commit, sink.
  B. signature  — the exact signature expression computed by the BATCH
                  engine on the same file, noop sink: pure CPU cost of
                  shingle→md5→12 affine minhashes. Measured twice:
                  as-laid-out (the stream sees ONE parquet split → one
                  core) and widened to defaultParallelism.
  C. full query — streaming_near_dup_docs as shipped, memory-sink
                  count collected, per the bench protocol.

C − A − B(1-split) ≈ interaction residue; B(1-split) − B(wide) is the
recoverable CPU serialization IF the stream-side map could be spread.
Variants then measure the candidate knobs without touching the
shipped code path:

  D. repartition(doc_id) injected between source and signature —
     spreads the map at the cost of ONE extra exchange in the
     micro-batch (the stateful dedup shuffles anyway, so the map-side
     exchange is the only addition).
  E. drain shuffle partitions 2 / 8 / 32 — state-store count vs
     parallelism of the stateful operator itself.

min-of-N interleaved (host-timing discipline): each variant runs N
times round-robin so host drift hits all variants equally.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.streaming import events_stream as es

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4
spark = get_spark(app_name="profile-stream-neardup")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10).write.format(
    "noop"
).mode("overwrite").save()  # warm the JVM + parquet footer cache

_ctr = [0]


def drain(result, mode, parts="8"):
    _ctr[0] += 1
    name = f"prof_{_ctr[0]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = (
        spark.table(name)
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_unique_docs"))
        .collect()
    )
    spark.catalog.dropTempView(name)
    return out


def trivial_stream():
    docs = es.read_documents_stream(spark, sf_dir)
    keyed = docs.select(
        "doc_id",
        "source",
        F.col("doc_id").cast("string").alias("sig"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.col("doc_id"), F.lit(600_000))
        ).alias("ts"),
    )
    return (
        keyed.withWatermark("ts", "7 days")
        .dropDuplicatesWithinWatermark(["source", "sig"])
        .select("source")
    )


def batch_signature(widen: bool):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if widen:
        docs = docs.repartition(
            spark.sparkContext.defaultParallelism, F.col("text")
        )
    from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE

    k, n_hashes = 3, 12
    toks = docs.select(
        "doc_id",
        "source",
        F.array_remove(F.split(F.col("text"), LETTERS_ONLY_RE), "").alias("toks"),
    )
    shingled = toks.select(
        "doc_id",
        "source",
        F.expr(
            f"CASE WHEN size(toks) >= {k} "
            f"THEN array_distinct(transform(sequence(1, size(toks) - {k - 1}), "
            f"     i -> array_join(slice(toks, i, {k}), ' '))) "
            f"ELSE array() END"
        ).alias("sh"),
    ).where(F.size("sh") > 0)
    hashed = shingled.select(
        "doc_id",
        "source",
        F.transform(
            F.col("sh"),
            lambda x: F.conv(F.substring(F.md5(x), 1, 7), 16, 10).cast("long"),
        ).alias("hs"),
    )

    def _affine_min(s: int):
        a = es.MINHASH_MIX_A + 2 * s
        b = es.MINHASH_MIX_B * s + 12345
        return F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(es.MINHASH_MIX_P),
            )
        )

    return hashed.select(
        "source",
        F.concat_ws("|", *[_affine_min(s) for s in range(n_hashes)]).alias("sig"),
    )


def widened_stream(parts="8"):
    """Variant D: shipped pipeline with a doc_id repartition injected
    between the source and the signature map (rebuilds the core with
    the same expressions via near_dup_survivors_stream's module
    constants — kept inline here so the shipped path stays untouched
    while we measure)."""
    from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE

    k, n_hashes = 3, 12
    docs = es.read_documents_stream(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.array_remove(F.split(F.col("text"), LETTERS_ONLY_RE), "").alias("toks"),
    )
    shingled = toks.select(
        "doc_id",
        "source",
        F.expr(
            f"CASE WHEN size(toks) >= {k} "
            f"THEN array_distinct(transform(sequence(1, size(toks) - {k - 1}), "
            f"     i -> array_join(slice(toks, i, {k}), ' '))) "
            f"ELSE array() END"
        ).alias("sh"),
    ).where(F.size("sh") > 0)
    hashed = shingled.select(
        "doc_id",
        "source",
        F.transform(
            F.col("sh"),
            lambda x: F.conv(F.substring(F.md5(x), 1, 7), 16, 10).cast("long"),
        ).alias("hs"),
    )

    def _affine_min(s: int):
        a = es.MINHASH_MIX_A + 2 * s
        b = es.MINHASH_MIX_B * s + 12345
        return F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(es.MINHASH_MIX_P),
            )
        )

    signed = hashed.select(
        "doc_id",
        "source",
        F.concat_ws("|", *[_affine_min(s) for s in range(n_hashes)]).alias("sig"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.col("doc_id"), F.lit(600_000))
        ).alias("ts"),
    )
    return (
        signed.withWatermark("ts", "7 days")
        .dropDuplicatesWithinWatermark(["source", "sig"])
        .select("source")
    )


def run_A():
    drain(trivial_stream(), "append")


def run_B_narrow():
    batch_signature(False).write.format("noop").mode("overwrite").save()


def run_B_wide():
    batch_signature(True).write.format("noop").mode("overwrite").save()


def run_C():
    rows = es.streaming_near_dup_docs(
        spark, sf_dir, query_name=f"prof_full_{_ctr[0]}"
    ).collect()
    _ctr[0] += 1
    return rows


def run_D():
    drain(widened_stream(), "append")


def run_E2():
    drain(
        es.near_dup_survivors_stream(spark, sf_dir), "append", parts="2"
    )


def run_E32():
    drain(
        es.near_dup_survivors_stream(spark, sf_dir), "append", parts="32"
    )


VARIANTS = [
    ("A machinery(trivial sig)", run_A),
    ("B sig batch 1-split", run_B_narrow),
    ("B sig batch widened", run_B_wide),
    ("C full shipped", run_C),
    ("D widened stream", run_D),
    ("E drain parts=2", run_E2),
    ("E drain parts=32", run_E32),
]

walls = {label: [] for label, _ in VARIANTS}
for rep in range(N):
    for label, fn in VARIANTS:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        walls[label].append(time.perf_counter() - t0)
    print(f"--- rep {rep} done ---", flush=True)

for label, ws in walls.items():
    print(
        f"{label:28s} min {min(ws):6.3f}  med {sorted(ws)[len(ws)//2]:6.3f}  "
        f"all {['%.2f' % w for w in ws]}"
    )
