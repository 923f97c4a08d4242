#!/usr/bin/env python
"""Decompose the streaming near-dup signature's batch-side cost
(round-14: profile_stream_neardup.py showed the signature expression
costs ~5-6 s at sf0.1 WIDENED — i.e. not parallelism-bound — while
lang_id's comparable tokenize work runs in 0.5 s). Times cumulative
prefixes of the expression pipeline, widened, min-of-N interleaved,
plus an alternative explode→groupBy formulation of the same 12
minhashes (the batch dedup family's shape).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.streaming.events_stream import (
    MINHASH_MIX_A,
    MINHASH_MIX_B,
    MINHASH_MIX_P,
)
from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4
k = 3
spark = get_spark(app_name="ab-sig-decompose")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
    spark.sparkContext.defaultParallelism, F.col("text")
)
docs.limit(10).write.format("noop").mode("overwrite").save()
print("n_docs", docs.count())


def toks_df():
    return docs.select(
        "doc_id",
        "source",
        F.array_remove(F.split(F.col("text"), LETTERS_ONLY_RE), "").alias("toks"),
    )


def shingled_df():
    return toks_df().select(
        "doc_id",
        "source",
        F.expr(
            f"CASE WHEN size(toks) >= {k} "
            f"THEN array_distinct(transform(sequence(1, size(toks) - {k - 1}), "
            f"     i -> array_join(slice(toks, i, {k}), ' '))) "
            f"ELSE array() END"
        ).alias("sh"),
    ).where(F.size("sh") > 0)


def hashed_df():
    return shingled_df().select(
        "doc_id",
        "source",
        F.transform(
            F.col("sh"),
            lambda x: F.conv(F.substring(F.md5(x), 1, 7), 16, 10).cast("long"),
        ).alias("hs"),
    )


def _affine_min(s: int):
    a = MINHASH_MIX_A + 2 * s
    b = MINHASH_MIX_B * s + 12345
    return F.array_min(
        F.transform(
            F.col("hs"), lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_MIX_P)
        )
    )


def sig_df(n_hashes):
    return hashed_df().select(
        "doc_id",
        "source",
        F.concat_ws("|", *[_affine_min(s) for s in range(n_hashes)]).alias("sig"),
    )


def explode_sig_df():
    """Same 12 minhashes via explode → groupBy(doc_id) min-agg (the
    batch family's shape): md5 computed once per (doc, shingle) ROW,
    12 scalar affine mins as aggregates."""
    h = (
        shingled_df()
        .select("doc_id", "source", F.explode("sh").alias("x"))
        .select(
            "doc_id",
            "source",
            F.conv(F.substring(F.md5("x"), 1, 7), 16, 10).cast("long").alias("h"),
        )
    )
    aggs = []
    for s in range(12):
        a = MINHASH_MIX_A + 2 * s
        b = MINHASH_MIX_B * s + 12345
        aggs.append(
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_MIX_P)).alias(
                f"m{s}"
            )
        )
    g = h.groupBy("doc_id", "source").agg(*aggs)
    return g.select(
        "doc_id",
        "source",
        F.concat_ws("|", *[F.col(f"m{s}") for s in range(12)]).alias("sig"),
    )


VARIANTS = [
    ("toks only", toks_df),
    ("+shingles", shingled_df),
    ("+md5 hash array", hashed_df),
    ("+1 affine min", lambda: sig_df(1)),
    ("+4 affine mins", lambda: sig_df(4)),
    ("+12 affine mins (shipped)", lambda: sig_df(12)),
    ("explode+groupBy 12 mins", explode_sig_df),
]

walls = {label: [] for label, _ in VARIANTS}
for rep in range(N):
    for label, fn in VARIANTS:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        walls[label].append(time.perf_counter() - t0)
    print(f"--- rep {rep} done ---", flush=True)

for label, ws in walls.items():
    print(
        f"{label:28s} min {min(ws):6.3f}  med {sorted(ws)[len(ws)//2]:6.3f}  "
        f"all {['%.2f' % w for w in ws]}"
    )
