#!/usr/bin/env python
"""A/B the two remaining computed-array filter sites (round 14 — same
pathology as the streaming near-dup signature: a `where(size(X) > 0)`
above a projection makes Catalyst substitute the whole aliased
expression into the pushed-down Filter, so the expensive array build
runs TWICE, and the pushed copy runs SERIALLY on the fixture's one
parquet split, below any widen exchange).

  simhash64:      st = array_sort(array_remove(split(text)));
                  st non-empty  ⟺  text rlike '\\p{L}'
  sentence_stats: sents = filter(transform(split(text,'[.!?]+'),trim), != '')
                  sents non-empty ⟺ text rlike '[^\\s.!?]'
                  (delimiters are consumed by split, whitespace by
                  trim, so any OTHER char survives in some segment)

Variants per site: shipped / cheap-rlike filter / cheap filter +
widen_for_cpu. Row-identity asserted per variant. min-of-N interleaved.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.operators import dedup, text_analysis
from mapreduce_golang_spark.operators.dedup import _simhash_narrow, _HI_HEX, SIMHASH_BITS
from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE, widen_for_cpu

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4
spark = get_spark(app_name="ab-filter-pushdup")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.limit(10).write.format("noop").mode("overwrite").save()


def simhash64_variant(widen: bool):
    d = widen_for_cpu(docs, key_col="text") if widen else docs
    d = d.where(F.col("text").rlike(r"\p{L}"))
    re_sql = LETTERS_ONLY_RE.replace("\\", "\\\\")
    toks = f"array_sort(array_remove(split(text, '{re_sql}'), ''))"
    base = d.select(F.col("doc_id"), F.expr(toks).alias("st"))
    n_bits = 63
    contrib_expr = (
        "slice(flatten(transform("
        "  transform(sequence(0, 15), d -> position(substr({H}, d + 1, 1) IN '0123456789abcdef') - 1), "
        "  dv -> array(IF(dv % 2 = 1, 1, -1), IF((dv DIV 2) % 2 = 1, 1, -1), "
        "              IF((dv DIV 4) % 2 = 1, 1, -1), IF((dv DIV 8) % 2 = 1, 1, -1)))), "
        f"1, {n_bits})"
    )
    starts = "filter(sequence(1, size(st)), i -> i = 1 OR element_at(st, i) != element_at(st, i - 1))"
    ends = "filter(sequence(1, size(st)), i -> i = size(st) OR element_at(st, i) != element_at(st, i + 1))"
    entries = (
        f"zip_with({starts}, {ends}, (s, e) -> "
        f"named_struct('h', md5(element_at(st, s)), 'c', CAST(e - s + 1 AS BIGINT)))"
    )
    contrib = contrib_expr.replace("{H}", "p.h")
    sums = (
        f"aggregate({entries}, "
        f"  array_repeat(CAST(0 AS BIGINT), {n_bits}), "
        f"  (acc, p) -> zip_with(acc, {contrib}, (x, y) -> x + p.c * CAST(y AS BIGINT)))"
    )
    value = (
        f"aggregate(zip_with({sums}, sequence(0, {n_bits - 1}), "
        f"  (s, i) -> IF(s >= 0, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), "
        f"  CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    return base.select("doc_id", F.expr(value).alias("simhash64"))


def sentence_stats_variant(widen: bool):
    d = widen_for_cpu(docs, key_col="text") if widen else docs
    d = d.where(F.col("text").rlike(r"[^\s.!?]"))
    sents = F.expr(
        "filter(transform(split(text, '[.!?]+'), x -> trim(x)), x -> x != '')"
    )
    wc = F.expr("transform(sents, s -> size(split(s, '\\\\s+')))")
    return (
        d.select("doc_id", sents.alias("sents"))
        .select("doc_id", wc.alias("wc"))
        .select(
            "doc_id",
            F.size("wc").cast("long").alias("n_sentences"),
            F.round(
                F.aggregate("wc", F.lit(0), lambda a, x: a + x) / F.size("wc"), 6
            ).alias("avg_sentence_words"),
            F.array_max("wc").cast("long").alias("max_sentence_words"),
        )
    )


def rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


# identity checks first (cheap at sf0.1, run once)
base_sim = rows(dedup.simhash64(docs))
assert base_sim == rows(simhash64_variant(False)) == rows(simhash64_variant(True)), "simhash64 variant diverges"
base_sent = rows(text_analysis.sentence_stats(docs))
assert base_sent == rows(sentence_stats_variant(False)) == rows(sentence_stats_variant(True)), "sentence_stats variant diverges"
print("identity: OK", len(base_sim), len(base_sent))

VARIANTS = [
    ("simhash64 shipped", lambda: dedup.simhash64(docs)),
    ("simhash64 rlike", lambda: simhash64_variant(False)),
    ("simhash64 rlike+widen", lambda: simhash64_variant(True)),
    ("sentence_stats shipped", lambda: text_analysis.sentence_stats(docs)),
    ("sentence_stats rlike", lambda: sentence_stats_variant(False)),
    ("sentence_stats rlike+widen", lambda: sentence_stats_variant(True)),
]

walls = {l: [] for l, _ in VARIANTS}
for rep in range(N):
    for l, fn in VARIANTS:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        walls[l].append(time.perf_counter() - t0)
    print(f"--- rep {rep} done ---", flush=True)

for l, ws in walls.items():
    print(
        f"{l:28s} min {min(ws):6.3f}  med {sorted(ws)[len(ws)//2]:6.3f}  "
        f"all {['%.2f' % w for w in ws]}"
    )
