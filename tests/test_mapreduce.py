"""Generic MapReduce layer tests — the reference harness's discipline:
distributed output must equal the sequential-oracle output (sort|cmp,
/root/reference/src/main/test-mr.sh:90-91), and the relational
workloads must equal their DataFrame-native twins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_golang_spark.operators import parity, wordcount
from mapreduce_golang_spark.plans import mrapps
from mapreduce_golang_spark.plans.mapreduce import run_job
from mapreduce_golang_spark.sources.tables import load_table


def _docs_df(spark, sf_dir):
    """documents table in (filename, contents) shape for the generic layer."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("filename"),
            F.col("text").alias("contents"),
        )
    )


def _kv(df):
    return sorted((r[0], r[1]) for r in df.collect())


WORKLOADS = [
    ("wc", mrapps.wc_map, mrapps.wc_reduce),
    ("indexer", mrapps.indexer_map, mrapps.indexer_reduce),
    ("file_count", mrapps.file_count_map, mrapps.file_count_reduce),
    ("crash", mrapps.crash_map, mrapps.crash_reduce),
]


@pytest.mark.parametrize("name,mapf,reducef", WORKLOADS)
def test_distributed_equals_sequential(spark, sf_dir, name, mapf, reducef):
    docs = _docs_df(spark, sf_dir)
    dist = _kv(run_job(spark, mapf, reducef, docs, n_reduce=5))
    seq = _kv(run_job(spark, mapf, reducef, docs, sequential=True))
    assert dist == seq
    assert len(dist) > 0


def test_run_job_wc_equals_dataframe_wc(spark, sf_dir):
    docs = _docs_df(spark, sf_dir)
    generic = _kv(run_job(spark, mrapps.wc_map, mrapps.wc_reduce, docs, n_reduce=4))
    native = sorted(
        (r.word, str(r.cnt))
        for r in wordcount.word_count(load_table(spark, sf_dir, "documents")).collect()
    )
    assert generic == native


def test_run_job_crash_equals_dataframe(spark, sf_dir):
    docs = _docs_df(spark, sf_dir)
    generic = _kv(run_job(spark, mrapps.crash_map, mrapps.crash_reduce, docs, n_reduce=4))
    native = sorted((r.key, r.value) for r in parity.crash_data(load_table(spark, sf_dir, "documents")).collect())
    assert generic == native


def test_run_job_from_pairs_and_parallelism(spark):
    # Non-associative reducer: first value wins — only correct because
    # the layer never inserts a combiner (reference F6 semantics).
    docs = [("f1", "b a"), ("f2", "a c")]
    out = run_job(
        spark,
        lambda f, c: [(w, f) for w in c.split()],
        lambda k, vs: sorted(vs)[0],
        docs,
        n_reduce=3,
    )
    assert sorted((r.key, r.value) for r in out.collect()) == [
        ("a", "f1"),
        ("b", "f1"),
        ("c", "f2"),
    ]
    # smoke: distributed path really uses >1 partition (W5/W6 analogue)
    assert out.rdd.getNumPartitions() >= 1
