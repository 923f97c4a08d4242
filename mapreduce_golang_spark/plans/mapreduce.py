"""Generic MapReduce compatibility layer — the reference's public API.

The reference exposes exactly two plug-points: ``Map(filename,
contents) → []KeyValue`` and ``Reduce(key, values) → string``
(/root/reference/src/main/mrworker.go:34-51), run as scan → map →
hash-partition into nReduce buckets → shuffle → group-by-key →
reduce → sink (/root/reference/src/mr/worker.go:60-141). This module
is that contract on Spark:

    run_job(mapf, reducef, inputs, n_reduce=10) → DataFrame(key, value)

Semantics kept deliberately faithful:

- **No combiner.** The reference ships every pair raw and the reducer
  sees the complete value list (no partial-aggregation call exists in
  /root/reference/src/mr/worker.go:80-92); reference reducers are NOT
  required to be associative (indexer/crash sort-join all values,
  /root/reference/src/mrapps/indexer.go:36-39). Hence ``groupByKey``,
  not ``reduceByKey`` — "optimizing" this would change observable
  semantics for non-algebraic reducers.
- **At-least-once task execution, effectively-once completion** — the
  reference gets this from heartbeat+requeue+idempotent marking
  (/root/reference/src/mr/coordinator.go:122-160); Spark gets it from
  lineage + task retry. Nothing to implement.
- **Sequential mode** mirrors mrsequential (single process, global
  sort-by-key, linear scan — /root/reference/src/main/mrsequential.go:
  53-84): one partition + sortByKey. Used as the differential-test
  oracle for the distributed path, exactly like the reference harness
  (sort | cmp against mrsequential output,
  /root/reference/src/main/test-mr.sh:90-91).

Scale notes: this layer is the *compatibility* surface; its hot path
is Python (pickled rows through the JVM↔Python bridge) and
``groupByKey`` materializes per-key value lists — both inherent to
the reference contract. Workloads that are actually relational should
use the DataFrame operators (operators/*) which stay JVM-side with
partial aggregation. For huge corpora, pass ``min_partitions`` so
wholeTextFiles doesn't under-split, and pick ``n_reduce`` ≈ cluster
cores (the reference pins 10, /root/reference/src/main/mrcoordinator.go:23).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_golang_spark.session import ensure_package_shipped
from mapreduce_golang_spark.sources.text import DOCUMENT_SCHEMA, read_text_documents

MapF = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceF = Callable[[str, list[str]], str]


def _as_documents(spark: SparkSession, inputs, min_partitions=None) -> DataFrame:
    """inputs may be a path/glob, a list of (filename, contents) pairs,
    or a DataFrame with (filename, contents) columns."""
    if isinstance(inputs, DataFrame):
        return inputs.select("filename", "contents")
    if isinstance(inputs, str):
        return read_text_documents(spark, inputs, min_partitions=min_partitions)
    return spark.createDataFrame(list(inputs), DOCUMENT_SCHEMA)


def run_job(
    spark: SparkSession,
    mapf: MapF,
    reducef: ReduceF,
    inputs,
    n_reduce: int = 10,
    sequential: bool = False,
    min_partitions: int | None = None,
) -> DataFrame:
    """Run a classic MapReduce job; returns DataFrame(key, value).

    ``sequential=True`` reproduces the mrsequential oracle layout
    (single partition, keys sorted); output *contents* are identical
    either way for deterministic reducers — the distributed path just
    computes them across n_reduce hash buckets.
    """
    ensure_package_shipped(spark)
    docs = _as_documents(spark, inputs, min_partitions=min_partitions)
    pairs = docs.rdd.flatMap(lambda row: [(k, v) for k, v in mapf(row[0], row[1])])

    if sequential:
        grouped = pairs.groupByKey(numPartitions=1).sortByKey()
    else:
        grouped = pairs.groupByKey(numPartitions=n_reduce)

    reduced = grouped.map(lambda kv: (kv[0], reducef(kv[0], list(kv[1]))))
    return spark.createDataFrame(reduced, "key string, value string")
