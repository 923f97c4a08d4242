"""Whole-text-file source + "k v" text sink — the reference's only I/O.

Source: one file == one record (filename, contents)
(/root/reference/src/mr/worker.go:60-70; no record splitting — split
granularity is exactly one file). Sink: per-partition text files of
space-delimited "key value" lines, unordered
(/root/reference/src/mr/worker.go:125-141), compared order-insensitively
by its harness (sort | cmp, /root/reference/src/main/test-mr.sh:90-91).

Scale note: whole-file records mean a 10 GB file is a 10 GB row — the
reference has the identical constraint. For large corpora prefer the
parquet `documents` table; this source exists for contract parity and
raw-corpus ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

DOCUMENT_SCHEMA = StructType(
    [
        StructField("filename", StringType(), False),
        StructField("contents", StringType(), True),
    ]
)


def read_text_documents(spark: SparkSession, glob: str, min_partitions: int | None = None) -> DataFrame:
    """(filename, contents) — one row per whole file, filename is the
    basename (the reference passes the bare input path to mapf,
    /root/reference/src/mr/worker.go:70).

    Uses ``sc.wholeTextFiles`` rather than the DataFrame text source
    with wholetext=true because the latter silently drops zero-byte
    files, while the reference emits an empty-contents record for them
    (ioutil.ReadAll of an empty file → "").
    """
    rdd = spark.sparkContext.wholeTextFiles(glob, minPartitions=min_partitions)
    pairs = rdd.map(lambda kv: (kv[0].rsplit("/", 1)[-1], kv[1]))
    return spark.createDataFrame(pairs, DOCUMENT_SCHEMA)


def write_kv_text(df: DataFrame, path: str, key_col: str = "key", value_col: str = "value", n_files: int = 10) -> None:
    """Write "key value" lines across n_files output files (reference's
    mr-out-N layout with nReduce=10, /root/reference/src/main/
    mrcoordinator.go:23). Keys hash-route to files (Murmur3 instead of
    the reference's FNV-1a — per-key file assignment differs, contents
    per key are identical, which is all the order-insensitive contract
    checks).
    """
    (
        df.repartition(n_files, F.col(key_col))
        .select(F.format_string("%s %s", F.col(key_col), F.col(value_col)).alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def read_kv_text(spark: SparkSession, path: str) -> DataFrame:
    """Read "key value" lines back to (key, value); lines that don't
    split into exactly two fields are dropped, matching the reference's
    silent malformed-line skip (/root/reference/src/mr/worker.go:112-115).
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return (
        lines.select(parts.alias("p"))
        .where(F.size("p") == 2)
        .select(F.col("p")[0].alias("key"), F.col("p")[1].alias("value"))
    )
