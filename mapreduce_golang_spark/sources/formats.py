"""Format connectors beyond parquet: CSV, JSON (lines), ORC,
partitioned parquet layout, and bucketed tables.

The reference's only formats are whole text files in and "k v" text
out (SURVEY.md §2.3 Scans/Sinks rows); everything here is the
standard lakehouse surface a real pipeline needs:

- CSV/JSON readers take an explicit schema — schema inference is a
  full extra pass over the data and type-guesses; at 100 TB both are
  unacceptable (pyspark guide: "avoid inferSchema in prod").
- Partitioned parquet (`partitionBy`) gives partition PRUNING: a
  filter on the partition column skips directories entirely —
  asserted in tests via the scan's PartitionFilters.
- Bucketed tables (`bucketBy` + saveAsTable) pre-shuffle data on the
  join/agg key at WRITE time; two tables bucketed on the same key
  join with NO exchange — the disk-layout answer to the brief's
  "co-located joins via bucketing".

Delta/Iceberg/Hudi would slot in here as formats but need their jars
on the classpath, which this environment doesn't ship — deliberately
not stubbed with fake implementations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (native Spark format, no extra jars): columnar with
    predicate-pushdown-capable stripe/row-group statistics — the
    second lakehouse columnar format besides parquet."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """XML sink — built into Spark 4 (the former spark-xml package,
    no extra jars). Row-per-element under ``row_tag``; the interchange
    format for feeds/catalogs that still speak XML."""
    df.write.mode("overwrite").option("rowTag", row_tag).format("xml").save(path)


def read_xml(spark: SparkSession, path: str, schema: StructType, row_tag: str = "row") -> DataFrame:
    """XML source with an explicit schema (schema inference on XML
    costs a full extra scan at 100 TB — always declare)."""
    return (
        spark.read.schema(schema).option("rowTag", row_tag).format("xml").load(path)
    )


def write_partitioned_parquet(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style partitioned layout: one directory per partition-col
    value; reads filtered on those columns prune at planning time."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_file_mb: int = 128
) -> int:
    """Small-file compaction (OPTIMIZE-style maintenance): rewrite a
    parquet directory into ~target_file_mb files. File count derives
    from the actual on-disk bytes, so a directory of thousands of tiny
    files (the classic streaming-ingest pathology) collapses to a few
    scan-efficient ones. Returns the target file count. coalesce (not
    repartition) keeps it shuffle-free."""
    df = spark.read.parquet(path)
    total_bytes = _dir_bytes(path)
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def save_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table. Joins and
    aggregations on ``bucket_col`` between tables bucketed the same way
    run shuffle-free (asserted in tests). With ``path`` the table is
    EXTERNAL at that location (usable when the session's warehouse dir
    isn't writable — e.g. a driver launched from a read-only cwd);
    otherwise managed in the warehouse."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is None:
        # a crashed previous writer can orphan the managed location while
        # the in-memory catalog forgets the table — clear it or saveAsTable
        # fails with LOCATION_ALREADY_EXISTS
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:") :]
        if warehouse:
            import shutil

            shutil.rmtree(os.path.join(warehouse, table), ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_revenue(spark: SparkSession, sf_dir: str, n_buckets: int = 8) -> DataFrame:
    """End-to-end bucketed co-located join: orders and lineitem are
    written bucketed on the ORDER KEY (external location), then joined
    and aggregated on that same key. The join and the group-by consume
    the bucketing — ZERO hash exchanges in the executed plan (asserted
    in tests/test_sources.py): the shuffle was paid once at write
    time, which is the point of bucketing for repeated co-located
    joins at 100 TB. Returns per-order revenue
    (o_orderkey, o_totalprice, line_revenue, n_lines)."""
    from pyspark.sql import functions as F

    from mapreduce_golang_spark.sources.tables import load_table
    from mapreduce_golang_spark.tempdirs import scratch_dir

    loc = scratch_dir("mgs_buckets_")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    save_bucketed_table(orders, "bq_orders", "o_orderkey", n_buckets, path=f"{loc}/orders")
    save_bucketed_table(li, "bq_lineitem", "l_orderkey", n_buckets, path=f"{loc}/lineitem")
    # hint("merge") pins SMJ so the co-location property holds at any
    # size (broadcast would also be exchange-free but only while one
    # side stays small — not the 100 TB story being demonstrated)
    return (
        spark.table("bq_orders")
        .join(
            spark.table("bq_lineitem").hint("merge"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(
            F.max("o_totalprice").alias("o_totalprice"),
            # price×(1-discount) has ≤4 exact decimal digits, so the
            # decimal(18,4) cast is lossless and the SUM is exact and
            # ORDER-INDEPENDENT — with thousands of groups, a double
            # sum hits .xx5 rounding ties that flip between engines
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")),
                2,
            )
            .cast("double")
            .alias("line_revenue"),
            F.count("*").alias("n_lines"),
        )
    )
