"""Parquet table sources for the driver fixture schema (FIXTURES.md §B).

The reference's only source is whole local text files
(/root/reference/src/mr/worker.go:60-70); our primary source is
columnar Parquet so Catalyst gets predicate pushdown + column pruning
for free. Whole-text-file ingestion lives in ``sources.text``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every table the driver generates under /root/testdata/sf*/ .
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables that are the SAME size at every SF (region 5 rows, nation 25)
#: — the only ones a forced `F.broadcast` hint is safe on. customer/
#: supplier/part scale linearly with SF (measured across the fixtures),
#: so their join strategy is left to size stats + AQE.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown/pruning apply.

    The driver regenerates the fixtures between rounds and the physical
    timestamp layout has varied: events.ts has been parquet
    TIMESTAMP(NANOS) (which Spark's vectorized reader refuses,
    [PARQUET_TYPE_ILLEGAL] — read as int64 nanos and truncate to micros,
    matching DuckDB's ns→us truncation) and is now naive timestamp[us],
    which Spark reads as TIMESTAMP_NTZ. Normalize every layout to the
    session-TZ TIMESTAMP type (session TZ is pinned UTC, so the rendered
    instants are identical) so operators can rely on one ts type —
    `unix_micros` & friends reject NTZ inputs.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col, dtype in df.dtypes:
        if name == "events" and col == "ts" and dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register the fixture tables as temp views for `spark.sql` use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
