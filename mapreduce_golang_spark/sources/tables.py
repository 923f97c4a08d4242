"""Parquet table sources for the driver fixture schema (FIXTURES.md §B).

The reference's only source is whole local text files
(/root/reference/src/mr/worker.go:60-70); our primary source is
columnar Parquet so Catalyst gets predicate pushdown + column pruning
for free. Whole-text-file ingestion lives in ``sources.text``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

#: Dimension tables small enough to broadcast at any realistic scale —
#: join code uses this to pick `F.broadcast` sides.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown/pruning apply."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register the fixture tables as temp views for `spark.sql` use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
