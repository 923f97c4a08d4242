"""Skew-mitigation helpers (100 TB design rule: a hot key must not
serialize into one reducer).

AQE's skew-join splitting handles joins; for AGGREGATIONS over a hot
key the classic fix is salting: split each key into ``n_salts``
sub-keys, partially aggregate, then merge. Results are identical for
any decomposable aggregate; only the exchange layout changes — the
hot key's traffic spreads across n_salts reducers.

For built-in algebraic aggregates Spark's map-side partial agg often
suffices; explicit salting matters when per-key state is large
(collect_list-ish) or when AQE is unavailable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16, out: str = "sum_value"
) -> DataFrame:
    """Two-phase salted SUM: groupBy(keys + salt) → groupBy(keys).

    The salt derives from a per-row id, not the key, so a single hot
    key fans out over n_salts partitions in phase 1.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias(out))


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 16, out: str = "cnt") -> DataFrame:
    """Two-phase salted COUNT(*)."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(*key_cols, salt).groupBy(*key_cols, "_salt").agg(F.count("*").alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").cast("long").alias(out))


def with_salted_key(df: DataFrame, key_col: str, n_salts: int = 16, out: str = "salted_key") -> DataFrame:
    """Explicit salted join key (key#salt) for pre-AQE skew joins: the
    small side must be exploded across all salts to match."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    return df.withColumn(out, F.concat_ws("#", F.col(key_col).cast("string"), salt.cast("string")))


def explode_salts(df: DataFrame, key_col: str, n_salts: int = 16, out: str = "salted_key") -> Column:
    """Small-side counterpart of with_salted_key: replicate each row
    once per salt value so the salted equi-join finds every match."""
    return df.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        out, F.concat_ws("#", F.col(key_col).cast("string"), F.col("_salt").cast("string"))
    ).drop("_salt")
