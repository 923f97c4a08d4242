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


def join_key_skew_report(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key cardinality profile of a prospective join/agg key — the
    diagnostic a pipeline runs BEFORE choosing between a plain shuffle
    join, AQE skew splitting, or the explicit salting operators above
    (a key whose top bucket holds 10% of a 100 TB fact table is a
    straggler task; this report is how you find out at planning time,
    not 4 hours into the job).

    Reports distinct-key count, row totals, the max/avg rows-per-key
    ratio (skew_factor), the heaviest key's share of all rows
    (top1_share), and exact p50/p99 of the per-key distribution.

    Scale shape: one hash agg on the key (map-side partials) followed
    by a single-row bounded agg over the per-key counts — the second
    agg's input is one row per distinct key, the same reduction any
    COUNT DISTINCT pays. Exact percentiles keep it oracle-checkable;
    at extreme key cardinality swap approx_percentile into the same
    plan. Returns one row (n_keys, n_rows, max_rows, p50_rows,
    p99_rows, skew_factor, top1_share), ratios rounded to 6.
    """
    per_key = df.groupBy(key_col).agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.percentile("n", F.lit(0.5)).alias("_p50"),
        F.percentile("n", F.lit(0.99)).alias("_p99"),
        F.avg("n").alias("_avg"),
    ).select(
        "n_keys",
        "n_rows",
        "max_rows",
        F.round("_p50", 6).alias("p50_rows"),
        F.round("_p99", 6).alias("p99_rows"),
        F.round(F.col("max_rows") / F.col("_avg"), 6).alias("skew_factor"),
        F.round(F.col("max_rows") / F.col("n_rows"), 6).alias("top1_share"),
    )
