"""Event-time / window analytics over the `events` table (extension
surface, SURVEY.md §2.4 — the reference is strictly batch with no
window functions or date/time operators, SURVEY.md §2.3).

Scale design:
- Tumbling windows are a plain group-by on (truncated ts, type) —
  partial agg + exchange on the group key; no per-row state.
- Sessionization and rolling stats use Window.partitionBy(user_id):
  ONE exchange on user_id, then per-partition sorting — the standard
  scalable shape. Skewed users (bots) are the risk at 100 TB; AQE
  skew handling plus an optional pre-filter of pathological users is
  the mitigation.
- JSON extraction uses get_json_object (JVM-side, codegen'd) — never
  a Python UDF.
- Timestamps are emitted as formatted strings so the DuckDB
  differential hash is byte-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window: counts + value sum per (hour, type)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), _TS_FMT).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. lag + cumulative-sum over
    a per-user window; session_id is (user_id, session_seq).

    Returns one row per session: user_id, session_seq, session_start,
    n_events, duration_secs.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts")
    # integer microseconds, not float seconds: gap comparisons and
    # durations stay bit-exact and identical to the DuckDB oracle.
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(by_user)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    sessions = events.withColumn("session_seq", F.sum(new_session).over(by_user))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
            F.count("*").alias("n_events"),
            F.round((F.max(us) - F.min(us)) / F.lit(1_000_000.0), 6).alias("duration_secs"),
        )
        .select("user_id", F.col("session_seq").cast("long").alias("session_seq"), "session_start", "n_events", "duration_secs")
    )


def top_users_per_event_type(events: DataFrame, k: int = 5) -> DataFrame:
    """Per-type top-k users by total value: agg then windowed
    row_number ≤ k. Exchange on event_type only after the per-
    (type,user) aggregate has collapsed the input."""
    per_user = events.groupBy("event_type", "user_id").agg(F.round(F.sum("value"), 6).alias("total_value"))
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        per_user.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("event_type", "user_id", "total_value", F.col("rnk").cast("long").alias("rnk"))
    )


def rolling_user_value(events: DataFrame, n_preceding: int = 3) -> DataFrame:
    """Per-user rolling average of `value` over the current + previous
    ``n_preceding`` events (ROWS frame — deterministic given the
    per-user (ts, event_id) order)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-n_preceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("rolling_avg_value"),
    )


def props_key_stats(events: DataFrame) -> DataFrame:
    """JSON prop extraction: props is a JSON string ('{"k": N}');
    per event_type stats of k. get_json_object stays in codegen."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def event_type_share_cube(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, hour-of-day) with counts — grouping-set
    coverage (absent in the reference, free in Spark). NULL group
    cells are replaced so the oracle hash is stable."""
    return (
        events.select("event_type", F.hour("ts").cast("long").alias("hod"))
        .cube("event_type", "hod")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("hod", F.lit(-1)).alias("hod"),
            "n",
        )
    )
