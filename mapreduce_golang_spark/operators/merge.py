"""MERGE INTO / SCD2 emulation — the lakehouse upsert path without a
Delta/Iceberg dependency (their jars aren't in this environment; with
them, these become single MERGE statements).

Patterns per the standard playbook: upsert = updates ∪ (target
anti-join updates); SCD2 = close out matched current rows + append
new versions. Both are pure DataFrame ops: one anti-join (ships only
keys) + union — no driver involvement, scales with the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-writer-wins upsert: rows from ``updates`` replace matching
    ``target`` rows; unmatched target rows pass through. Schemas must
    match. Returns the merged table."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    open_marker: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension type 2: matched current rows get
    closed (valid_to = update ts), update rows append as the new open
    version. ``current`` must carry valid_from/valid_to columns; open
    rows have valid_to = open_marker."""
    upd_keys = updates.select(F.col(key), F.col(ts_col).alias("_new_from"))
    closed = (
        current.join(upd_keys, key, "inner")
        .where(F.col(valid_to) == open_marker)
        .withColumn(valid_to, F.date_format("_new_from", "yyyy-MM-dd HH:mm:ss"))
        .drop("_new_from")
    )
    untouched = current.join(upd_keys.select(key), key, "left_anti")
    still_closed = (
        current.join(upd_keys.select(key), key, "left_semi")
        .where(F.col(valid_to) != open_marker)
    )
    fresh = updates.withColumn(
        valid_from, F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss")
    ).withColumn(valid_to, F.lit(open_marker))
    fresh = fresh.select(*[c for c in current.columns])
    return untouched.unionByName(still_closed).unionByName(closed).unionByName(fresh)
