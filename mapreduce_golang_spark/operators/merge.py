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


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (PIT) lookup against an SCD2 dimension: each fact
    row picks the dim version whose [valid_from, valid_to) interval
    contains the fact's timestamp — the query every feature-store /
    training-label pipeline runs to avoid time-travel leakage.

    Implemented as an EQUI-join on the business key followed by an
    interval filter: versions-per-key is small and bounded (one per
    change), so the fan-out is a constant factor and the join stays a
    hash join partitioned on the key — never a range/theta join. For
    keys with pathological version churn, pre-bucketing both sides on
    the key keeps the join exchange-free.

    Open rows may mark valid_to with a far-future sentinel OR with
    NULL (the other common SCD2 convention) — a NULL valid_to is
    treated as open-ended, not silently dropped. Dim attribute columns
    must not collide with fact column names (raises ValueError up
    front; a silent duplicate column would ambiguate the filter).
    """
    passthrough = [c for c in dim.columns if c not in (dim_key, valid_from, valid_to)]
    clash = set(passthrough) & set(facts.columns)
    if clash:
        raise ValueError(
            f"point_in_time_join: dim attribute columns {sorted(clash)} collide "
            "with fact columns — rename them on one side before the join"
        )
    d = dim.select(
        F.col(dim_key).alias(fact_key),
        F.col(valid_from).cast("timestamp").alias("_vf"),
        F.col(valid_to).cast("timestamp").alias("_vt"),
        *passthrough,
    )
    return (
        facts.join(d, fact_key)
        .where(
            (F.col(ts_col) >= F.col("_vf"))
            & (F.col("_vt").isNull() | (F.col(ts_col) < F.col("_vt")))
        )
        .drop("_vf", "_vt")
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]) -> DataFrame:
    """CDC-style snapshot diff: classify every key across two table
    snapshots as added / removed / changed (unchanged rows are
    dropped — at 100 TB the diff is the small output, the snapshots
    are the big inputs, and this operator is how an incremental
    pipeline avoids reprocessing the unchanged bulk).

    One full-outer hash join on the key — both sides shuffle once on
    the same key (co-partitioned snapshots or bucketed tables make it
    exchange-free); presence is tracked via literal marker columns so
    legitimately-NULL compare columns never masquerade as a missing
    side, and change detection is null-safe (`eqNullSafe`).

    Returns (key, change, old_<c>..., new_<c>...) with change ∈
    {'added','removed','changed'}; absent-side columns are NULL.
    """
    o = old.select(
        F.col(key), F.lit(1).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key), F.lit(1).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, key, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_old_present").isNull(), F.lit("added"))
        .when(F.col("_new_present").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            key,
            "change",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def cdc_apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Full MERGE semantics from a CDC change log: apply a batch of
    insert/update/delete events (op ∈ 'I'/'U'/'D') to a keyed snapshot,
    resolving OUT-OF-ORDER and MULTI-VERSION changes per key by a
    sequence column — the `MERGE INTO ... WHEN MATCHED [AND] ... WHEN
    NOT MATCHED ...` + `APPLY CHANGES` surface a lakehouse table format
    provides, expressed engine-side (the Delta/Iceberg jars are not in
    this environment; with them this is one statement).

    Resolution: the winning change per key is the max (seq, op) —
    row_number over (seq DESC, op DESC), so a same-seq tie resolves
    deterministically (U > I > D lexicographic is the documented
    convention; real CDC logs make (key, seq) unique and never hit
    it). A winning 'D' removes the key; a winning 'U'/'I' replaces or
    inserts the payload last-writer-wins.

    Scale shape: the change log is the small side at 100 TB — the
    per-key window shuffles ONLY the changes on the key; the target
    pays exactly one left-anti hash join on the same key (bucketed
    targets make it exchange-free) plus a union with the winners. The
    target table is never windowed, never re-sorted, never re-scanned
    twice.

    ``changes`` must carry (key, seq_col, op_col, *target payload
    columns). Returns the post-merge snapshot with target's columns.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    untouched = target.join(latest.select(key), key, "left_anti")
    winners = latest.where(F.col(op_col) != "D").select(*target.columns)
    return untouched.unionByName(winners)


def incremental_agg_refresh(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measure: str,
    exact_decimal: str | None = None,
) -> DataFrame:
    """Materialized-view maintenance: refresh a grouped aggregate by
    MERGING the stored partial state with the delta batch's partial
    state, never re-scanning the base — the incremental-ETL pattern
    that makes a 100 TB nightly rollup cost one delta's worth of work.

    Partial state is the algebraic tuple (count, sum, min, max); avg
    derives at read time from (sum, count), which is exactly why
    non-algebraic forms (a stored avg) can't be maintained this way.
    Both partials are map-side-combined hash aggs on the group key;
    the merge is a union + one more hash agg on the same key (the
    partials are tiny relative to their inputs, so the merge shuffle
    is negligible — and equals what Catalyst's partial/final split
    does inside ONE query, applied here ACROSS batches).

    ``exact_decimal`` (e.g. "decimal(18,2)") sums the measure in fixed
    point instead of float. This is NOT cosmetic: a double sum at 1e9
    magnitude is only reproducible to ~1e-4 under re-association, so a
    merged-partials refresh of a FLOAT sum cannot promise equality
    with the direct aggregate — decimal summation is associative and
    makes the refresh bit-identical to the full recompute (and is what
    monetary measures should be at 100 TB anyway).

    Returns (keys..., n_rows, sum_m, avg_m, min_m, max_m) == the same
    aggregate computed directly over base ∪ delta.
    """
    m = F.col(measure).cast(exact_decimal) if exact_decimal else F.col(measure)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(measure).alias("_n"),
            F.sum(m).alias("_s"),
            F.min(measure).alias("_mn"),
            F.max(measure).alias("_mx"),
        )

    return (
        partial(base)
        .unionByName(partial(delta))
        .groupBy(*keys)
        .agg(
            F.sum("_n").cast("long").alias("n_rows"),
            F.sum("_s").alias("_s2"),
            F.min("_mn").alias("_mn2"),
            F.max("_mx").alias("_mx2"),
        )
        .select(
            *keys,
            "n_rows",
            # exact decimal → double is deterministic; the division is
            # one float op on identical inputs in any engine
            F.round(F.col("_s2").cast("double"), 6).alias("sum_m"),
            F.round(F.col("_s2").cast("double") / F.col("n_rows"), 6).alias("avg_m"),
            F.round("_mn2", 6).alias("min_m"),
            F.round("_mx2", 6).alias("max_m"),
        )
    )
