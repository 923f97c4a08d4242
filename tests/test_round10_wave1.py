"""Round-10 wave 1: bucketed cogrouped as-of join edge cases + the
observed-metrics empty-input guard (round-9 verdict #1 and advice
#4/#5)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_asof_cogrouped_click_only_and_purchase_only_users(spark):
    """The bucketed rework must keep per-user semantics exactly:
    click-only users emit nothing (the left-semi prefilter), purchase-
    only users emit -1, ties at identical ts resolve by event_id just
    like the window form's orderBy(ts, event_id)."""
    from mapreduce_golang_spark.operators.analytics import (
        last_click_before_purchase,
        last_click_before_purchase_cogrouped,
    )

    rows = [
        # user 1: click before purchase, plus a later click (ignored)
        (1, 10, "click", "2024-01-01 00:00:01"),
        (1, 11, "purchase", "2024-01-01 00:00:05"),
        (1, 12, "click", "2024-01-01 00:00:09"),
        # user 2: purchase-only -> last_click_event_id = -1
        (2, 20, "purchase", "2024-01-01 00:00:03"),
        # user 3: click-only -> no output row at all
        (3, 30, "click", "2024-01-01 00:00:02"),
        # user 4: click and purchase at the IDENTICAL timestamp;
        # click's event_id is smaller so it sorts before -> counted
        (4, 40, "click", "2024-01-01 00:00:07"),
        (4, 41, "purchase", "2024-01-01 00:00:07"),
        # user 5: purchase then click at identical ts with LARGER id
        # -> click sorts after the purchase, NOT counted
        (5, 50, "purchase", "2024-01-01 00:00:08"),
        (5, 51, "click", "2024-01-01 00:00:08"),
        # user 6: two purchases sharing one earlier click
        (6, 60, "click", "2024-01-01 00:00:01"),
        (6, 61, "purchase", "2024-01-01 00:00:02"),
        (6, 62, "purchase", "2024-01-01 00:00:04"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts_s string"
    ).select("user_id", "event_id", "event_type", F.to_timestamp("ts_s").alias("ts"))

    got = sorted(map(tuple, last_click_before_purchase_cogrouped(ev).collect()))
    want = sorted(map(tuple, last_click_before_purchase(ev).collect()))
    assert got == want
    by_purchase = {r[0]: r[3] for r in got}
    assert by_purchase == {11: 10, 20: -1, 41: 40, 50: -1, 61: 60, 62: 60}
    assert 30 not in {r[1] for r in got}  # click-only user absent


def test_asof_cogrouped_no_per_user_groups_in_plan(spark, sf_dir):
    """Scale pin: the cogroup key must be the hash bucket, never the
    raw user_id — per-user groups mean one ~2 ms Arrow call per user
    (billions at 100 TB). The FlatMapCoGroupsInPandas grouping
    expressions in the executed plan must reference `bucket`."""
    from mapreduce_golang_spark.operators.analytics import (
        last_click_before_purchase_cogrouped,
    )
    from mapreduce_golang_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = (
        last_click_before_purchase_cogrouped(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Anchor on the node name and read its first two bracketed lists
    # (left and right grouping expressions) semantically — bucket must
    # be the key, user_id must not be — instead of positional '['
    # splitting, which coupled to plan-string layout (round-10 advice).
    import re

    m = re.search(
        r"FlatMapCoGroupsInPandas\s+\[([^\]]*)\],\s*\[([^\]]*)\]", plan
    )
    assert m is not None, plan
    left_keys, right_keys = m.group(1), m.group(2)
    assert "bucket" in left_keys and "bucket" in right_keys
    assert "user_id" not in left_keys and "user_id" not in right_keys


def test_documents_stream_reads_directory_layout(spark, sf_dir, tmp_path):
    """Round-10 fix: read_documents_stream must handle Spark-written
    DIRECTORY-shaped corpora (xl fixtures, any production output), not
    just the driver's flat-file fixture — the glob-only form matched
    zero files on directories and silently drained an empty source."""
    from mapreduce_golang_spark.sources.tables import load_table
    from mapreduce_golang_spark.streaming.events_stream import (
        read_documents_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    want = docs.count()
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    stream = read_documents_stream(spark, str(tmp_path))
    q = (
        stream.writeStream.format("memory")
        .queryName("dir_layout_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("dir_layout_probe").count() == want > 0


def test_streaming_cdc_equals_batch_merge(spark, sf_dir):
    """The piecewise streaming APPLY CHANGES (seq-descending batches)
    must equal the one-shot batch MERGE row-for-row."""
    import __spark_entry__ as entrymod

    want = sorted(
        map(tuple, entrymod.queries()["cdc_orders_state"](spark, sf_dir).collect())
    )
    got = sorted(
        map(
            tuple,
            entrymod.queries()["streaming_cdc_apply_changes"](
                spark, sf_dir
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_streaming_cdc_stop_resume_mid_drain(spark, sf_dir, tmp_path):
    """Kill-and-recover applied to the CDC apply: stop after 2 commits
    (mid-drain of 4 seq-banded chunks), resume from the checkpoint —
    the in-flight batch is replayed and must rewrite its state version
    idempotently, so the final state equals both the uninterrupted
    streaming apply and the one-shot batch MERGE."""
    import __spark_entry__ as entrymod
    from mapreduce_golang_spark.sources.tables import load_table
    from mapreduce_golang_spark.streaming.cdc_stream import streaming_cdc_apply

    want = sorted(
        map(tuple, entrymod.queries()["cdc_orders_state"](spark, sf_dir).collect())
    )
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    target = orders.where(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey", "o_orderstatus", F.round(price, 2).alias("price")
    )
    upd = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(price_dec * F.lit("1.05").cast("decimal(3,2)"), 2)
        .cast("double")
        .alias("price"),
        (F.col("o_orderkey") % 5 + 1).alias("seq"),
        F.lit("U").alias("op"),
    )
    dels = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(None).cast("double").alias("price"),
        (F.col("o_orderkey") % 5 + 2).alias("seq"),
        F.lit("D").alias("op"),
    )
    ins = orders.where(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(price, 2).alias("price"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("I").alias("op"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    out = streaming_cdc_apply(
        spark, target, changes, "o_orderkey", str(tmp_path), stop_after_commits=2
    )
    got = sorted(map(tuple, out.collect()))
    assert got == want and len(got) > 0


def test_streaming_cdc_tombstone_blocks_resurrection(spark, tmp_path):
    """The failure mode that distinguishes correct incremental apply
    from naive per-batch last-writer-wins: a key DELETED at seq 5 in
    the FIRST micro-batch must stay deleted when its seq-1 UPDATE
    arrives batches later (tombstone + carried seq), and a key whose
    high-seq UPDATE precedes its low-seq INSERT must keep the UPDATE
    payload."""
    from mapreduce_golang_spark.streaming.cdc_stream import streaming_cdc_apply

    target = spark.createDataFrame(
        [(1, "old", 10.0), (2, "old", 20.0)],
        "k bigint, status string, price double",
    )
    changes = spark.createDataFrame(
        [
            # key 1: delete at seq 5 (arrives batch 0), update at seq 1
            # (arrives last batch) — must NOT resurrect
            (1, "zombie", 99.0, 1, "U"),
            (1, None, None, 5, "D"),
            # key 3: update at seq 5 first, insert at seq 1 later —
            # the UPDATE payload must win
            (3, "newest", 30.0, 5, "U"),
            (3, "stale", 3.0, 1, "I"),
        ],
        "k bigint, status string, price double, seq bigint, op string",
    )
    out = streaming_cdc_apply(
        spark, target, changes, "k", str(tmp_path)
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [(2, "old", 20.0), (3, "newest", 30.0)]


def test_state_store_audit_matches_oracle_and_metadata(spark, sf_dir, tmp_path):
    """The state data source must read the dedup checkpoint's key set
    completely (≡ batch DISTINCT) and the state-metadata source must
    list the dedup operator."""
    from mapreduce_golang_spark.sources.tables import load_table
    from mapreduce_golang_spark.streaming.introspection import (
        drain_dedup_checkpoint,
        read_dedup_state,
        state_operator_names,
    )

    cp = drain_dedup_checkpoint(spark, sf_dir, str(tmp_path))
    got = sorted(r.event_id for r in read_dedup_state(spark, cp).collect())
    want = sorted(
        r.event_id
        for r in load_table(spark, sf_dir, "events")
        .select("event_id")
        .distinct()
        .collect()
    )
    assert got == want and len(got) > 0
    ops = state_operator_names(spark, cp)
    assert any("dedupe" in o.lower() for o in ops), ops


def test_ps_orders_profile_matches_native(spark, sf_dir):
    """The pandas-API form must equal the native DataFrame aggregation
    row-for-row."""
    from mapreduce_golang_spark.operators.pandas_api import (
        ps_orders_status_profile,
    )
    from mapreduce_golang_spark.sources.tables import load_table

    native = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("double")), 2).alias(
                "total_revenue"
            ),
            F.round(F.avg(F.col("o_totalprice").cast("double")), 2).alias(
                "avg_price"
            ),
            F.round(F.max(F.col("o_totalprice").cast("double")), 2).alias(
                "max_price"
            ),
        )
    )
    want = sorted(map(tuple, native.collect()))
    got = sorted(map(tuple, ps_orders_status_profile(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_sql_table_udf(spark):
    """CREATE FUNCTION ... RETURNS TABLE — the SQL-defined table
    function surface (the scalar form is oracle-gated via
    sql_udf_price_bands)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION upto(n INT) RETURNS TABLE(i INT) "
        "RETURN SELECT explode(sequence(1, n))"
    )
    assert spark.sql("SELECT sum(i) AS s FROM upto(100)").collect()[0].s == 5050


def test_collation_actually_splits_without_collate(spark, sf_dir):
    """Prove the case-scramble is load-bearing: WITHOUT the collation
    the scrambled keys form strictly more groups, so the collated
    grouping (≡ oracle) is doing real case-insensitive work."""
    from mapreduce_golang_spark.functions.sql_surface import collated_type_counts
    from mapreduce_golang_spark.sources.tables import load_table

    load_table(spark, sf_dir, "part").createOrReplaceTempView("collation_part_v")
    plain = spark.sql(
        """
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                    ELSE lower(p_type) END AS c
        FROM collation_part_v
        """
    ).select("c").distinct().count()
    collated = collated_type_counts(spark, sf_dir).count()
    assert plain > collated > 0


def test_sql_scripting_loop_terminates_at_fixpoint(spark, sf_dir):
    """The WHILE loop's threshold must actually cover ≥90% and its
    half must not (minimality of the power-of-two fixpoint)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from mapreduce_golang_spark.sources.tables import load_table

    row = entrymod.queries()["sql_scripting_coverage_threshold"](
        spark, sf_dir
    ).collect()[0]
    orders = load_table(spark, sf_dir, "orders")
    frac_at = lambda t: orders.agg(  # noqa: E731
        F.avg(
            F.when(F.col("o_totalprice").cast("double") <= t, 1.0).otherwise(0.0)
        )
    ).collect()[0][0]
    assert row.covered_frac >= 0.9
    assert frac_at(row.threshold) >= 0.9 > frac_at(row.threshold / 2)


def test_observed_ingest_metrics_empty_input(spark):
    """Round-9 advice #4: sum/min/max observation metrics are None on
    an empty input — the operator must emit a NULL-carrying row, not
    raise TypeError."""
    from mapreduce_golang_spark.operators.corpus import observed_ingest_metrics

    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, n_chars bigint"
    )
    row = observed_ingest_metrics(empty).collect()[0]
    assert row.n_docs == 0
    assert row.n_empty_text == 0
    assert row.total_chars is None
    assert row.min_doc_id is None and row.max_doc_id is None
