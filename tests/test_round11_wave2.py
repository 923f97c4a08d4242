"""Round-11 wave 2: state schema evolution across a restart (guard +
migration + equivalence) and foreachBatch multi-sink exactly-once
fanout (idempotence + injected replay)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def test_evolution_guard_refuses_incompatible_restart(spark, sf_dir, tmp_path):
    """Restarting the evolved (count + sum) aggregation from the
    count-only checkpoint must be REFUSED by the state-schema
    compatibility guard — silent acceptance would hand the new
    aggregate an undefined history."""
    from mapreduce_golang_spark.streaming.schema_evolution import (
        attempt_incompatible_restart,
        drain_era1,
    )

    cp = drain_era1(spark, sf_dir, str(tmp_path))
    exc = attempt_incompatible_restart(spark, sf_dir, str(tmp_path), cp)
    assert exc is not None, "engine silently accepted an evolved state schema"
    msg = str(exc)
    assert "chema" in msg and ("ompatib" in msg or "STATE_STORE" in msg), msg


def test_state_schema_evolution_matches_batch(spark, sf_dir):
    """carried + fresh ≡ one-shot: n_total equals batch count(*) over
    ALL events; era2_value_sum equals batch sum(value) over exactly
    the era-2 rows."""
    from mapreduce_golang_spark.sources.tables import load_table
    from mapreduce_golang_spark.streaming.schema_evolution import (
        ERA_SPLIT,
        N_CHUNKS,
        state_schema_evolution_counts,
    )

    events = load_table(spark, sf_dir, "events")
    want = sorted(
        map(
            tuple,
            events.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_total"),
                F.round(
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.pmod("event_id", F.lit(N_CHUNKS)) >= ERA_SPLIT,
                                F.col("value"),
                            )
                        ),
                        F.lit(0.0),
                    ),
                    2,
                ).alias("era2_value_sum"),
            )
            .collect(),
        )
    )
    got = sorted(
        map(tuple, state_schema_evolution_counts(spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0


def test_carried_counts_read_the_store_exactly(spark, sf_dir, tmp_path):
    """The statestore read of the era-1 checkpoint must equal batch
    counts over exactly the era-1 rows — no phantom or missing keys."""
    from mapreduce_golang_spark.sources.tables import load_table
    from mapreduce_golang_spark.streaming.schema_evolution import (
        ERA_SPLIT,
        N_CHUNKS,
        drain_era1,
        read_carried_counts,
    )

    cp = drain_era1(spark, sf_dir, str(tmp_path))
    got = sorted(map(tuple, read_carried_counts(spark, cp).collect()))
    want = sorted(
        map(
            tuple,
            load_table(spark, sf_dir, "events")
            .where(F.pmod("event_id", F.lit(N_CHUNKS)) < ERA_SPLIT)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("old_n"))
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_fanout_writer_is_idempotent(spark, tmp_path):
    """Calling the foreachBatch function TWICE with the same
    (df, batch_id) — the replay contract — must leave single-copy
    sinks."""
    from mapreduce_golang_spark.streaming.fanout import make_fanout_writer

    sink_raw = str(tmp_path / "raw")
    sink_agg = str(tmp_path / "agg")
    df = spark.createDataFrame(
        [(1, 10, "click", "2024-01-01 00:00:01", 1.5)],
        "event_id bigint, user_id bigint, event_type string, ts_s string, value double",
    ).select(
        "event_id", "user_id", "event_type",
        F.to_timestamp("ts_s").alias("ts"), "value",
    )
    write = make_fanout_writer(sink_raw, sink_agg)
    write(df, 7)
    write(df, 7)  # the replay
    assert spark.read.parquet(sink_raw).count() == 1
    agg = spark.read.parquet(sink_agg).collect()
    assert len(agg) == 1 and agg[0].n == 1


def test_fanout_replay_round_trip(spark, sf_dir, tmp_path):
    """Full pipeline with the injected replay: both sinks must agree
    with batch count(*) per type, and the replayed batch's directory
    must exist in both sinks (it really re-ran)."""
    from mapreduce_golang_spark.sources.tables import load_table
    from mapreduce_golang_spark.streaming.fanout import run_fanout_with_replay

    replayed = run_fanout_with_replay(spark, sf_dir, str(tmp_path))
    for sink in ("sink_raw", "sink_agg"):
        assert os.path.isdir(str(tmp_path / sink / f"batch={replayed}"))
    raw = (
        spark.read.parquet(str(tmp_path / "sink_raw"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    want = sorted(
        map(
            tuple,
            load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect(),
        )
    )
    assert sorted(map(tuple, raw.collect())) == want
    agg = (
        spark.read.parquet(str(tmp_path / "sink_agg"))
        .groupBy("event_type")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    assert sorted(map(tuple, agg.collect())) == want


def test_schema_evolution_rocksdb_state_store(spark, sf_dir, tmp_path):
    """The evolution proof under the RocksDB state store provider —
    the 100 TB state-scale path: the schema guard must still refuse
    the evolved plan, and the statestore reader must carry the counts
    out of a RocksDB-held checkpoint exactly."""
    import os

    from mapreduce_golang_spark.sources.tables import load_table
    from mapreduce_golang_spark.streaming.schema_evolution import (
        ERA_SPLIT,
        N_CHUNKS,
        attempt_incompatible_restart,
        drain_era1,
        read_carried_counts,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        cp = drain_era1(spark, sf_dir, str(tmp_path))
        got = sorted(map(tuple, read_carried_counts(spark, cp).collect()))
        exc = attempt_incompatible_restart(spark, sf_dir, str(tmp_path), cp)
    finally:
        spark.conf.set(key, old)
    want = sorted(
        map(
            tuple,
            load_table(spark, sf_dir, "events")
            .where(F.pmod("event_id", F.lit(N_CHUNKS)) < ERA_SPLIT)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("old_n"))
            .collect(),
        )
    )
    assert got == want and len(got) > 0
    assert exc is not None, "RocksDB path silently accepted an evolved schema"
    msg = str(exc)
    assert "chema" in msg and ("ompatib" in msg or "STATE_STORE" in msg), msg
    # prove RocksDB actually held the state: zip/changelog layout,
    # never the HDFS provider's .delta files
    state_dir = os.path.join(cp, "state")
    names = [
        f
        for _, _, fs in os.walk(state_dir)
        for f in fs
        if not f.startswith(".")
    ]
    assert names and not any(f.endswith(".delta") for f in names)
    assert any(f.endswith((".zip", ".changelog")) for f in names)
