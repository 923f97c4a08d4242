"""Ordered single-file chunk layouts for streaming proofs.

The kill-recover proof (recovery.py) carries its own duplicate-
injecting splitter whose layout is load-bearing for that proof's
docstring; this module is the PLAIN variant shared by the round-11
streaming proofs (state schema evolution, foreachBatch fanout): the
events fixture partitioned into N ordered single-file chunks with
increasing mtimes, each row appearing exactly once, so the streaming
file source (oldest-first) drains them deterministically and a batch
oracle over `events` describes the drained stream exactly.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CHUNK_SCHEMA = "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"


def build_plain_chunks(
    spark: SparkSession,
    sf_dir: str,
    input_dir: str,
    n_chunks: int = 4,
    chunk_range: tuple[int, int] | None = None,
) -> str:
    """Write events rows with ``pmod(event_id, n_chunks)`` in
    ``chunk_range`` (default: all) as ordered single-file chunks under
    ``input_dir``. Each selected row lands exactly once; mtimes
    increase with chunk index. Returns ``input_dir``."""
    from ..sources.tables import load_table

    lo, hi = chunk_range if chunk_range is not None else (0, n_chunks)
    os.makedirs(input_dir, exist_ok=True)
    stage_dir = input_dir.rstrip("/") + ".stage"
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    base = int(time.time()) - 3600
    for i in range(lo, hi):
        chunk = events.where(
            F.pmod(F.col("event_id"), F.lit(n_chunks)) == i
        ).coalesce(1)
        chunk.write.mode("overwrite").parquet(stage_dir)
        part = next(
            f
            for f in os.listdir(stage_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        dst = os.path.join(input_dir, f"chunk_{i:02d}.parquet")
        # rename, not copy: stage dir is a sibling on the same
        # filesystem, and each staged part is consumed exactly once —
        # at the 100× events ladder a byte copy would add four
        # multi-MB copies inside every timed proof wall
        os.replace(os.path.join(stage_dir, part), dst)
        os.utime(dst, (base + i, base + i))
    shutil.rmtree(stage_dir, ignore_errors=True)
    return input_dir
