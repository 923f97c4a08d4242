#!/usr/bin/env python
"""Round-14: parallelize the streaming proofs' chunk-fixture builds.

build_plain_chunks / build_chunked_input write N single-file chunks as
N SEQUENTIAL Spark jobs (filter + coalesce(1) + parquet write each).
The jobs are independent — guide §2.6: submit them from a thread pool
so they overlap. Outputs must be byte-identical modulo parquet
nondeterminism (we compare ROW SETS per chunk file, which is what the
streaming proofs consume).

This A/B times the BUILD step only (the only thing changing) and
verifies per-file row-set equality.
"""
from __future__ import annotations

import gc
import os
import shutil
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.sources.tables import load_table
from mapreduce_golang_spark.streaming.chunks import build_plain_chunks
from mapreduce_golang_spark.tempdirs import scratch_dir

spark = get_spark(app_name="ab-chunk-build")
spark.sparkContext.setLogLevel("ERROR")
entrymod.queries()["wc"](spark, sf_dir).write.format("noop").mode("overwrite").save()

root = scratch_dir("ab_chunks_")


def build_parallel(input_dir: str, n_chunks: int = 4, chunk_range=None) -> str:
    lo, hi = chunk_range if chunk_range is not None else (0, n_chunks)
    os.makedirs(input_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    base = int(time.time()) - 3600

    def one(i: int) -> None:
        stage_dir = f"{input_dir.rstrip('/')}.stage{i}"
        chunk = events.where(F.pmod(F.col("event_id"), F.lit(n_chunks)) == i).coalesce(1)
        chunk.write.mode("overwrite").parquet(stage_dir)
        part = next(
            f for f in os.listdir(stage_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        dst = os.path.join(input_dir, f"chunk_{i:02d}.parquet")
        os.replace(os.path.join(stage_dir, part), dst)
        os.utime(dst, (base + i, base + i))
        shutil.rmtree(stage_dir, ignore_errors=True)

    with ThreadPoolExecutor(max_workers=min(4, hi - lo)) as pool:
        list(pool.map(one, range(lo, hi)))
    return input_dir


# equality: per-chunk row sets
d_old = os.path.join(root, "old")
d_new = os.path.join(root, "new")
build_plain_chunks(spark, sf_dir, d_old)
build_parallel(d_new)
ok = True
for i in range(4):
    a = sorted(map(tuple, spark.read.parquet(os.path.join(d_old, f"chunk_{i:02d}.parquet")).collect()))
    b = sorted(map(tuple, spark.read.parquet(os.path.join(d_new, f"chunk_{i:02d}.parquet")).collect()))
    if a != b:
        ok = False
        print(f"chunk {i}: MISMATCH")
print(f"per-chunk row sets identical = {ok}")

walls = {"old": [], "new": []}
k = 0
for r in range(reps):
    order = [("old", build_plain_chunks), ("new", build_parallel)]
    if r % 2:
        order.reverse()
    for tag, fn in order:
        k += 1
        d = os.path.join(root, f"t{k}")
        gc.collect()
        t0 = time.perf_counter()
        if tag == "old":
            fn(spark, sf_dir, d)
        else:
            fn(d)
        walls[tag].append(time.perf_counter() - t0)
        shutil.rmtree(d, ignore_errors=True)
for tag in ("old", "new"):
    ws = walls[tag]
    print(f"{tag}: min {min(ws):.2f}  med {statistics.median(ws):.2f}  max {max(ws):.2f}")
spark.stop()
