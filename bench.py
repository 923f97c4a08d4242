#!/usr/bin/env python
"""Benchmark harness — times every driver-contract query at the bench
scale factor and prints ONE JSON line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": 0.1, ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32 → master local[N]).

Each query is forced end-to-end with the noop sink (full execution,
no driver-side collect). A short warmup query absorbs JVM/codegen
startup so per-query numbers measure the plan, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    import __spark_entry__ as entrymod
    from mapreduce_golang_spark.session import get_spark

    spark = get_spark(app_name="mapreduce-golang-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # record, keep benching the rest
            failures[name] = f"{type(e).__name__}: {e}"[:200]

    sf_token = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_token)
    except ValueError:
        sf = sf_token

    result = {
        "metric": "total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "master": spark.sparkContext.master,
        "spark_version": spark.version,
    }
    if failures:
        result["failures"] = failures
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
