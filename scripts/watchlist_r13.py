#!/usr/bin/env python
"""Round-13 verdict #4: re-measure the round-12 regression watchlist
under the pinned interleaved protocol (min-of-N, caches cleared before
every timed run, queries rotated inside each repeat — the SCALING_XL
estimator for this multi-regime host). The five queries regressed
driver-r11 → driver-r12 with NO code change in the round; the audit
read their plans as sound, so the expectation is host/AQE variance.
This measures it instead of presuming.

Prints a markdown table row per query: min / median / max over N
repeats at sf0.1, next to the r11 and r12 driver walls.
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCH = {
    # name: (driver r11 s, driver r12 s)
    "join_key_skew_advisory": (0.37, 1.38),
    "shuffle_partition_balance": (0.29, 0.77),
    "broadcast_planning_report": (0.63, 1.51),
    "value_distribution_distances": (1.16, 2.34),
    "brand_price_elasticity": (1.10, 2.16),
}

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

import __spark_entry__ as entrymod
from mapreduce_golang_spark.session import get_spark

spark = get_spark(app_name="watchlist-r13")
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
qs["wc"](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup

walls: dict[str, list[float]] = {n: [] for n in WATCH}
names = list(WATCH)
for r in range(reps):
    order = names if r % 2 == 0 else names[::-1]
    for name in order:
        entrymod.reset_derived_caches()
        gc.collect()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[name].append(time.perf_counter() - t0)

print("| query | r11 driver | r12 driver | r13 min | median | max |")
print("|---|---|---|---|---|---|")
for name in names:
    ws = walls[name]
    r11, r12 = WATCH[name]
    print(
        f"| {name} | {r11:.2f} | {r12:.2f} | {min(ws):.2f} "
        f"| {statistics.median(ws):.2f} | {max(ws):.2f} |"
    )
spark.stop()
