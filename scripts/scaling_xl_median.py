#!/usr/bin/env python
"""Min-of-N rerun of the heaviest SCALING_XL rows.

Why: this box (Firecracker microVM, see BASELINE.md round-7 note) has
multi-regime throughput — the SAME minhash_lsh_pairs@x30 run measured
40 s, 80 s, 137 s, 284 s and 621 s across repeats with identical code
and data, and /proc/stat shows kernel time dominating user time during
the slow regimes. Single-shot walls therefore cannot support scaling
conclusions at the tail. The MINIMUM over interleaved repeats is the
standard noisy-host estimator of intrinsic cost (closest to the
steal-free run); this script measures min-of-N interleaved (scale
rotates inside each repetition so a slow regime cannot bias one scale)
and appends a second table to SCALING_XL.md.

Run:  python scripts/scaling_xl_median.py [N] [probe1,probe2,...]
      # default N=3, all PROBES; the optional second arg restricts the
      # run to a named subset (e.g. re-proving one row after a fix)
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
XL_ROOT = os.path.join(REPO, ".xl_fixtures")

#: the rows whose single-shot numbers showed the x30 bend or the widest
#: spread — the doc pair-join family plus the heavy agg rows
PROBES = [
    ("ngram_jaccard_pairs", "documents"),
    ("minhash_lsh_pairs", "documents"),
    ("incremental_dedup", "documents"),
    ("semdedup_survivors", "embeddings"),
    ("semdedup_hier_survivors", "embeddings"),
    ("basket_triple_itemsets", "lineitem"),
    ("lineitem_column_profile", "lineitem"),
    ("bpe_learn_merges", "documents"),
]


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    probes = PROBES
    if len(sys.argv) > 2:
        wanted = set(sys.argv[2].split(","))
        probes = [p for p in PROBES if p[0] in wanted]
        missing = wanted - {p[0] for p in probes}
        if missing:
            raise SystemExit(f"unknown probes: {sorted(missing)}")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell")
    import __spark_entry__ as entrymod
    from mapreduce_golang_spark.session import get_spark

    spark = get_spark(app_name="scaling-xl-median")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    dirs = {1: BASE}
    for m in (3, 10, 30):
        d = os.path.join(XL_ROOT, f"sf0.1x{m}")
        if not os.path.exists(os.path.join(d, "documents.parquet.done")):
            raise SystemExit(f"fixture {d} missing — run scripts/scaling_xl_probe.py first")
        dirs[m] = d

    rows: dict[tuple[int, str], int] = {}
    for m, d in dirs.items():
        for t in {t for _, t in probes}:
            rows[(m, t)] = spark.read.parquet(f"{d}/{t}.parquet").count()

    # warmup
    qs["wc"](spark, BASE).write.format("noop").mode("overwrite").save()

    walls: dict[tuple[str, int], list[float]] = {}
    for rep in range(n_reps):
        for name, _t in probes:
            for m, d in dirs.items():
                # drop the session-lived materialize-once derivations
                # (pair graph, trigram NLL, centroids, …) BEFORE the
                # timed run: without this, repeats of shared-derivation
                # probes hit the localCheckpoint and report ~0 s cached
                # minima (round-8 advice). gc.collect() then lets the
                # ContextCleaner free the orphaned checkpoint blocks.
                entrymod.reset_derived_caches()
                gc.collect()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                w = time.perf_counter() - t0
                walls.setdefault((name, m), []).append(w)
                print(f"rep{rep} {name} x{m}: {w:.1f}s", flush=True)

    lines = [
        "",
        f"## Min-of-{n_reps} rerun (interleaved) — heavy rows",
        "",
        "Single-shot walls above are regime-noisy on this host (see",
        "`scripts/scaling_xl_median.py` docstring: the same query@scale",
        "spread 40–621 s across repeats). Minimum over interleaved",
        "repeats estimates intrinsic cost; per-row growth is computed on",
        "the minima.",
        "",
        "| query | min s x1 | x3 | x10 | x30 | µs/row x1 | µs/row x30 | per-row growth | max/min spread |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, table in probes:
        mins, spread = {}, 0.0
        for m in (1, 3, 10, 30):
            series = walls[(name, m)]
            mins[m] = min(series)
            spread = max(spread, max(series) / max(min(series), 1e-9))
        us1 = 1e6 * mins[1] / rows[(1, table)]
        us30 = 1e6 * mins[30] / rows[(30, table)]
        lines.append(
            "| " + " | ".join(
                [
                    name,
                    f"{mins[1]:.1f}", f"{mins[3]:.1f}", f"{mins[10]:.1f}", f"{mins[30]:.1f}",
                    f"{us1:.1f}", f"{us30:.1f}",
                    f"{us30 / max(us1, 1e-9):.2f}×",
                    f"{spread:.1f}×",
                ]
            ) + " |"
        )
    with open(os.path.join(REPO, "SCALING_XL.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended min-of-N table to SCALING_XL.md")
    spark.stop()


if __name__ == "__main__":
    main()
