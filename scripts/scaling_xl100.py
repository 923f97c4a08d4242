#!/usr/bin/env python
"""100× scaling proof for the heaviest operators (round-9 verdict #5).

SURVEY's design claim is 100-TB / 100× survival; the measured evidence
in SCALING_XL.md previously stopped at 30×. This script extends the
self-multiplied, CONTENT-DECORRELATED fixture ladder (see
scaling_xl_probe.py docstring for why naive copies would measure the
synthetic corpus, not the operator) to 100× for the four operators the
round-9 verdict named:

- semdedup_hier_survivors  (hierarchical SemDeDup — the r8 scale-killer,
  fixed r9; must stay flat past the fix)
- incremental_dedup        (batch-vs-corpus: corpus never self-joined)
- ngram_jaccard_pairs      (the pair-graph FIRST DERIVATION — caches are
  cleared before every timed run, so each run pays the full derivation)
- streaming_near_dup_docs  (micro-batch near-dup: state-store drain +
  integer signature)

Later rounds widened the PROBES list past the original four (round 11:
the banded-LSH join, the Apriori lattice, the pair-graph component
and iterative-loop consumers, and the wave-38 streaming proofs).

Protocol is the established noisy-host estimator (scaling_xl_median.py
docstring: this Firecracker box has multi-regime throughput, single
shots spread up to 15×): MIN over N interleaved repeats, scale rotating
inside each repeat, derived caches + Spark cache cleared before every
timed run. Only the fixtures the SELECTED probes drive are built
(documents/embeddings for the original four; lineitem and events
joined the ladder in round 11), at 10×/30×/100×.

Run:  python scripts/scaling_xl100.py [N] [probe1,probe2,...]
      # default N=3, all PROBES; the optional second arg restricts
      # the run (e.g. re-proving one row after a fix)
Appends a table to SCALING_XL.md.
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = "/root/testdata/sf0.1"
XL_ROOT = os.path.join(REPO, ".xl_fixtures")
MULTS = [10, 30, 100]

PROBES = [
    ("ngram_jaccard_pairs", "documents"),
    ("incremental_dedup", "documents"),
    ("streaming_near_dup_docs", "documents"),
    ("semdedup_hier_survivors", "embeddings"),
    # round-11 tier (round-10 verdict #4): the next-heaviest operators
    # without a 100× row — the banded-LSH join, the Apriori level-3
    # lattice, and the two pair-graph component-loop consumers
    ("minhash_lsh_pairs", "documents"),
    ("basket_triple_itemsets", "lineitem"),
    ("leakage_safe_splits", "documents"),
    ("split_leakage_audit", "documents"),
    # round-11 extra tier: the iterative checkpointed loop (10 genuine
    # pagerank iterations on the pair graph), the multi-branch funnel
    # report, and the by-design re-deriving calibration — the last
    # heavy family without a 100× row
    ("near_dup_weighted_pagerank", "documents"),
    ("corpus_funnel_report", "documents"),
    ("minhash_estimate_error", "documents"),
    # round-11 wave-38 streaming proofs on the events ladder: the
    # timed wall INCLUDES each proof's own chunk-fixture build (the
    # query stages its input), so these rows bound the whole proof,
    # not just the streaming engine work
    ("state_schema_evolution_counts", "events"),
    ("foreach_batch_fanout", "events"),
    # round-11 blanket: the last pair-graph consumers above ~4.8 s
    # cold without their own 100× row (family shape already proven,
    # these close the tier completely)
    ("component_best_representative", "documents"),
    ("dup_cluster_size_hist", "documents"),
    ("near_dup_pagerank", "documents"),
    # round-12 blanket: the two remaining >4.8 s cold queries without
    # a 100× row — the dual-leg MinHash calibration (MLlib + hand-
    # rolled, rows-only by design) and the kill-recover proof (the
    # timed wall includes its own chunk-fixture build and both run
    # phases, same convention as the wave-38 proof rows)
    ("minhash_ml_crosscheck", "documents"),
    ("streaming_kill_recover_dedup", "events"),
    # round-13 (verdict #3): the corpus-scaled-numFeatures leg — the
    # remedy the round-12 MLlib-bend caveat recommends, on the same
    # ladder so its per-row µs is directly comparable to the pinned row
    ("minhash_ml_crosscheck_scaled", "documents"),
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
    # the 100× corpus needs real heap in local mode (one JVM is driver
    # + all 32 executor threads); must be set before the JVM launches
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell")
    import __spark_entry__ as entrymod
    from scaling_xl_probe import _multiply
    from mapreduce_golang_spark.session import get_spark

    spark = get_spark(app_name="scaling-xl-100")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    need = sorted({t for _, t in probes})
    dirs = {1: BASE}
    for m in MULTS:
        d = os.path.join(XL_ROOT, f"sf0.1x{m}")
        print(f"building {d} ({need}) ...", flush=True)
        _multiply(spark, m, d, tables=need)
        dirs[m] = d

    rows = {}
    for m, d in dirs.items():
        for t in need:
            rows[(m, t)] = spark.read.parquet(f"{d}/{t}.parquet").count()

    qs["wc"](spark, BASE).write.format("noop").mode("overwrite").save()  # warmup

    walls: dict[tuple[str, int], list[float]] = {}
    for rep in range(n_reps):
        for name, _t in probes:
            for m, d in dirs.items():
                entrymod.reset_derived_caches()
                gc.collect()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                try:
                    qs[name](spark, d).write.format("noop").mode("overwrite").save()
                    w = time.perf_counter() - t0
                except Exception as exc:  # noqa: BLE001 — record, keep probing
                    print(f"rep{rep} {name} x{m} FAILED: {exc}", flush=True)
                    w = float("nan")
                walls.setdefault((name, m), []).append(w)
                print(f"rep{rep} {name} x{m}: {w:.1f}s", flush=True)

    scales = [1, *MULTS]
    lines = [
        "",
        f"## 100× extension — min-of-{n_reps} interleaved (round 10)",
        "",
        "Same protocol as the min-of-N table above (cache-cleared cold",
        "runs, scale rotated inside each repeat, minimum as the",
        "intrinsic-cost estimator on this multi-regime host), extended",
        "to a 100× content-decorrelated corpus for the four operators",
        "the round-9 verdict named. Per-row growth compares µs/row at",
        "100× vs 1×; ≤1× means per-row cost is flat-or-falling across",
        "two decades of scale.",
        "",
        "| query | min s x1 | x10 | x30 | x100 | µs/row x1 | µs/row x100 | per-row growth | max/min spread |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, table in probes:
        mins, spread = {}, 0.0
        for m in scales:
            series = [w for w in walls[(name, m)] if w == w]  # drop NaN
            mins[m] = min(series) if series else float("nan")
            if series:
                spread = max(spread, max(series) / max(min(series), 1e-9))
        us1 = 1e6 * mins[1] / rows[(1, table)]
        us100 = 1e6 * mins[100] / rows[(100, table)]
        lines.append(
            "| " + " | ".join(
                [
                    name,
                    f"{mins[1]:.1f}", f"{mins[10]:.1f}", f"{mins[30]:.1f}", f"{mins[100]:.1f}",
                    f"{us1:.1f}", f"{us100:.2f}",
                    f"{us100 / max(us1, 1e-9):.2f}×",
                    f"{spread:.1f}×",
                ]
            ) + " |"
        )
    with open(os.path.join(REPO, "SCALING_XL.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended 100× table to SCALING_XL.md")
    spark.stop()


if __name__ == "__main__":
    main()
