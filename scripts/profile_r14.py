#!/usr/bin/env python
"""Round-14 isolation profiler: min-of-N walls + committed plans.

For each named query (or the built-in round-14 target list): clear the
derived caches, time the noop-sink execution N times, and write
``plans/r14/<query>_before.txt`` (or ``_after.txt`` with --after) with
the ``explain("formatted")`` output so plan claims are checkable
without running Spark.

Usage:
    python scripts/profile_r14.py [--after] [--reps N] [q1 q2 ...]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the remaining >=2.3 s tier of the r13 clean pass (BENCH_DETAIL at
# 7fc91de), minus the streaming stop/restart proofs (documented walls)
# and the queries already fixed post-pass (lineitem_column_profile,
# char_trigram_logprob, simhash*, streaming_near_dup_docs)
DEFAULT_TARGETS = [
    "component_best_representative",
    "near_dup_weighted_pagerank",
    "near_dup_pagerank",
    "split_leakage_audit",
    "leakage_safe_splits",
    "semdedup_hier_survivors",
    "ccnet_perplexity_buckets",
    "ccnet_bucket_sample",
    "near_dup_reachability",
    "near_dup_pipeline",
    "dup_cluster_size_hist",
    "kcore_docs",
    "near_dup_clustering_coeff",
    "corpus_funnel_report",
    "near_dup_survivors",
    "near_dup_components",
    "semdedup_survivors",
    "corpus_final_selection",
    "minhash_ml_crosscheck",
    "minhash_ml_crosscheck_scaled",
    "sql_scripting_coverage_threshold",
    "prefix_filter_jaccard_pairs",
    "ngram_jaccard_pairs",
    "mmr_diverse_topk",
    "near_dup_triangles",
    "near_dup_degree_hist",
    "basket_triple_itemsets",
    "containment_pairs",
    "embedding_pca_topvar",
    "bootstrap_mean_ci",
    "order_reconciliation_audit",
    "minhash_estimate_error",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "_before"
    if "--after" in args:
        args.remove("--after")
        suffix = "_after"
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    targets = args or DEFAULT_TARGETS

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from mapreduce_golang_spark.session import get_spark

    spark = get_spark(app_name="profile-r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["wc"](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(plans_dir, exist_ok=True)

    rows = []
    for name in targets:
        if name not in qs:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        walls = []
        for _ in range(reps):
            entrymod.reset_derived_caches()
            gc.collect()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r14-profile: {name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        entrymod.reset_derived_caches()
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        rows.append((name, min(walls), statistics.median(walls), max(walls)))
        print(
            f"{name:40s} min {min(walls):6.2f}  med {statistics.median(walls):6.2f}"
            f"  max {max(walls):6.2f}  (n={reps})",
            flush=True,
        )

    print("\n| query | min | median | max |")
    print("|---|---|---|---|")
    for name, mn, md, mx in rows:
        print(f"| {name} | {mn:.2f} | {md:.2f} | {mx:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
