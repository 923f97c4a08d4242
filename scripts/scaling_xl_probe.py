#!/usr/bin/env python
"""Self-multiplied scaling probe: extend the sf0.001→sf0.1 evidence
(SCALING.md, 100× rows) another 1.5 decades by unioning N id-offset,
CONTENT-DECORRELATED copies of the sf0.1 tables (3×/10×/30×) and timing
the heaviest per-family operators on the result.

Why decorrelation matters: a naive N-fold copy of `documents` makes
every doc an exact near-dup of its N−1 clones, so pair-join outputs
(and SemDeDup cluster sizes) grow N² BY CONSTRUCTION — that measures
the synthetic corpus, not the operator. Each copy therefore gets
content perturbed just enough to kill cross-copy similarity while
preserving within-copy structure:

- documents: every token gets a copy-specific letters-only suffix — an
  ISOMORPHIC token mapping, so each copy's internal near-dup graph,
  shingle document frequencies, and Jaccard structure are preserved
  bit-identically while cross-copy shingle overlap is exactly zero.
  (A first attempt spliced a tag token between words instead; that
  collapses every 3-shingle to a bigram-keyed key, bigram dfs dwarf
  trigram dfs, within-copy similarity inflates, and the pair joins
  measure the corrupted corpus, not the operator — minhash_lsh_pairs
  went 8 s → 621 s at 30× from candidate blowup. Suffixing is the
  similarity-preserving perturbation.)
- embeddings: copy-specific deterministic sign-flip on ~half the dims
  (murmur3 parity) — cross-copy cosine ≈ 0, norms and within-copy
  geometry unchanged.
- events: user_id/event_id offset per copy, calendar kept — hour/day
  groups densify N×, user cardinality scales N× (how real traffic
  grows).
- lineitem: l_orderkey offset per copy — N× baskets, same part/supplier
  dimensions (fact grows, dims don't — the 100 TB shape).

All perturbations are pure JVM column expressions; fixture build is a
one-time cost written under .xl_fixtures/ (gitignored).

Run:  python scripts/scaling_xl_probe.py            # writes SCALING_XL.md
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
XL_ROOT = os.path.join(REPO, ".xl_fixtures")
MULTS = [3, 10, 30]

#: (query, driving table) — heaviest representative per family
PROBES = [
    # documents: pair-join dedup family + iterative BPE + sparse cosine
    ("exact_dedup", "documents"),
    ("ngram_jaccard_pairs", "documents"),
    ("minhash_lsh_pairs", "documents"),
    ("incremental_dedup", "documents"),
    ("kcore_docs", "documents"),
    ("bpe_learn_merges", "documents"),
    ("tfidf_cosine_pairs", "documents"),
    ("prefix_filter_jaccard_pairs", "documents"),
    ("heaps_law_fit", "documents"),
    # embeddings: clustering / ANN / Arrow kernels
    ("semdedup_survivors", "embeddings"),
    ("semdedup_hier_survivors", "embeddings"),
    ("ann_ivf_topk", "embeddings"),
    ("kmeans_silhouette", "embeddings"),
    ("embedding_stats_arrow", "embeddings"),
    # events: windowed time-series / drift
    ("hourly_value_ohlc", "events"),
    ("sessionize", "events"),
    ("weekly_psi_series", "events"),
    ("rolling_median_value", "events"),
    # lineitem: Apriori / profiling / skew advisory
    ("basket_triple_itemsets", "lineitem"),
    ("lineitem_column_profile", "lineitem"),
    ("join_key_skew_advisory", "lineitem"),
    # round-8 capability additions
    ("cdc_orders_state", "orders"),
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _multiply(spark, mult: int, out_dir: str, tables: list[str] | None = None) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in tables if tables is not None else TABLES:
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        dst = f"{out_dir}/{t}.parquet"
        marker = f"{dst}.done"
        if os.path.exists(marker):
            continue
        if os.path.exists(dst):  # partial build from a crashed run
            import shutil

            shutil.rmtree(dst)
        if t in ("region", "nation", "customer", "supplier", "part"):
            # dimensions do not scale — the 100 TB shape
            src.write.mode("overwrite").parquet(dst)
            with open(marker, "w") as mf:
                mf.write("ok\n")
            continue
        for c in range(mult):
            cp = src
            if t == "documents":
                if c > 0:
                    # letters-only suffix (split is [^\p{L}]+) keyed by
                    # copy: "word" -> "wordzqbc" for c=12 etc.
                    alpha = "abcdefghijklmnopqrstuvwxyz"
                    tag = "zq" + alpha[c // 26] + alpha[c % 26]
                    cp = cp.withColumn(
                        "text",
                        F.regexp_replace(F.col("text"), r"(\p{L}+)", rf"$1{tag}"),
                    )
                cp = cp.withColumn("doc_id", F.col("doc_id") + F.lit(c * 10_000_000))
            elif t == "embeddings":
                if c > 0:
                    cp = cp.withColumn(
                        "embedding",
                        F.expr(
                            "transform(embedding, (x, i) -> "
                            f"IF(pmod(hash(i * 1000003 + {c}), 2) = 0, -x, x))"
                        ),
                    )
                cp = cp.withColumn("vec_id", F.col("vec_id") + F.lit(c * 10_000_000))
            elif t == "events":
                cp = (
                    cp.withColumn("event_id", F.col("event_id") + F.lit(c * 100_000_000))
                    .withColumn("user_id", F.col("user_id") + F.lit(c * 10_000_000))
                )
            elif t == "lineitem":
                cp = cp.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(c * 100_000_000)
                )
            elif t == "orders":
                cp = cp.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(c * 100_000_000)
                )
            # one copy per write (append) — bounds peak memory at any
            # multiplier, unlike an N-way union materialized at once
            cp.write.mode("overwrite" if c == 0 else "append").parquet(dst)
        with open(marker, "w") as mf:
            mf.write("ok\n")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # the 30× corpus needs real heap in local mode (one JVM is driver +
    # all 32 executor threads); must be set before the JVM launches
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell"
    )
    import __spark_entry__ as entrymod
    from mapreduce_golang_spark.session import get_spark

    spark = get_spark(app_name="scaling-xl-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    dirs = {1: BASE}
    for m in MULTS:
        d = os.path.join(XL_ROOT, f"sf0.1x{m}")
        print(f"building {d} ...", flush=True)
        _multiply(spark, m, d)
        dirs[m] = d

    rows: dict[tuple[int, str], int] = {}
    for m, d in dirs.items():
        for t in {t for _, t in PROBES}:
            rows[(m, t)] = spark.read.parquet(f"{d}/{t}.parquet").count()

    results: dict[str, list[tuple[int, int, float]]] = {}
    for name, table in PROBES:
        series = []
        for m in [1, *MULTS]:
            # drop cross-query JVM state before timing: operators that
            # localCheckpoint intermediate tables leave RDD blocks
            # referenced until Python GC runs, and accumulated blocks
            # from EARLIER probes poison later timings with GC pressure
            # (observed: minhash@x3 145 s inside a long session vs 7.6 s
            # standalone — same code, same data)
            import gc

            gc.collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                qs[name](spark, dirs[m]).write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - t0
            except Exception as exc:  # noqa: BLE001 — record, keep probing
                print(f"  {name} @x{m} FAILED: {exc}", flush=True)
                wall = float("nan")
            series.append((m, rows[(m, table)], wall))
        results[name] = series
        print(name, [f"x{m}:{n}r/{s:.1f}s" for m, n, s in series], flush=True)

    lines = [
        "# SCALING_XL — self-multiplied sf0.1 probe (3× / 10× / 30× rows)",
        "",
        "Generated by `scripts/scaling_xl_probe.py` on local[32]. Copies are",
        "content-decorrelated (see script docstring) so pair-join outputs do",
        "not grow quadratically by construction; dimensions are NOT scaled.",
        "µs/row must stay flat or fall as rows grow 30× past the largest",
        "driver fixture — one more 1.5-decade of the 100 TB extrapolation.",
        "",
        "| query | rows x1 | s x1 | s x3 | s x10 | s x30 | µs/row x1 | µs/row x30 | per-row growth |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, series in results.items():
        (m1, n1, s1), *rest = series
        cells = [name, str(n1), f"{s1:.1f}"]
        for _, _, s in rest:
            cells.append(f"{s:.1f}")
        n30, s30 = series[-1][1], series[-1][2]
        us1 = 1e6 * s1 / max(n1, 1)
        us30 = 1e6 * s30 / max(n30, 1)
        cells += [f"{us1:.1f}", f"{us30:.1f}", f"{us30 / max(us1, 1e-9):.2f}×"]
        lines.append("| " + " | ".join(cells) + " |")
    with open(os.path.join(REPO, "SCALING_XL.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING_XL.md")
    spark.stop()


if __name__ == "__main__":
    main()
