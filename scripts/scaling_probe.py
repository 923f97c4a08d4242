#!/usr/bin/env python
"""Empirical scaling probe: time representative queries at sf0.001 /
sf0.01 / sf0.1 (100× input spread) and report per-row throughput.

The 100 TB claim is an extrapolation; this is its measured foundation:
an operator whose wall-clock grows ~linearly (or better) with input
rows across two decades of scale factor, with flat-or-falling µs/row,
has no hidden super-linear term (all-pairs joins, driver loops,
unbounded state) at the scales we can observe. Writes SCALING.md.

Run: python scripts/scaling_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

#: (query, driving table) — the table whose row count sets the scale
PROBES = [
    ("wc", "documents"),
    ("q1_pricing_summary", "lineitem"),
    ("q3_shipping_priority", "lineitem"),
    ("hourly_event_counts", "events"),
    ("sessionize", "events"),
    ("hopping_window_counts", "events"),
    ("exact_dedup", "documents"),
    ("ngram_jaccard_pairs", "documents"),
    ("minhash_lsh_pairs", "documents"),
    ("ann_ivf_topk", "embeddings"),
    ("sentence_stats", "documents"),
    ("user_retention_cohorts", "events"),
    ("block_dedup_fraction", "documents"),
    ("containment_pairs", "documents"),
    ("markov_transitions", "events"),
    ("ewma_user_value", "events"),
    ("rfm_user_segments", "events"),
    ("centroid_outliers", "embeddings"),
    ("char_trigram_logprob", "documents"),
    ("user_path_trigrams", "events"),
    ("kcore_docs", "documents"),
    ("time_weighted_user_value", "events"),
    ("value_mad_anomalies", "events"),
    ("session_incident_overlap", "events"),
    ("customer_snapshot_diff", "customer"),
    ("winsorized_value_stats", "events"),
    ("event_weekday_chi2", "events"),
    ("near_dup_weighted_pagerank", "documents"),
    ("source_quality_drift", "documents"),
    # round-6 additions — the new families' heaviest representatives
    ("dsir_importance_weights", "documents"),
    ("ccnet_perplexity_buckets", "documents"),
    ("leakage_safe_splits", "documents"),
    ("split_leakage_audit", "documents"),
    ("bpe_merge_candidates", "documents"),
    ("event_type_cooccurrence", "events"),
    ("kmeans_silhouette", "embeddings"),
    ("decontaminated_corpus", "documents"),
    ("component_best_representative", "documents"),
    ("source_token_js_divergence", "documents"),
    ("mmr_diverse_topk", "embeddings"),
    ("rake_keywords", "documents"),
    ("conversion_latency_stats", "events"),
    ("user_value_pareto", "events"),
    # waves 11-18 — the heaviest representative of each new family
    ("bpe_learn_merges", "documents"),
    ("bpe_encode_stats", "documents"),
    ("semdedup_survivors", "embeddings"),
    ("hourly_value_ohlc", "events"),
    ("part_name_near_matches", "part"),
    ("ngram_diversity_by_source", "documents"),
    ("quality_dup_calibration", "documents"),
    ("jl_projection_qa", "embeddings"),
    ("multi_touch_attribution", "events"),
    ("rolling_median_value", "events"),
    ("order_basket_rules", "lineitem"),
    ("rrf_hybrid_ranking", "documents"),
    ("value_psi_drift", "events"),
    ("event_rate_spikes", "events"),
    ("nation_share_shift", "orders"),
    ("bootstrap_mean_ci", "events"),
    ("km_gap_survival", "events"),
    ("source_stopword_similarity", "documents"),
    ("value_hour_regression", "events"),
    # round-7 additions — the Arrow-native boundary pair
    ("embedding_stats_arrow", "embeddings"),
    ("label_centroids_arrow", "embeddings"),
    # waves 23-24 — heaviest representative per family (kendall's
    # day-pair grid is calendar-bounded: µs/row must FALL with rows)
    ("spearman_time_value", "events"),
    ("kendall_tau_daily", "events"),
    ("cusum_hourly_changepoint", "events"),
    ("duplicate_shingle_fraction", "documents"),
    ("heaps_law_fit", "documents"),
    ("embedding_isotropy_report", "embeddings"),
    # waves 27-29 — heaviest representative per family
    ("value_distribution_distances", "events"),
    ("join_key_skew_advisory", "lineitem"),
    ("flesch_reading_ease_by_source", "documents"),
    ("brand_price_elasticity", "lineitem"),
    ("nation_revenue_inequality", "orders"),
    ("nelson_aalen_hazard", "events"),
    ("tfidf_cosine_pairs", "documents"),
    ("median_order_stat_ci", "events"),
    ("changepoint_segmented_trend", "events"),
    ("basket_triple_itemsets", "lineitem"),
    ("weekly_psi_series", "events"),
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import __spark_entry__ as entrymod
    from mapreduce_golang_spark.session import get_spark
    from mapreduce_golang_spark.sources.tables import load_table

    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    rows = {}
    for sf in SFS:
        for t in {t for _, t in PROBES}:
            rows[(sf, t)] = load_table(spark, sf, t).count()

    # warmup
    spark.read.parquet(f"{SFS[0]}/lineitem.parquet").write.format("noop").mode("overwrite").save()

    results: dict[str, list[tuple[int, float]]] = {}
    for name, table in PROBES:
        series = []
        for sf in SFS:
            t0 = time.perf_counter()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            series.append((rows[(sf, table)], time.perf_counter() - t0))
        results[name] = series
        print(name, [f"{n}r/{s:.2f}s" for n, s in series])

    lines = [
        "# SCALING — measured wall-clock across sf0.001 → sf0.1 (100× rows)",
        "",
        "Generated by `scripts/scaling_probe.py` on local[32]; per-row",
        "microseconds should be flat or falling as input grows (fixed overhead",
        "amortizes). A rising µs/row column is a super-linear red flag.",
        "",
        "| query | rows@sf | wall s | µs/row | wall s | µs/row | wall s | µs/row | wall growth | µs/row growth |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, series in results.items():
        cells = [name, f"{series[0][0]}/{series[1][0]}/{series[2][0]}"]
        for n, s in series:
            cells.append(f"{s:.2f}")
            cells.append(f"{1e6 * s / max(n, 1):.1f}")
        growth = series[2][1] / max(series[0][1], 1e-9)
        # per-row growth divides out the actual row spread (tables differ:
        # most span 100×, embeddings spans 4×) — ≤1× means sub-linear,
        # the number the 100 TB extrapolation stands on
        per_row = growth / (series[2][0] / max(series[0][0], 1))
        cells.append(f"{growth:.1f}×")
        cells.append(f"{per_row:.2f}×")
        lines.append("| " + " | ".join(cells) + " |")
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")
    spark.stop()


if __name__ == "__main__":
    main()
