"""Empty-input hardening: every operator family must return an empty
(correctly-schemed) result on empty input, never throw — the behavior
a 100 TB pipeline needs when a partition/filter legitimately yields
nothing (cf. the reference's tolerance of empty outputs,
/root/reference/src/main/test-mr.sh:90 `grep .`).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], DOCS_SCHEMA)


@pytest.fixture()
def empty_events(spark):
    return spark.createDataFrame([], EVENTS_SCHEMA)


@pytest.fixture()
def empty_emb(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


def test_text_ops_on_empty(spark, empty_docs):
    from mapreduce_golang_spark.operators import dedup, parity, text_analysis, wordcount

    assert wordcount.word_count(empty_docs).count() == 0
    assert parity.inverted_index(empty_docs).count() == 0
    assert parity.crash_data(empty_docs).count() == 0
    assert text_analysis.text_quality(empty_docs).count() == 0
    assert text_analysis.lang_id(spark, empty_docs).count() == 0
    assert text_analysis.doc_fingerprints(empty_docs).count() == 0
    assert dedup.exact_dedup(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0
    assert dedup.simhash_pairs(empty_docs).count() == 0
    assert dedup.near_dup_components(empty_docs).count() == 0


def test_event_ops_on_empty(empty_events):
    from mapreduce_golang_spark.operators import analytics, windows

    assert windows.hourly_event_counts(empty_events).count() == 0
    assert windows.sessionize(empty_events).count() == 0
    assert windows.events_near_errors_range_join(empty_events).count() == 0
    assert analytics.value_percentiles(empty_events).count() == 0
    assert analytics.last_click_before_purchase(empty_events).count() == 0
    assert analytics.event_counts_pivot(empty_events).count() == 0


def test_similarity_on_empty(spark, empty_emb):
    from mapreduce_golang_spark.operators import dedup, similarity

    assert similarity.cosine_topk_bruteforce(empty_emb).count() == 0
    assert similarity.ann_lsh_topk(empty_emb).count() == 0
    assert dedup.embedding_cosine_pairs(empty_emb).count() == 0


def test_run_job_on_empty_corpus(spark):
    from mapreduce_golang_spark.plans import mrapps
    from mapreduce_golang_spark.plans.mapreduce import run_job

    out = run_job(spark, mrapps.wc_map, mrapps.wc_reduce, [], n_reduce=3)
    assert out.count() == 0
    assert out.columns == ["key", "value"]


def test_new_dedup_ops_on_empty(spark, empty_docs, empty_emb):
    from mapreduce_golang_spark.operators import corpus, dedup, similarity

    assert dedup.incremental_dedup(empty_docs).count() == 0
    assert similarity.semantic_dedup_pairs(empty_emb).count() == 0
    assert similarity.semantic_dedup_survivors(empty_emb).count() == 0
    # the funnel on an empty corpus is still 6 rows — all zero
    rows = sorted(
        corpus.corpus_funnel_report(empty_docs).collect(), key=lambda r: r.stage_idx
    )
    assert [r.n_docs for r in rows] == [0] * 6


def test_corpus_analytics_on_empty(spark, empty_docs):
    from mapreduce_golang_spark.operators import corpus, text_analysis

    assert text_analysis.repetition_ratio(empty_docs).count() == 0
    assert text_analysis.cross_source_overlap(empty_docs).count() == 0
    assert corpus.balanced_mixing_sample(empty_docs).count() == 0


def test_round5_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators import analytics, corpus, text_analysis, windows

    assert text_analysis.bigram_counts(empty_docs).count() == 0
    assert corpus.deterministic_doc_sample(empty_docs).count() == 0
    assert analytics.cumulative_active_users(empty_events).count() == 0
    assert windows.event_gap_stats(empty_events).count() == 0
    assert analytics.event_value_hmean(empty_events).count() == 0
    assert windows.hopping_window_counts(empty_events).count() == 0
    assert windows.gap_fill_locf(empty_events).count() == 0
    assert analytics.value_moment_stats(empty_events).count() == 0
    assert analytics.user_retention_cohorts(empty_events).count() == 0
    assert text_analysis.sentence_stats(empty_docs).count() == 0
    assert text_analysis.lang_confusion_matrix(empty_docs).count() == 0
    assert analytics.value_ntile_deciles(empty_events).count() == 0

    assert text_analysis.zipf_slope(empty_docs).count() == 0
    assert text_analysis.pii_scan(empty_docs).count() == 0

    from mapreduce_golang_spark.operators.graph import near_dup_reachability

    # empty pair graph: empty result, not a bogus (NULL, 0) anchor row
    assert near_dup_reachability(spark, empty_docs).count() == 0


def test_wave3_ops_on_empty(spark, empty_docs, empty_events, empty_emb):
    from mapreduce_golang_spark.operators import analytics, dedup, similarity, text_analysis, windows
    from mapreduce_golang_spark.operators.graph import dup_cluster_size_hist, near_dup_degree_hist

    assert text_analysis.duplicate_block_fraction(empty_docs).count() == 0
    assert text_analysis.gopher_quality_flags(empty_docs).count() == 0
    assert text_analysis.token_pmi_pairs(empty_docs).count() == 0
    assert text_analysis.bm25_top_docs(empty_docs).count() == 0
    assert dedup.overlap_containment_pairs(empty_docs).count() == 0
    assert near_dup_degree_hist(empty_docs).count() == 0
    assert dup_cluster_size_hist(empty_docs).count() == 0
    assert windows.markov_transitions(empty_events).count() == 0
    assert windows.ewma_user_value(empty_events).count() == 0
    assert windows.value_zscore_anomalies(empty_events).count() == 0
    assert analytics.rfm_user_segments(empty_events).count() == 0
    assert similarity.centroid_outliers(empty_emb).count() == 0


def test_qa_reports_on_empty(spark, empty_docs, empty_emb):
    from mapreduce_golang_spark.operators.dedup import minhash_estimate_error
    from mapreduce_golang_spark.operators.similarity import ann_recall_report

    assert minhash_estimate_error(empty_docs).count() == 0
    assert ann_recall_report(empty_emb).count() == 0


def test_wave4_ops_on_empty(spark, empty_events, empty_emb):
    from mapreduce_golang_spark.operators.similarity import label_znorm_check
    from mapreduce_golang_spark.operators.windows import user_path_trigrams

    assert user_path_trigrams(empty_events).count() == 0
    assert label_znorm_check(empty_emb).count() == 0


def test_wave5_ops_on_empty(spark, empty_docs):
    from mapreduce_golang_spark.operators.text_analysis import (
        char_trigram_logprob,
        source_lang_entropy,
    )

    assert char_trigram_logprob(empty_docs).count() == 0
    assert source_lang_entropy(empty_docs).count() == 0


def test_wave6_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.graph import kcore_docs
    from mapreduce_golang_spark.operators.merge import snapshot_diff
    from mapreduce_golang_spark.operators.windows import (
        session_incident_overlap,
        time_weighted_user_value,
        value_mad_anomalies,
    )

    empty_pairs = empty_docs.sparkSession.createDataFrame(
        [], "doc_a long, doc_b long, jaccard double"
    )
    assert kcore_docs(empty_docs, pairs=empty_pairs).count() == 0

    from mapreduce_golang_spark.operators.graph import near_dup_weighted_pagerank

    assert near_dup_weighted_pagerank(empty_docs, pairs=empty_pairs).count() == 0
    assert time_weighted_user_value(empty_events).count() == 0
    assert value_mad_anomalies(empty_events).count() == 0
    assert session_incident_overlap(empty_events).count() == 0
    assert snapshot_diff(empty_events, empty_events, "event_id", ["value"]).count() == 0

    from mapreduce_golang_spark.operators.analytics import (
        event_weekday_chi2,
        winsorized_value_stats,
    )
    from mapreduce_golang_spark.operators.merge import incremental_agg_refresh

    assert winsorized_value_stats(empty_events).count() == 0
    assert event_weekday_chi2(empty_events).count() == 0

    from mapreduce_golang_spark.operators.text_analysis import source_quality_drift

    assert source_quality_drift(empty_docs).count() == 0

    assert (
        incremental_agg_refresh(
            empty_events, empty_events, keys=["event_type"], measure="value",
            exact_decimal="decimal(18,2)",
        ).count()
        == 0
    )


def test_round6_mixing_ops_on_empty(spark, empty_docs):
    from mapreduce_golang_spark.operators.dedup import minhash_ml_crosscheck
    from mapreduce_golang_spark.operators.mixing import (
        ccnet_perplexity_buckets,
        dsir_importance_weights,
        quality_classifier_scores,
        source_mixing_weights,
    )
    from mapreduce_golang_spark.operators.text_analysis import eval_decontamination

    assert dsir_importance_weights(empty_docs).count() == 0
    assert quality_classifier_scores(empty_docs).count() == 0
    assert source_mixing_weights(empty_docs).count() == 0
    assert ccnet_perplexity_buckets(empty_docs).count() == 0
    assert eval_decontamination(empty_docs).count() == 0
    # the 1-row comparison report stays well-defined on empty input:
    # zero pairs on both sides, vacuous agreement = 1
    r = minhash_ml_crosscheck(empty_docs).collect()[0]
    assert (r.n_ours, r.n_lib, r.n_common, r.agreement) == (0, 0, 0, 1.0)


def test_round6_wave2_ops_on_empty(spark, empty_docs, empty_emb):
    from mapreduce_golang_spark.operators.corpus import packing_efficiency_report
    from mapreduce_golang_spark.operators.mixing import quality_weighted_sample
    from mapreduce_golang_spark.operators.similarity import embedding_pca_topvar
    from mapreduce_golang_spark.operators.text_analysis import common_sentence_filter

    assert embedding_pca_topvar(empty_emb).count() == 0
    assert quality_weighted_sample(empty_docs).count() == 0
    assert packing_efficiency_report(empty_docs).count() == 0
    assert common_sentence_filter(empty_docs).count() == 0


def test_round6_wave3_ops_on_empty(spark, empty_docs, empty_emb):
    from mapreduce_golang_spark.operators.mixing import corpus_top_p_selection
    from mapreduce_golang_spark.operators.similarity import (
        embedding_quantization_report,
    )
    from mapreduce_golang_spark.operators.text_analysis import bpe_merge_candidates

    assert bpe_merge_candidates(empty_docs).count() == 0
    assert corpus_top_p_selection(empty_docs).count() == 0
    assert embedding_quantization_report(empty_emb).count() == 0


def test_round6_wave4_ops_on_empty(spark, empty_docs):
    from mapreduce_golang_spark.operators.mixing import (
        leakage_safe_splits,
        split_leakage_audit,
        token_budget_allocation,
    )

    assert leakage_safe_splits(empty_docs).count() == 0
    audit = {r.policy: r for r in split_leakage_audit(empty_docs).collect()}
    assert set(audit) == {"doc_hash", "component"}
    for r in audit.values():
        assert r.n_pairs == 0 and r.n_cross_pairs == 0 and r.leakage_frac == 0.0
    assert token_budget_allocation(empty_docs).count() == 0


def test_round6_wave5_ops_on_empty(spark, empty_docs, empty_events, empty_emb):
    from mapreduce_golang_spark.operators.analytics import event_type_cooccurrence
    from mapreduce_golang_spark.operators.mixing import ccnet_bucket_sample
    from mapreduce_golang_spark.operators.similarity import kmeans_silhouette
    from mapreduce_golang_spark.operators.skew import join_key_skew_report

    assert ccnet_bucket_sample(empty_docs).count() == 0
    assert event_type_cooccurrence(empty_events).count() == 0
    assert kmeans_silhouette(empty_emb).count() == 0
    # the skew report is a single-row profile; on empty input the
    # per-key table is empty so the profile collapses to one row of
    # zero keys/rows with NULL percentiles — assert it doesn't throw
    r = join_key_skew_report(empty_events).collect()
    assert len(r) == 1 and r[0].n_keys == 0


def test_round6_wave6_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.analytics import conversion_latency_stats
    from mapreduce_golang_spark.operators.text_analysis import (
        decontaminated_corpus,
        doc_length_cume_dist,
    )
    from mapreduce_golang_spark.operators.windows import user_first_last_events

    r = conversion_latency_stats(empty_events).collect()
    assert len(r) == 1 and r[0].n_converted == 0
    assert decontaminated_corpus(empty_docs).count() == 0
    assert doc_length_cume_dist(empty_docs).count() == 0
    assert user_first_last_events(empty_events).count() == 0


def test_round6_wave7_ops_on_empty(spark, empty_docs, empty_emb):
    from mapreduce_golang_spark.operators.dedup import component_best_representative
    from mapreduce_golang_spark.operators.mixing import source_token_js_divergence
    from mapreduce_golang_spark.operators.similarity import cluster_balanced_sample

    assert component_best_representative(empty_docs).count() == 0
    assert source_token_js_divergence(empty_docs).count() == 0
    assert cluster_balanced_sample(empty_emb).count() == 0


def test_round6_wave8_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.analytics import value_equidepth_bins
    from mapreduce_golang_spark.operators.dedup import hot_shingles_report

    assert hot_shingles_report(empty_docs).count() == 0
    # all-NULL boundary array → every row binned NULL; empty input → no rows
    assert value_equidepth_bins(empty_events).count() == 0


def test_round6_wave9_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.text_analysis import (
        char_script_profile,
        rake_keywords,
    )
    from mapreduce_golang_spark.operators.windows import markov_prediction_accuracy

    assert rake_keywords(empty_docs).count() == 0
    assert char_script_profile(empty_docs).count() == 0
    assert markov_prediction_accuracy(empty_events).count() == 0


def test_round6_wave10_ops_on_empty(spark, empty_events):
    from mapreduce_golang_spark.operators.analytics import user_value_pareto
    from mapreduce_golang_spark.operators.windows import session_duration_histogram

    r = user_value_pareto(empty_events).collect()
    assert len(r) == 1 and r[0].n_users == 0
    assert session_duration_histogram(empty_events).count() == 0


def test_round6_wave11_ops_on_empty(spark, empty_docs, empty_emb):
    from mapreduce_golang_spark.operators.corpus import dataset_card_report
    from mapreduce_golang_spark.operators.similarity import semdedup_survivors
    from mapreduce_golang_spark.operators.text_analysis import bpe_learn_merges

    # no words at all → every round's argmax is empty → empty merges
    assert bpe_learn_merges(empty_docs, n_merges=2).count() == 0
    assert semdedup_survivors(empty_emb).count() == 0
    r = dataset_card_report(empty_docs).collect()
    assert len(r) == 1 and r[0].n_docs == 0 and r[0].dup_frac == 0.0


def test_round6_wave12_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.analytics import monthly_metric_unpivot
    from mapreduce_golang_spark.operators.dedup import part_name_near_matches
    from mapreduce_golang_spark.operators.text_analysis import ngram_diversity_by_source
    from mapreduce_golang_spark.operators.windows import hourly_value_ohlc

    part_schema = StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    )
    orders_schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    empty_part = spark.createDataFrame([], part_schema)
    empty_orders = spark.createDataFrame([], orders_schema)
    assert hourly_value_ohlc(empty_events).count() == 0
    assert monthly_metric_unpivot(empty_orders).count() == 0
    assert part_name_near_matches(empty_part).count() == 0
    assert ngram_diversity_by_source(empty_docs).count() == 0


def test_round6_wave13_ops_on_empty(spark, empty_docs, empty_events, empty_emb):
    from mapreduce_golang_spark.operators.analytics import multi_touch_attribution
    from mapreduce_golang_spark.operators.dedup import normalized_dedup_gain
    from mapreduce_golang_spark.operators.similarity import jl_projection_qa
    from mapreduce_golang_spark.operators.text_analysis import (
        bpe_encode_stats,
        quality_dup_calibration,
    )

    assert bpe_encode_stats(empty_docs, n_merges=2).count() == 0
    assert quality_dup_calibration(empty_docs).count() == 0
    assert normalized_dedup_gain(empty_docs).count() == 0
    assert multi_touch_attribution(empty_events).count() == 0
    r = jl_projection_qa(empty_emb).collect()
    assert len(r) == 1 and r[0].n_pairs == 0


def test_round6_wave14_ops_on_empty(spark, empty_events):
    from pyspark.sql.types import TimestampType as _TS

    from mapreduce_golang_spark.operators.analytics import (
        benford_price_audit,
        k_anonymity_audit,
        order_basket_rules,
    )
    from mapreduce_golang_spark.operators.windows import rolling_median_value

    li_schema = StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    )
    cust_schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    )
    orders_schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    assert rolling_median_value(empty_events).count() == 0
    assert order_basket_rules(spark.createDataFrame([], li_schema)).count() == 0
    assert k_anonymity_audit(spark.createDataFrame([], cust_schema)).count() == 0
    assert benford_price_audit(spark.createDataFrame([], orders_schema)).count() == 0


def test_round6_wave15_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.analytics import value_psi_drift
    from mapreduce_golang_spark.operators.text_analysis import rrf_hybrid_ranking
    from mapreduce_golang_spark.operators.windows import (
        debounced_event_stats,
        event_rate_spikes,
    )

    assert rrf_hybrid_ranking(empty_docs).count() == 0
    assert value_psi_drift(empty_events).count() == 0
    assert debounced_event_stats(empty_events).count() == 0
    assert event_rate_spikes(empty_events).count() == 0


def test_round6_wave16_ops_on_empty(spark, empty_events):
    from mapreduce_golang_spark.operators.analytics import (
        bootstrap_mean_ci,
        part_price_size_skyline,
    )
    from mapreduce_golang_spark.operators.joins import (
        nation_share_shift,
        order_ship_latency,
    )

    part_schema = StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    )
    orders_schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    li_schema = StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_shipdate", TimestampType()),
        ]
    )
    cust_schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    )
    nation_schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    empty_orders = spark.createDataFrame([], orders_schema)
    assert (
        nation_share_shift(
            empty_orders,
            spark.createDataFrame([], cust_schema),
            spark.createDataFrame([], nation_schema),
        ).count()
        == 0
    )
    assert order_ship_latency(empty_orders, spark.createDataFrame([], li_schema)).count() == 0
    assert bootstrap_mean_ci(empty_events).count() == 0
    assert part_price_size_skyline(spark.createDataFrame([], part_schema)).count() == 0


def test_round6_wave17_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.analytics import ab_conversion_ztest
    from mapreduce_golang_spark.operators.corpus import curriculum_phases
    from mapreduce_golang_spark.operators.text_analysis import source_stopword_similarity
    from mapreduce_golang_spark.operators.windows import km_gap_survival

    cust_schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    )
    assert curriculum_phases(empty_docs).count() == 0
    assert source_stopword_similarity(empty_docs).count() == 0
    assert km_gap_survival(empty_events).count() == 0
    assert (
        ab_conversion_ztest(empty_events, spark.createDataFrame([], cust_schema)).count()
        == 0
    )


def test_round6_wave18_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.analytics import (
        value_hour_regression,
        value_qq_drift,
    )
    from mapreduce_golang_spark.operators.text_analysis import bpe_roundtrip_audit

    r = bpe_roundtrip_audit(empty_docs, n_merges=2).collect()
    assert len(r) == 1 and r[0].n_words == 0 and r[0].n_vocab_symbols == 0
    assert value_hour_regression(empty_events).count() == 0
    # empty halves → all 18 percentiles NULL, rows still emitted
    qq = value_qq_drift(empty_events).collect()
    assert len(qq) == 9 and all(r.q_ref is None and r.q_cur is None for r in qq)


def test_round6_wave19_ops_on_empty(spark, empty_docs, empty_events):
    from mapreduce_golang_spark.operators.analytics import (
        part_abc_classification,
        type_hourly_correlation,
    )
    from mapreduce_golang_spark.operators.text_analysis import (
        kwic_snippets,
        template_opening_report,
    )

    li_schema = StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_extendedprice", DoubleType()),
        ]
    )
    assert kwic_snippets(empty_docs).count() == 0
    assert template_opening_report(empty_docs).count() == 0
    assert part_abc_classification(spark.createDataFrame([], li_schema)).count() == 0
    assert type_hourly_correlation(empty_events).count() == 0
