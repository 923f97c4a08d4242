"""Partition-invariance: a query's RESULT must not depend on the
physical layout — input partition count or shuffle width. This is the
distributed-correctness contract the oracle checks rely on (the driver
runs sf0.01 on one layout, production runs 1000 executors on another),
and it is exactly what breaks when an operator leans on
partition-local order (ties broken by arrival, floats folded in
partition order before rounding).

Results are COLLECTED under each configuration before comparing —
DataFrames are lazy, so an exceptAll between two uncollected plans
would evaluate both under whichever conf is active at action time and
compare a layout with itself.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

#: queries designed deterministic — every tie has an explicit break,
#: every float is rounded after an order-free aggregate
INVARIANT_QUERIES = [
    "wc",
    "top_k_words",
    "sessionize",
    "ngram_jaccard_pairs",
    "balanced_mixing_sample",
    "value_ntile_deciles",
    "deterministic_doc_sample",
    "hopping_window_counts",
    "zipf_slope",
    "block_dedup_fraction",
    "markov_transitions",
    "bm25_top_docs",
    "rfm_user_segments",
    # round-8 wave 35
    "cdc_orders_state",
    "polymorphic_trigram_topk",
]


def _rows_under_conf(spark, sf_dir, name, n_shuffle):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
    try:
        return sorted(map(tuple, entrymod.queries()[name](spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_result_is_layout_invariant(spark, sf_dir, name):
    narrow = _rows_under_conf(spark, sf_dir, name, 3)
    wide = _rows_under_conf(spark, sf_dir, name, 17)
    assert narrow == wide
    assert narrow  # non-trivial result
