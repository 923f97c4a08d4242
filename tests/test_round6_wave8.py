"""Round-6 wave 8: hot-shingle cap audit, equi-depth value bins, MMR
diverse top-k — oracle matches at the test SF plus crafted-input
behavioral checks.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    ["hot_shingles_report", "value_equidepth_bins", "mmr_diverse_topk"],
)
def test_wave8_matches_oracle(spark, sf_dir, name):
    n = assert_matches_oracle(
        spark, entrymod.queries()[name], entrymod.oracle_sql()[name], sf_dir
    )
    assert n > 0


def test_hot_shingles_flags_cap_crossers(spark):
    from mapreduce_golang_spark.operators.dedup import hot_shingles_report

    # letters-only tokenizer: the unique token must be alphabetic
    docs = spark.createDataFrame(
        [
            (i, "common shingle here unique%s tail" % ("a" * (i + 1)), "en", "s", 10)
            for i in range(5)
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r.shingle: r for r in hot_shingles_report(docs, max_doc_freq=3).collect()}
    assert out["common shingle here"].doc_freq == 5
    assert out["common shingle here"].capped  # 5 > cap 3
    # per-doc unique shingles sit at freq 1, uncapped
    assert not out["shingle here uniquea"].capped


def test_equidepth_bins_are_balanced(spark):
    from mapreduce_golang_spark.operators.analytics import value_equidepth_bins

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i % 7, "view", float(i), "{}") for i in range(100)]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.bin: r for r in value_equidepth_bins(events, n_bins=4).collect()}
    assert sum(r.n_rows for r in out.values()) == 100
    # 0..99 uniform → four bins of 25; boundary values go to the lower bin
    assert [out[b].n_rows for b in range(4)] == [25, 25, 25, 25]
    assert out[0].lo is None and out[3].hi is None
    assert out[0].hi == out[1].lo


def test_mmr_prefers_diversity_over_pure_relevance(spark):
    from mapreduce_golang_spark.operators.similarity import mmr_diverse_topk

    # three near-identical vectors close to the centroid direction and
    # one orthogonal-ish outlier: plain top-2 would take two clones;
    # MMR must pick the outlier second.
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),
        (2, [0.998, 0.02]),
        (3, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    # λ=0.3 weights diversity enough that the near-duplicate's ~1.0
    # similarity penalty beats its relevance edge over the outlier
    out = sorted(mmr_diverse_topk(emb, k=2, lam=0.3).collect(), key=lambda r: r.rank)
    assert out[0].rank == 1 and out[1].rank == 2
    assert out[1].vec_id == 3  # the diverse pick, not clone 1
    assert out[0].relevance >= out[1].relevance
