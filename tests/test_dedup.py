from __future__ import annotations

import __spark_entry__ as entrymod
import pytest
from tests.oracle import assert_matches_oracle

DEDUP_QUERIES = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "simhash64",
    "simhash_pairs",
    "embedding_cosine_pairs",
]


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_matches_oracle(spark, sf_dir, name):
    n = assert_matches_oracle(spark, entrymod.queries()[name], entrymod.oracle_sql()[name], sf_dir)
    assert n > 0


def test_exact_dedup_collapses_duplicates(spark):
    from mapreduce_golang_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "  hello world "), (3, "different")],
        ["doc_id", "text"],
    )
    rows = {r.keep_doc_id: r.n_copies for r in exact_dedup(df).collect()}
    assert rows == {1: 2, 3: 1}


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    # LSH candidates must contain the true high-jaccard pairs found by
    # the exhaustive n-gram join (recall check at jaccard >= 0.5).
    qs = entrymod.queries()
    exact = {(r.doc_a, r.doc_b) for r in qs["ngram_jaccard_pairs"](spark, sf_dir).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in qs["minhash_lsh_pairs"](spark, sf_dir).collect()}
    assert exact, "fixture should contain planted near-dups"
    assert lsh == exact  # at jaccard>=0.5 with 4 bands of 3, recall is total here


def test_simhash_identical_docs_same_hash(spark):
    from mapreduce_golang_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "alpha beta gamma alpha"), (3, "omega psi chi")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert rows[1] == rows[2]
    assert 0 <= rows[1] < 2**16
