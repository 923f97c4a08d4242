"""Property-based tests (hypothesis): the invariants the reference's
harness checks by construction — distributed == sequential for ANY
(mapf, reducef), tokenizer fidelity across implementations — hold for
generated inputs, not just fixtures.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod  # noqa: F401 — ensures sys.path wiring
from mapreduce_golang_spark.plans.mapreduce import run_job
from mapreduce_golang_spark.plans.mrapps import _tokens

# text with unicode letters, digits, punctuation, whitespace
TEXTS = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("Lu", "Ll", "Lo", "Nd", "Po", "Zs", "Cc")
    ),
    max_size=200,
)


@given(st.lists(TEXTS, min_size=1, max_size=6))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_distributed_equals_sequential_any_corpus(spark, docs):
    corpus = [(f"f{i}", t) for i, t in enumerate(docs)]

    def mapf(name, contents):
        return [(w, name) for w in _tokens(contents)]

    def reducef(key, values):
        return ",".join(sorted(values))

    dist = sorted(map(tuple, run_job(spark, mapf, reducef, corpus, n_reduce=3).collect()))
    seq = sorted(map(tuple, run_job(spark, mapf, reducef, corpus, sequential=True).collect()))
    assert dist == seq


@given(TEXTS)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_tokenizer_python_matches_spark_regex(spark, text):
    # the Python mrapps tokenizer and the Spark \p{L} tokenizer must
    # agree on arbitrary unicode input (Go unicode.IsLetter semantics)
    from pyspark.sql import functions as F

    from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE

    py_tokens = _tokens(text)
    df = spark.createDataFrame([(text,)], ["text"])
    spark_tokens = df.select(
        F.array_remove(F.split("text", LETTERS_ONLY_RE), "").alias("t")
    ).collect()[0].t
    assert spark_tokens == py_tokens


def test_tokenizer_known_unicode_edges(spark):
    # spot-check categories where \w-based and \p{L}-based classes
    # could diverge: digits, underscore, CJK, combining, punctuation
    cases = "a_b c1d ñé 漢字 x́y a-b"
    from pyspark.sql import functions as F

    from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE

    df = spark.createDataFrame([(cases,)], ["text"])
    spark_tokens = df.select(
        F.array_remove(F.split("text", LETTERS_ONLY_RE), "").alias("t")
    ).collect()[0].t
    assert spark_tokens == _tokens(cases)
    assert "a" in spark_tokens and "_" not in "".join(spark_tokens)
    assert "漢字" in spark_tokens
