"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduce_golang_spark/``; this module only
wires the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_golang_spark.operators import wordcount
from mapreduce_golang_spark.sources.tables import load_table

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: W1 word count over documents.text at sf0.001."""
    docs = load_table(spark, _SMOKE_SF_DIR, "documents")
    return wordcount.word_count(docs, text_col="text")


# --------------------------------------------------------------------------
# queries() — one entry per implemented operator (SURVEY.md §2)
# --------------------------------------------------------------------------


def _wc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wordcount.word_count(load_table(spark, sf_dir, "documents"), text_col="text")


def _top_k_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wordcount.top_k_words(load_table(spark, sf_dir, "documents"), k=20, text_col="text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wc": _wc,
        "top_k_words": _top_k_words,
    }


# --------------------------------------------------------------------------
# oracle_sql() — DuckDB twins (ANSI-ish SQL over the same parquet views)
# --------------------------------------------------------------------------

_WC_TOKENS = r"""
    SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
    FROM documents
"""

_ORACLES: dict[str, str] = {
    "wc": f"""
        SELECT word, COUNT(*) AS cnt
        FROM ({_WC_TOKENS})
        WHERE word <> ''
        GROUP BY word
    """,
    "top_k_words": f"""
        SELECT word, COUNT(*) AS cnt
        FROM ({_WC_TOKENS})
        WHERE word <> ''
        GROUP BY word
        ORDER BY cnt DESC, word ASC
        LIMIT 20
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
