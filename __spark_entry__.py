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

from mapreduce_golang_spark.operators import parity, wordcount
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


def _indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parity.inverted_index(load_table(spark, sf_dir, "documents"))


def _file_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parity.file_counts(load_table(spark, sf_dir, "documents"), file_col="source")


def _crash_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parity.crash_data(load_table(spark, sf_dir, "documents"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wc": _wc,
        "top_k_words": _top_k_words,
        "indexer": _indexer,
        "file_counts": _file_counts,
        "crash_data": _crash_data,
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
    "indexer": r"""
        WITH pairs AS (
            SELECT DISTINCT doc, word
            FROM (
                SELECT source || '/' || CAST(doc_id AS VARCHAR) AS doc,
                       unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
                FROM documents
            )
            WHERE word <> ''
        )
        SELECT word,
               COUNT(*) AS n_docs,
               string_agg(doc, ',' ORDER BY doc) AS docs
        FROM pairs
        GROUP BY word
    """,
    "file_counts": """
        SELECT source AS filename, COUNT(*) AS cnt
        FROM documents
        GROUP BY source
    """,
    "crash_data": """
        WITH kv AS (
            SELECT 'a' AS key, source || '/' || CAST(doc_id AS VARCHAR) AS value FROM documents
            UNION ALL
            SELECT 'b', CAST(length(source || '/' || CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
            UNION ALL
            SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
            UNION ALL
            SELECT 'd', 'xyzzy' FROM documents
        )
        SELECT key, string_agg(value, ' ' ORDER BY value) AS value
        FROM kv
        GROUP BY key
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
