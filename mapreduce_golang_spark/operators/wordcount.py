"""W1 `wc` — word count (the reference's flagship workload).

Relational meaning: ``SELECT word, COUNT(*) GROUP BY word`` over
letters-only case-sensitive tokens (/root/reference/src/mrapps/wc.go:
21-34 map, 41-44 reduce).

Scale notes (100 TB): explode → partial hash-aggregate (map-side
combine) → exchange on `word` → final hash-aggregate. Catalyst plans
the partial agg automatically, which the reference lacks entirely (no
combiner — every ("word","1") pair crosses its shuffle,
/root/reference/src/mr/worker.go:80-92); on Spark only one partial
count per (task, word) crosses. Skewed hot words (stopwords) are
handled by the partial agg; AQE coalesces the post-shuffle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_golang_spark.functions.tokenize import tokenize


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — one row per distinct token."""
    return (
        tokenize(df, text_col=text_col, out="word")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def top_k_words(df: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Top-k tokens by count, deterministic tie-break on the word itself.

    orderBy+limit is a TakeOrderedAndProject physical op — only k rows
    per partition survive to the driver-side merge, so this is safe at
    any input scale.
    """
    return word_count(df, text_col=text_col).orderBy(F.desc("cnt"), F.asc("word")).limit(k)
