"""Operator library — one module per family (SURVEY.md §2 inventory).

Import the family you need::

    from mapreduce_golang_spark.operators import dedup, joins, windows
"""

from mapreduce_golang_spark.operators import (  # noqa: F401
    analytics,
    corpus,
    dedup,
    graph,
    joins,
    merge,
    multimodal,
    parity,
    similarity,
    skew,
    text_analysis,
    windows,
    wordcount,
)

__all__ = [
    "analytics",
    "corpus",
    "dedup",
    "graph",
    "joins",
    "merge",
    "multimodal",
    "parity",
    "similarity",
    "skew",
    "text_analysis",
    "windows",
    "wordcount",
]
