"""Concurrent-session behavior: a BI engine serves many queries on one
SparkSession at once. Spark's scheduler is thread-safe (jobs from
different threads interleave in the DAG scheduler), but OUR operator
layer must also be re-entrant — shared lazy caches (the checkpointed
pair graph, localCheckpoint intermediates) and per-query builders must
not corrupt each other. This runs a diverse slice of the registered
surface from worker threads and asserts bit-identical results to the
sequential baseline.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import __spark_entry__ as entrymod

# a deliberately heterogeneous slice: scan-agg, window, join, iterative
# graph loop, checkpointed operators (pair graph / distance grid /
# postings), and an Arrow kernel
NAMES = [
    "wc",
    "q1_pricing_summary",
    "sessionize",
    "near_dup_components",
    "value_distribution_distances",
    "tfidf_cosine_pairs",
    "embedding_stats_arrow",
    "join_key_skew_advisory",
]


def _canon_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(v) for v in row)
        for row in df.select(*cols).collect()
    )


def test_concurrent_equals_sequential(spark, sf_dir):
    qs = entrymod.queries()

    sequential = {n: _canon_rows(qs[n](spark, sf_dir)) for n in NAMES}

    def run(name):
        return name, _canon_rows(qs[name](spark, sf_dir))

    with ThreadPoolExecutor(max_workers=len(NAMES)) as pool:
        concurrent = dict(pool.map(run, NAMES))

    for n in NAMES:
        assert concurrent[n] == sequential[n], n
        assert len(sequential[n]) > 0, n


def test_repeated_invocation_is_stable(spark, sf_dir):
    # operators that materialize checkpoints must return the same
    # result when built twice in one session (no stale-cache bleed)
    qs = entrymod.queries()
    for n in ("value_distribution_distances", "tfidf_cosine_pairs"):
        a = _canon_rows(qs[n](spark, sf_dir))
        b = _canon_rows(qs[n](spark, sf_dir))
        assert a == b, n
