"""Property-based tests (hypothesis): the invariants the reference's
harness checks by construction — distributed == sequential for ANY
(mapf, reducef), tokenizer fidelity across implementations — hold for
generated inputs, not just fixtures.
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod  # noqa: F401 — ensures sys.path wiring
from mapreduce_golang_spark.plans.mapreduce import run_job
from mapreduce_golang_spark.plans.mrapps import _tokens

# text with unicode letters, digits, punctuation, whitespace — plus the
# categories where \w-based and \p{L}-based classes diverge (No/Nl
# superscripts and fractions, modifier letters, marks)
TEXTS = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Lo", "Lt", "Lm", "Nd", "Nl", "No", "Po", "Zs", "Cc", "Mn", "So"),
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


@given(st.lists(TEXTS, min_size=1, max_size=25))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_tokenizer_python_matches_spark_regex(spark, texts):
    # the Python mrapps tokenizer and the Spark \p{L} tokenizer must
    # agree on arbitrary unicode input (Go unicode.IsLetter semantics);
    # each example checks a batch of texts in one DataFrame round-trip
    # (8 examples x 25 texts ≈ 200 generated inputs per run)
    from pyspark.sql import functions as F

    from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    rows = (
        df.select("i", F.array_remove(F.split("text", LETTERS_ONLY_RE), "").alias("t"))
        .orderBy("i")
        .collect()
    )
    for row in rows:
        assert row.t == _tokens(texts[row.i])


def test_tokenizer_divergent_codepoints_match_jvm(spark):
    # regression for the Unicode-version skew: codepoints Python's
    # [^\W\d_] accepts but the JVM \p{L} rejects (U+12F90 Cypro-Minoan,
    # '²' No-category) must be separators in BOTH tokenizers
    from pyspark.sql import functions as F

    from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE

    text = "a\U00012F90b x²y"
    py_tokens = _tokens(text)
    df = spark.createDataFrame([(text,)], ["text"])
    spark_tokens = df.select(
        F.array_remove(F.split("text", LETTERS_ONLY_RE), "").alias("t")
    ).collect()[0].t
    assert spark_tokens == py_tokens == ["a", "b", "x", "y"]


def test_unicode_compat_table_current(spark):
    # the baked divergence table must match the running engines: every
    # listed codepoint classifies as recorded, and a deterministic
    # stride-sample of all other codepoints shows no NEW divergence
    from pyspark.sql import functions as F

    from mapreduce_golang_spark.functions._unicode_compat import JVM_NOT_PY, PY_NOT_JVM

    py_letter = re.compile(r"[^\W\d_]")
    listed = sorted(PY_NOT_JVM | JVM_NOT_PY)
    sample = [
        cp
        for cp in range(0, 0x110000, 17)
        if not (0xD800 <= cp <= 0xDFFF) and cp not in PY_NOT_JVM and cp not in JVM_NOT_PY
    ]
    rows = [(cp, chr(cp), bool(py_letter.match(chr(cp)))) for cp in listed + sample]
    df = spark.createDataFrame(rows, ["cp", "ch", "py_letter"])
    diff = {
        r.cp
        for r in df.withColumn("jvm_letter", F.col("ch").rlike(r"^\p{L}$"))
        .where(F.col("py_letter") != F.col("jvm_letter"))
        .collect()
    }
    assert diff == set(PY_NOT_JVM), "letter-classification drift vs baked _unicode_compat table"
    assert not JVM_NOT_PY  # currently empty; regenerate the table if this fires


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


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
DOC_TEXTS = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join)


@given(st.lists(DOC_TEXTS, min_size=1, max_size=12))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_dedup_matches_bruteforce(spark, texts):
    # Spark incremental_dedup == a direct Python reference on arbitrary
    # tiny corpora: exact via normalized-text hash precedence, near via
    # full-set 3-shingle Jaccard >= 0.5 against the corpus partition.
    from mapreduce_golang_spark.operators.dedup import incremental_dedup

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r.status for r in incremental_dedup(df, max_doc_freq=None).collect()}

    def shingles(t):
        toks = [w for w in t.split() if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    def norm(t):
        return t.strip().lower()

    batch = [(i, t) for i, t in docs if i % 10 == 0]
    corpus = [(i, t) for i, t in docs if i % 10 != 0]
    corpus_norms = {norm(t) for _, t in corpus}
    want = {}
    seen_batch_norms = set()
    for i, t in sorted(batch):
        if norm(t) in corpus_norms or norm(t) in seen_batch_norms:
            want[i] = "dup_exact"
            continue
        seen_batch_norms.add(norm(t))
        sb = shingles(t)
        near = any(
            sb and sa and len(sb & sa) / len(sb | sa) >= 0.5
            for sa in (shingles(tc) for _, tc in corpus)
        )
        want[i] = "dup_near" if near else "kept"
    assert got == want


@given(st.lists(DOC_TEXTS, min_size=1, max_size=12))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repetition_ratio_matches_bruteforce(spark, texts):
    # Spark repetition_ratio == a direct Python reference on arbitrary
    # tiny corpora; ratios stay in [0, 1] and empty docs yield zeros.
    from mapreduce_golang_spark.operators.text_analysis import repetition_ratio

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: r for r in repetition_ratio(df).collect()}
    for i, t in enumerate(texts):
        toks = [w.lower() for w in t.split() if w]
        bigrams = [f"{toks[j]} {toks[j+1]}" for j in range(len(toks) - 1)]
        row = got[i]
        assert row.n_words == len(toks)
        assert row.n_distinct_words == len(set(toks))
        assert row.n_bigrams == len(bigrams)
        assert row.n_distinct_bigrams == len(set(bigrams))
        want_wr = round(1 - len(set(toks)) / len(toks), 6) if toks else 0.0
        want_br = round(1 - len(set(bigrams)) / len(bigrams), 6) if bigrams else 0.0
        assert abs(row.word_rep_ratio - want_wr) < 1e-9
        assert abs(row.bigram_rep_ratio - want_br) < 1e-9
        assert 0.0 <= row.word_rep_ratio <= 1.0 and 0.0 <= row.bigram_rep_ratio <= 1.0


@given(st.lists(st.sampled_from(["s0", "s1", "s2"]), min_size=1, max_size=20))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_balanced_mixing_quota_invariants(spark, sources):
    # exactly ceil(sqrt(n_s)) docs per source, quota <= n, and the
    # selection is a function of doc_id hashes only (stable under rerun)
    import math

    from mapreduce_golang_spark.operators.corpus import balanced_mixing_sample

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sources)], ["doc_id", "source"]
    )
    rows = balanced_mixing_sample(df).collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append(r)
    counts = {}
    for s in sources:
        counts[s] = counts.get(s, 0) + 1
    for s, n in counts.items():
        assert len(per[s]) == math.ceil(math.sqrt(n))
        assert all(r.n_source_docs == n for r in per[s])
        assert all(r.quota <= n for r in per[s])


@given(st.lists(TEXTS, min_size=1, max_size=12))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bigram_counts_match_bruteforce(spark, texts):
    # Spark's shifted-slice zip_with bigrams == a Python reference over
    # the same letters-only token streams, for arbitrary unicode text
    from collections import Counter

    from mapreduce_golang_spark.operators.text_analysis import bigram_counts

    expected = Counter()
    for t in texts:
        toks = _tokens(t)
        expected.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r.bigram: r.cnt for r in bigram_counts(df, k=10**6).collect()}
    assert got == dict(expected)


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=40, unique=True))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_deterministic_sample_matches_python_arithmetic(spark, ids):
    # the engine-portable hash must equal plain Python int arithmetic
    # for any doc_id, negative included — Python's % and Spark's pmod
    # are both non-negative-mod (the DuckDB oracle wraps its % to match)
    from mapreduce_golang_spark.operators.corpus import (
        KNUTH_HASH_CONST,
        deterministic_doc_sample,
    )

    expected = {
        i for i in ids if ((i % 2**31) * KNUTH_HASH_CONST) % 1000 < 100
    }
    df = spark.createDataFrame(
        [(i, "s", "en", 1) for i in ids], ["doc_id", "source", "lang", "n_chars"]
    )
    got = {r.doc_id for r in deterministic_doc_sample(df).collect()}
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=20),     # day offset
            st.floats(min_value=0.1, max_value=100.0, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gap_fill_locf_matches_bruteforce(spark, rows):
    """The distributed LOCF gap-fill must equal a per-user Python
    brute force (dense day grid, carry last observed max forward) for
    arbitrary sparse inputs."""
    import datetime as dt

    from mapreduce_golang_spark.operators.windows import gap_fill_locf

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    data = [
        (i, base + dt.timedelta(days=d), u, "click", v, "{}")
        for i, (u, d, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        r.user_id: (r.n_days, r.n_observed, r.n_filled, r.sum_locf)
        for r in gap_fill_locf(df).collect()
    }
    by_user: dict = {}
    for u, d, v in rows:
        day_vals = by_user.setdefault(u, {})
        day_vals[d] = max(day_vals.get(d, float("-inf")), v)
    for u, day_vals in by_user.items():
        d0, d1 = min(day_vals), max(day_vals)
        last, total = None, 0.0
        for d in range(d0, d1 + 1):
            if d in day_vals:
                last = day_vals[d]
            total += last
        n_days = d1 - d0 + 1
        n_obs = len(day_vals)
        # Spark's round() is HALF_UP on the double's shortest decimal
        # repr; Python's round() is half-even — a sum landing exactly
        # on a .xxxx5 representable edge (hypothesis found 1.03125)
        # legitimately differs by 1e-4 between the two. The model
        # replicates the operator's rounding EXACTLY, so the pinned
        # property is bit-equality — no residual tolerance that would
        # obscure which contract the test asserts (round-12 advice #3).
        want_total = float(
            Decimal(repr(total)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )
        want = (n_days, n_obs, n_days - n_obs, want_total)
        assert got[u][:3] == want[:3]
        assert got[u][3] == want[3]


@given(st.integers(min_value=1, max_value=200))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ntile_bucket_sizes_differ_by_at_most_one(spark, n):
    """NTILE(10)'s defining property: within a group, bucket sizes
    differ by at most 1 and larger buckets come first."""
    from mapreduce_golang_spark.operators.analytics import value_ntile_deciles

    df = spark.createDataFrame(
        [(i, None, 0, "t", float(i % 17), "{}") for i in range(n)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sizes = {r.decile: r.n for r in value_ntile_deciles(df).collect()}
    counts = [sizes.get(d, 0) for d in range(1, 11)]
    present = [c for c in counts if c > 0]
    assert sum(counts) == n
    assert max(present) - min(present) <= 1
    # non-increasing: ntile front-loads the remainder
    assert all(a >= b for a, b in zip(counts, counts[1:]))


@given(
    st.lists(
        st.tuples(st.floats(min_value=0.1, max_value=1000.0, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ewma_bounded_by_trailing_extremes(spark, vals):
    """Renormalized truncated EWMA is a convex combination of the
    trailing window — it can never leave [min, max] of the last
    EWMA_HORIZON values (catches weight or normalization bugs for ANY
    value sequence)."""
    from mapreduce_golang_spark.operators.windows import EWMA_HORIZON, ewma_user_value

    rows = [
        (i, 1, float(v[0]), f"2024-01-01 00:{i:02d}:00") for i, v in enumerate(vals)
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "user_id", "value", "ts_str"]
    ).selectExpr("event_id", "user_id", "value", "CAST(ts_str AS TIMESTAMP) AS ts")
    out = sorted(ewma_user_value(events).collect(), key=lambda r: r.event_id)
    seq = [float(v[0]) for v in vals]
    for i, r in enumerate(out):
        window = seq[max(0, i - EWMA_HORIZON + 1) : i + 1]
        assert min(window) - 1e-4 <= r.ewma <= max(window) + 1e-4, (i, r.ewma, window)


@given(st.lists(st.sampled_from("abc"), min_size=2, max_size=40))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_markov_rows_sum_to_one(spark, types):
    """Each prev_type's outgoing probabilities sum to 1 (within
    rounding) and counts total n_events - n_users for ANY event-type
    sequence."""
    from collections import defaultdict

    from mapreduce_golang_spark.operators.windows import markov_transitions

    rows = [(i, 1, t, f"2024-01-01 00:00:{i:02d}") for i, t in enumerate(types)]
    events = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts_str"]
    ).selectExpr("event_id", "user_id", "event_type", "CAST(ts_str AS TIMESTAMP) AS ts")
    out = markov_transitions(events).collect()
    assert sum(r.n for r in out) == len(types) - 1
    by_prev = defaultdict(float)
    for r in out:
        by_prev[r.prev_type] += r.prob
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


@given(st.integers(min_value=4, max_value=40))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rfm_quartile_digits_in_range(spark, n_users):
    """Every RFM digit lands in 1..4 and the segment code recomposes
    from the digits, for any user-count shape."""
    from mapreduce_golang_spark.operators.analytics import rfm_user_segments

    rows = []
    eid = 0
    for u in range(n_users):
        for k in range((u % 3) + 1):
            eid += 1
            rows.append((eid, u, float(u + k + 1), f"2024-01-{(u % 27) + 1:02d} 00:00:00"))
    events = spark.createDataFrame(
        rows, ["event_id", "user_id", "value", "ts_str"]
    ).selectExpr("event_id", "user_id", "value", "CAST(ts_str AS TIMESTAMP) AS ts")
    out = rfm_user_segments(events).collect()
    assert len(out) == n_users
    for r in out:
        assert 1 <= r.r <= 4 and 1 <= r.f <= 4 and 1 <= r.m <= 4
        assert r.segment == r.r * 100 + r.f * 10 + r.m


@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kcore_matches_python_bruteforce(spark, raw_edges):
    from mapreduce_golang_spark.operators.graph import KCORE_K, kcore_docs

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges})
    # Python reference: iterative pruning to fixpoint
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        drop = [n for n, nb in adj.items() if len(nb) < KCORE_K]
        changed = bool(drop)
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    expected = {n: len(nb) for n, nb in adj.items()}

    nodes = sorted({x for e in edges for x in e}) or [1]
    docs = spark.createDataFrame([(n, "x") for n in nodes], ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(a, b, 0.9) for a, b in edges] or [(0, 0, 0.0)], ["doc_a", "doc_b", "jaccard"]
    )
    if not edges:
        pairs = pairs.where("doc_a < doc_b")
    got = {r.doc_id: r.core_degree for r in kcore_docs(docs, pairs=pairs).collect()}
    assert got == expected


@given(
    st.lists(st.tuples(st.integers(1, 500), st.floats(0.1, 100.0)), min_size=2, max_size=12)
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_twap_matches_python_bruteforce(spark, steps):
    import datetime as dtm

    from mapreduce_golang_spark.operators.windows import time_weighted_user_value

    # strictly increasing timestamps from cumulative positive gaps
    t, rows, series = 0, [], []
    for i, (gap_s, value) in enumerate(steps):
        ts = dtm.datetime(2024, 1, 1) + dtm.timedelta(seconds=t)
        rows.append((i, ts, 1, "view", value, "{}"))
        series.append((t, value))
        t += gap_s
    num = sum(v * ((series[i + 1][0] - s) * 1_000_000) for i, (s, v) in enumerate(series[:-1]))
    den = sum((series[i + 1][0] - s) * 1_000_000 for i, (s, _) in enumerate(series[:-1]))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = time_weighted_user_value(events).collect()
    assert len(out) == 1
    assert out[0].twap == round(num / den, 6)
    assert out[0].n_intervals == len(series) - 1


@given(st.lists(st.one_of(st.none(), st.floats(0, 100)), min_size=0, max_size=10))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_snapshot_diff_of_identical_snapshots_is_empty(spark, vals):
    from mapreduce_golang_spark.operators.merge import snapshot_diff

    snap = spark.createDataFrame(
        list(enumerate(vals)) or [(0, None)], "k long, v double"
    )
    assert snapshot_diff(snap, snap, "k", ["v"]).count() == 0
