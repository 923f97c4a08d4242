"""Property-based tests (hypothesis) for the round-7 statistic packs:
metric-space and estimator invariants that must hold for ANY generated
input — distances vanish on identical distributions and respect their
ranges, kappa/MI/Theil-U land in their documented intervals, the
inequality indices are scale-invariant, and Nelson–Aalen never exceeds
−ln(KM).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod  # noqa: F401 — ensures sys.path wiring
from mapreduce_golang_spark.operators import analytics as A
from mapreduce_golang_spark.operators import text_analysis as T
from mapreduce_golang_spark.operators import windows as W

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_T0 = dt.datetime(2024, 1, 1)

VALUES = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
    min_size=2,
    max_size=24,
)


@given(VALUES)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distances_zero_on_identical_and_bounded(spark, vals):
    # duplicate the same value multiset under two type labels: every
    # distance must be EXACTLY zero (same bins, same CDFs); KS and the
    # CvM integral are bounded by 1 regardless of input
    rows = [
        (i * 2 + j, _T0, 1, t, v, None)
        for i, v in enumerate(vals)
        for j, t in enumerate(("a", "b"))
    ]
    out = A.value_distribution_distances(
        spark.createDataFrame(rows, _EV_SCHEMA)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.ks, r.w1, r.cvm, r.energy) == (0.0, 0.0, 0.0, 0.0)


@given(VALUES, VALUES)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distances_ranges_and_nonnegativity(spark, va, vb):
    rows = [(i, _T0, 1, "a", v, None) for i, v in enumerate(va)]
    rows += [(len(va) + i, _T0, 1, "b", v, None) for i, v in enumerate(vb)]
    r = A.value_distribution_distances(
        spark.createDataFrame(rows, _EV_SCHEMA)
    ).collect()[0]
    assert 0.0 <= r.ks <= 1.0
    assert 0.0 <= r.cvm <= 1.0
    assert r.w1 >= 0.0 and r.energy >= -1e-9


WORDS = st.lists(
    st.sampled_from(["the", "cat", "sat", "zebra", "qqq", "123", "Fox!"]),
    min_size=1,
    max_size=12,
)


@given(st.lists(WORDS, min_size=1, max_size=8))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kappa_bounded_and_po_consistent(spark, docs):
    rows = [(i, " ".join(ws), "en", "s", 1) for i, ws in enumerate(docs)]
    r = T.cohens_kappa_langid(
        spark.createDataFrame(rows, _DOC_SCHEMA)
    ).collect()[0]
    assert -1.0 - 1e-9 <= r.kappa <= 1.0 + 1e-9
    assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0


@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("xy")),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mutual_information_nonneg_and_nmi_bounded(spark, pairs):
    rows = [(i, "t", lang, f"s{src}", 1) for i, (src, lang) in enumerate(pairs)]
    r = T.mutual_information_source_lang(
        spark.createDataFrame(rows, _DOC_SCHEMA)
    ).collect()[0]
    # MI ≥ 0 up to the 6-dp rounding of the two marginal folds
    assert r.mi_nats >= -1e-6
    assert -1e-6 <= r.nmi <= 1.0 + 1e-6


@given(
    st.lists(st.sampled_from("ab"), min_size=2, max_size=30),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_theil_u_bounded(spark, seq):
    rows = [
        (i, _T0 + dt.timedelta(minutes=i), 1, t, 1.0, None)
        for i, t in enumerate(seq)
    ]
    r = W.theil_u_event_transitions(
        spark.createDataFrame(rows, _EV_SCHEMA)
    ).collect()[0]
    assert -1e-6 <= r.theil_u <= 1.0 + 1e-6
    assert r.h_cond >= -1e-6


@given(
    st.lists(
        st.floats(min_value=1.0, max_value=1e4, allow_nan=False),
        min_size=2,
        max_size=12,
    ),
    st.floats(min_value=0.5, max_value=8.0, allow_nan=False),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_inequality_scale_invariance(spark, revenues, scale):
    # Gini / Theil / Atkinson are relative measures: multiplying every
    # revenue by a constant must not move them (beyond 6-dp rounding
    # and the decimal(18,2) revenue quantization)
    def run(mult):
        orders = spark.createDataFrame(
            [
                (i, i, "O", round(v * mult, 2), _T0, "1-P")
                for i, v in enumerate(revenues)
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        cust = spark.createDataFrame(
            [(i, f"c{i}", 0, 0.0, "S") for i in range(len(revenues))],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
            "c_mktsegment string",
        )
        nat = spark.createDataFrame(
            [(0, "N", 0)], "n_nationkey int, n_name string, n_regionkey int"
        )
        return A.nation_revenue_inequality(orders, cust, nat).collect()[0]

    base, scaled = run(1.0), run(scale)
    # cents-quantization of each revenue perturbs the indices by at
    # most ~1e-2/min(revenue) relative — bound the drift accordingly
    tol = 0.02 / min(revenues) + 2e-6
    assert scaled.gini == pytest.approx(base.gini, abs=tol)
    assert scaled.theil_within == pytest.approx(base.theil_within, abs=tol)
    assert scaled.atkinson == pytest.approx(base.atkinson, abs=tol)
