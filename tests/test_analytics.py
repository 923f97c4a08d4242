from __future__ import annotations

import __spark_entry__ as entrymod
import pytest
from tests.oracle import assert_matches_oracle

ORACLE_CHECKED = [
    "value_percentiles",
    "event_type_user_stats",
    "users_purchase_not_error",
    "users_signup_and_purchase",
    "event_counts_pivot",
    "last_click_before_purchase",
    "mr_wc",
    "event_value_hmean",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_matches_oracle(spark, sf_dir, name):
    n = assert_matches_oracle(spark, entrymod.queries()[name], entrymod.oracle_sql()[name], sf_dir)
    assert n > 0


def test_approx_distinct_within_rsd(spark, sf_dir):
    exact = {
        r.event_type: r.n_users
        for r in entrymod.queries()["event_type_user_stats"](spark, sf_dir).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in entrymod.queries()["approx_distinct_users"](spark, sf_dir).collect()
    }
    for t, exact_n in exact.items():
        assert abs(approx[t] - exact_n) / exact_n < 0.15  # 3× the 5% rsd


def test_every_query_has_oracle_or_documented_exemption():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    # the only intentionally oracle-less query is the HLL sketch
    assert qs - oracles == {"approx_distinct_users"}
