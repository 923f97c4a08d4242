from __future__ import annotations

import __spark_entry__ as entrymod
import pytest
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "string_functions",
        "math_functions",
        "array_functions",
        "weighted_median_value",
        "event_value_histogram",
        "lineitem_price_stats",
        "data_quality_report",
    ],
)
def test_matches_oracle(spark, sf_dir, name):
    n = assert_matches_oracle(spark, entrymod.queries()[name], entrymod.oracle_sql()[name], sf_dir)
    assert n > 0
