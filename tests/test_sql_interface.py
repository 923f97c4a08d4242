from __future__ import annotations

import __spark_entry__ as entrymod
import pytest
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", ["sql_revenue_by_nation_year", "date_dimensions"])
def test_matches_oracle(spark, sf_dir, name):
    n = assert_matches_oracle(spark, entrymod.queries()[name], entrymod.oracle_sql()[name], sf_dir)
    assert n > 0
