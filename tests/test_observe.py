from __future__ import annotations

from mapreduce_golang_spark.operators.analytics import observed_quality_metrics
from mapreduce_golang_spark.sources.tables import load_table


def test_observation_metrics_single_pass(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    observed, obs = observed_quality_metrics(li)
    n = observed.count()  # the action the metrics ride along with
    metrics = obs.get
    assert metrics["n_rows"] == n
    assert 0 <= metrics["bad_qty"] <= n
    assert 0 <= metrics["bad_discount"] <= n
