"""Z-order layout: the clustered write must (a) preserve data exactly
and (b) give every file a tight min-max envelope in BOTH dimensions —
the property parquet data skipping prunes on — where a one-dimensional
sort leaves the second dimension unclustered.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_golang_spark.sources.layout import (
    file_span_report,
    z_interleave,
    zorder_write,
)
from mapreduce_golang_spark.sources.tables import load_table


def test_z_interleave_known_values(spark):
    # z(x=0b11, y=0b00) = 0b0101 = 5 ; z(0b00, 0b11) = 0b1010 = 10
    df = spark.range(1).select(
        z_interleave(F.lit(3), F.lit(0)).alias("a"),
        z_interleave(F.lit(0), F.lit(3)).alias("b"),
        z_interleave(F.lit(3), F.lit(3)).alias("c"),
    )
    row = df.collect()[0]
    assert (row.a, row.b, row.c) == (5, 10, 15)


@pytest.fixture()
def events_small(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "user_id", F.unix_micros("ts").alias("t_us"), "value")


def test_zorder_write_roundtrips_exactly(spark, events_small, tmp_path):
    out = str(tmp_path / "zorder")
    zorder_write(events_small, out, "user_id", "t_us", n_files=4)
    back = spark.read.parquet(out)
    assert back.exceptAll(events_small).count() == 0
    assert events_small.exceptAll(back).count() == 0


def test_zorder_clusters_both_dimensions(spark, events_small, tmp_path):
    """Files under a user_id-only sort each cover ~the full ts span;
    under z-order every file's coverage of BOTH dimensions must be
    materially below 1.0 on average."""
    z_path = str(tmp_path / "z")
    s_path = str(tmp_path / "s")
    zorder_write(events_small, z_path, "user_id", "t_us", n_files=8)
    (
        events_small.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_path)
    )
    z_cov = file_span_report(spark, z_path, "user_id", "t_us").agg(
        F.avg("x_cover").alias("x"), F.avg("y_cover").alias("y")
    ).collect()[0]
    s_cov = file_span_report(spark, s_path, "user_id", "t_us").agg(
        F.avg("x_cover").alias("x"), F.avg("y_cover").alias("y")
    ).collect()[0]
    # the 1-D sort clusters user_id tightly but leaves ts unclustered
    assert s_cov.y > 0.9
    # z-order: both dimensions clustered — each file covers a strict
    # subset of both spans, and beats the 1-D layout on the ts axis
    assert z_cov.y < 0.6
    assert z_cov.x < 0.6
