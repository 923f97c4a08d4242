from __future__ import annotations

import os

from mapreduce_golang_spark.sources.formats import compact_parquet
from mapreduce_golang_spark.sources.tables import load_table


def _parquet_files(path):
    out = []
    for root, _d, files in os.walk(path):
        out += [f for f in files if f.endswith(".parquet")]
    return out


def test_compaction_collapses_small_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # simulate streaming-ingest fragmentation: 40 tiny files
    load_table(spark, sf_dir, "lineitem").repartition(40).write.parquet(src)
    assert len(_parquet_files(src)) == 40

    n = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n == 1  # the whole sf0.001 table is far under 128 MB
    assert len(_parquet_files(dst)) == 1
    assert spark.read.parquet(dst).count() == spark.read.parquet(src).count()
