#!/usr/bin/env python
"""Negative-zero sweep — the regression guard for the round-6 verdict's
-0.0 canonicalization bug.

IEEE -0.0 == 0.0, but engines RENDER it differently: DuckDB's
``round(corr(...), 6)`` can emit ``-0`` where Spark emits ``0`` (and
vice versa for any signed rounded float that lands on zero), and the
grading driver compares rendered values, so one -0.0 flips a query red
at whatever SF happens to produce it. The repo-wide fix is ``+ 0.0``
after the round on both sides (see lineitem_price_stats,
type_hourly_correlation, hourly_acf, type_crosscorr_leadlag,
value_hour_regression, zipf_slope) plus canonicalization in
tests/oracle.py::_canon; THIS script is the empirical check that no
query in either engine still emits a -0.0 anywhere.

Run:  python scripts/negzero_sweep.py            # both engines, sf0.001+sf0.01
      python scripts/negzero_sweep.py --duckdb   # oracle side only (fast)

Exit 1 if any -0.0 is found; prints the query and columns.
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def negzero_cols(pdf) -> list[str]:
    import numpy as np

    cols = []
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype.kind == "f":
            v = s.to_numpy()
            if ((v == 0.0) & np.signbit(v)).any():
                cols.append(c)
        elif s.dtype == object:
            for x in s:
                if isinstance(x, float) and x == 0.0 and math.copysign(1, x) < 0:
                    cols.append(c)
                    break
    return cols


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod

    duckdb_only = "--duckdb" in sys.argv
    hits: list[str] = []

    osql = entrymod.oracle_sql()
    for sf in SFS:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        for name, sql in osql.items():
            try:
                bad = negzero_cols(con.execute(sql).fetchdf())
            except Exception as exc:  # noqa: BLE001 — sweep must record, not die
                print(f"duckdb {sf} {name}: ERR {exc}"[:160])
                continue
            if bad:
                hits.append(f"duckdb {sf} {name}: {bad}")
        con.close()
        print(f"duckdb {sf} done", flush=True)

    if not duckdb_only:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
            .appName("negzero-sweep")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("FATAL")
        qs = entrymod.queries()
        for sf in SFS:
            for name, fn in qs.items():
                try:
                    bad = negzero_cols(fn(spark, sf).toPandas())
                except Exception as exc:  # noqa: BLE001
                    print(f"spark {sf} {name}: ERR {exc}"[:160])
                    continue
                if bad:
                    hits.append(f"spark {sf} {name}: {bad}")
            print(f"spark {sf} done", flush=True)
        spark.stop()

    for h in hits:
        print("NEGZERO", h)
    print("clean" if not hits else f"{len(hits)} hit(s)")
    return 1 if hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
