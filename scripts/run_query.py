#!/usr/bin/env python
"""CLI: run any registered engine query and show its result / plan.

    python scripts/run_query.py <query_name> [sf_dir] [--explain] [--limit N]
    python scripts/run_query.py --list
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="queries() key")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--list", action="store_true", help="list available queries")
    ap.add_argument("--explain", action="store_true", help="print the formatted plan instead of rows")
    ap.add_argument("--limit", type=int, default=20)
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    names = sorted(entrymod.queries())
    if args.list or not args.query:
        print("\n".join(names))
        return 0
    if args.query not in entrymod.queries():
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2

    from mapreduce_golang_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = entrymod.queries()[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=80)
        print(f"-- {df.count()} rows total")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
