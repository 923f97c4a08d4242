#!/usr/bin/env python
"""Round-14 A/B: mmr_diverse_topk with an INCREMENTAL running max-sim.

The current loop recomputes max_{s in S} cos(v, s) against ALL i-1
selected rows every round (a broadcast crossJoin that fans each
candidate out i-1 ways + a groupBy(vec_id) hash agg per round):
O(n*k^2/2) cosines and k-1 aggregation exchanges total. But the MMR
penalty is a running max: msim_i(v) = max(msim_{i-1}(v), cos(v, s_i)).
Carrying msim as a column and joining each round against ONLY the one
newly selected row makes every round a narrow map (1-row broadcast
join + greatest()) followed by a TakeOrderedAndProject top-1: O(n*k)
cosines, ZERO per-round aggregation exchanges.

Equivalence: each pairwise cosine is rounded to 6 decimals BEFORE the
max in both versions (same per-pair grain), and max over the same
value set picks the same element, so mmr scores are bit-identical.
The per-round anti-join of picked rows becomes an exact
vec_id != last_pick filter (entering round i both exclude picks
1..i-1). cos in [-1,1], so -2.0 is the identity seed for greatest().

The incremental form is LANDED in operators/similarity.py; the
recompute-all baseline is preserved in this script. First run (pre-
landing, same session): outputs identical (n=10), old min 3.78 /
med 4.46 vs new min 3.42 / med 3.59; cand-checkpoint cadence A/B:
every-2nd min 2.17 / med 2.86 vs never min 2.74 / med 3.39.

Usage: python scripts/ab_mmr_incremental.py [reps]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mapreduce_golang_spark.operators import similarity
from mapreduce_golang_spark.operators.similarity import (
    MMR_LAMBDA,
    _cosine,
    _norm_expr,
    _with_norm,
)
from mapreduce_golang_spark.session import get_spark
from mapreduce_golang_spark.sources.tables import load_table

spark = get_spark(app_name="ab-mmr-incremental")
spark.sparkContext.setLogLevel("ERROR")
entrymod.queries()["wc"](spark, sf_dir).write.format("noop").mode("overwrite").save()




def mmr_old_recompute_all(embeddings: DataFrame, k: int = 10, lam: float = MMR_LAMBDA) -> DataFrame:
    """The pre-round-14 form: every round re-scores ALL i-1 selected
    rows (broadcast fan-out + groupBy(vec_id) max agg per round).
    Preserved here verbatim as the A/B baseline after the incremental
    form was landed in operators/similarity.py."""
    base = _with_norm(embeddings)
    cent = (
        base.select(F.posexplode("e").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg("v").alias("cv"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda s: s["cv"]
            ).alias("c")
        )
        .select("c", _norm_expr(F.col("c")).alias("cnrm"))
    )
    scored = (
        base.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "e",
            "nrm",
            F.round(_cosine(F.col("e"), F.col("c"), F.col("nrm"), F.col("cnrm")), 6).alias(
                "rel"
            ),
        )
        .localCheckpoint(eager=True)
    )
    first = (
        scored.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("rank"),
            "vec_id",
            "e",
            "nrm",
            "rel",
            F.col("rel").alias("mmr"),
        )
    )
    selected = first.localCheckpoint(eager=True)
    for i in range(2, k + 1):
        sel = selected.select(
            F.col("vec_id").alias("sid"), F.col("e").alias("se"), F.col("nrm").alias("snrm")
        )
        cand = scored.join(selected.select("vec_id"), "vec_id", "left_anti")
        nxt = (
            cand.join(F.broadcast(sel), F.lit(True))
            .select(
                "vec_id",
                "e",
                "nrm",
                "rel",
                F.round(
                    _cosine(F.col("e"), F.col("se"), F.col("nrm"), F.col("snrm")), 6
                ).alias("sim"),
            )
            .groupBy("vec_id")
            .agg(
                F.first("e").alias("e"),
                F.first("nrm").alias("nrm"),
                F.first("rel").alias("rel"),
                F.max("sim").alias("msim"),
            )
            .select(
                "vec_id",
                "e",
                "nrm",
                "rel",
                (F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("msim")).alias(
                    "mmr"
                ),
            )
            .orderBy(F.desc("mmr"), F.asc("vec_id"))
            .limit(1)
            .select(F.lit(i).cast("long").alias("rank"), "vec_id", "e", "nrm", "rel", "mmr")
        )
        selected = selected.unionByName(nxt).localCheckpoint(eager=True)
    return selected.select(
        "rank", "vec_id", F.col("rel").alias("relevance"), F.round("mmr", 6).alias("mmr_score")
    )


def rows(df: DataFrame):
    return sorted([tuple(r) for r in df.collect()])


emb = load_table(spark, sf_dir, "embeddings")

old_rows = rows(mmr_old_recompute_all(emb))
new_rows = rows(similarity.mmr_diverse_topk(emb))
same = old_rows == new_rows
print(f"mmr incremental: outputs identical = {same}  (n={len(old_rows)})")
if not same:
    print("  OLD:", old_rows[:12])
    print("  NEW:", new_rows[:12])
    sys.exit(1)

walls = {"old": [], "new": []}
for rr in range(reps):
    order = [("old", lambda: mmr_old_recompute_all(emb)), ("new", lambda: similarity.mmr_diverse_topk(emb))]
    if rr % 2:
        order.reverse()
    for tag, mk in order:
        gc.collect()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        walls[tag].append(time.perf_counter() - t0)
for tag in ("old", "new"):
    ws = walls[tag]
    print(f"  {tag}: min {min(ws):.2f}  med {statistics.median(ws):.2f}  max {max(ws):.2f}")

spark.stop()
