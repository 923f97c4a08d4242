"""Pandas-API-on-Spark compatibility surface (`pyspark.pandas`): the
drop-in pandas DataFrame API executing as Spark plans — the migration
path for pandas-shaped analytics code onto the engine without a
rewrite (import change + read_parquet, everything below compiles to
the same Catalyst plans the native DataFrame API produces).

Why it earns a capability row: a user of the reference engine moving a
pandas notebook to 100 TB needs exactly this seam — the query here is
written ONLY in pandas idioms (read_parquet → assign → groupby → agg →
reset_index → sort_values) and its result is DuckDB-oracle-checked
like every native query, proving the compatibility layer computes the
same answer the SQL semantics demand.

Scale notes: pandas-on-Spark is lazy and plan-compiled — groupby/agg
here is the same hash aggregate the native API plans (one exchange on
the group key, partial aggregation map-side). The sharp edge to keep
out of hot paths is the DEFAULT INDEX: operations that require a
positional index (iloc, default reset_index on a frame with no index)
can force `attach_distributed_sequence` — a zipWithIndex-style full
pass. This operator avoids index-dependence entirely (groupby keys
become the index, reset_index turns them back into columns), which is
the pattern to follow at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ps_orders_status_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order-status profile computed ENTIRELY through the pandas
    API (count, summed revenue, mean price, max price per status),
    returned as a native DataFrame with the floats rounded for the
    oracle hash."""
    import pyspark.pandas as ps

    psdf = ps.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_orderstatus", "o_totalprice"]
    ]
    prof = (
        psdf.groupby("o_orderstatus")
        .agg(
            n_orders=("o_orderkey", "count"),
            total_revenue=("o_totalprice", "sum"),
            avg_price=("o_totalprice", "mean"),
            max_price=("o_totalprice", "max"),
        )
        .reset_index()
        .sort_values("o_orderstatus")
    )
    sdf = prof.to_spark()
    return sdf.select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round("total_revenue", 2).alias("total_revenue"),
        F.round("avg_price", 2).alias("avg_price"),
        F.round("max_price", 2).alias("max_price"),
    )
