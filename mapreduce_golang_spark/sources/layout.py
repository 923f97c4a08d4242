"""Multi-dimensional data layout: z-order (Morton-curve) clustering.

At 100 TB the scan is the query: parquet data skipping (row-group /
file min-max pruning) only helps on columns the data is physically
clustered by. A single `sortWithinPartitions(user_id)` gives perfect
pruning on user_id and none on ts; interleaving the bits of BOTH
dimensions into one Morton key and range-partitioning + sorting on it
gives each file a tight hyper-rectangle in (user_id, ts) space, so
predicates on EITHER dimension prune most files — the standard
multi-dimensional clustering recipe (Morton 1966; the same layout
OPTIMIZE ZORDER BY applies in lakehouse table formats).

Everything is JVM-side bit arithmetic (shiftright / bitwise AND / sum
of shifted bits — codegen'd expressions, no UDF); the write is ONE
range exchange on the z-key (sampling-based range partitioner, skew
tolerant) followed by a within-partition sort, exactly the cost of any
global sort-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: bits interleaved per dimension (2×16 → 32-bit z-key). 16 bits per
#: dimension = 65k distinct ranks per axis, far finer than file count
#: at any realistic layout width; raising it only lengthens the
#: expression tree.
ZORDER_BITS = 16


def _rank_to_unit(col: Column, lo: Column, hi: Column) -> Column:
    """Scale a value into [0, 2^BITS) over its observed [lo, hi] span."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    unit = (col - lo) / span
    max_rank = F.lit((1 << ZORDER_BITS) - 1)
    return F.least(F.floor(unit * (1 << ZORDER_BITS)), max_rank).cast("long")


def z_interleave(x: Column, y: Column) -> Column:
    """Morton-interleave two pre-ranked integer columns (bit i of x →
    bit 2i, bit i of y → bit 2i+1). Pure shift/and/sum expression —
    whole-stage codegen, no Python."""
    parts = []
    for i in range(ZORDER_BITS):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def zorder_key(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Append a Morton z-key over two numeric columns, min-max ranked
    over the input's observed span. The span comes from one tiny
    aggregate broadcast back onto the scan (two numbers per dimension —
    scale-invariant broadcast), so ranking stays a narrow map."""
    span = df.agg(
        F.min(F.col(col_x).cast("double")).alias("_x_lo"),
        F.max(F.col(col_x).cast("double")).alias("_x_hi"),
        F.min(F.col(col_y).cast("double")).alias("_y_lo"),
        F.max(F.col(col_y).cast("double")).alias("_y_hi"),
    )
    with_span = df.join(F.broadcast(span))
    zx = _rank_to_unit(F.col(col_x).cast("double"), F.col("_x_lo"), F.col("_x_hi"))
    zy = _rank_to_unit(F.col(col_y).cast("double"), F.col("_y_lo"), F.col("_y_hi"))
    return with_span.withColumn("z_key", z_interleave(zx, zy)).drop(
        "_x_lo", "_x_hi", "_y_lo", "_y_hi"
    )


def zorder_write(
    df: DataFrame, path: str, col_x: str, col_y: str, n_files: int = 8
) -> None:
    """Write parquet z-order-clustered on (col_x, col_y): range
    exchange on z_key (sampled range partitioner → balanced files even
    under value skew) + within-partition sort, so every file covers a
    compact Morton-curve segment — a tight rectangle in both
    dimensions for min-max pruning."""
    keyed = zorder_key(df, col_x, col_y)
    (
        keyed.repartitionByRange(n_files, "z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_span_report(spark: SparkSession, path: str, col_x: str, col_y: str) -> DataFrame:
    """Layout-quality probe: per physical file, the fraction of each
    dimension's global span the file covers (lower = better pruning).
    Used by tests to prove z-order beats a single-dimension sort on
    the non-sorted dimension."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    per_file = df.groupBy("_file").agg(
        F.min(F.col(col_x).cast("double")).alias("x_lo"),
        F.max(F.col(col_x).cast("double")).alias("x_hi"),
        F.min(F.col(col_y).cast("double")).alias("y_lo"),
        F.max(F.col(col_y).cast("double")).alias("y_hi"),
    )
    span = df.agg(
        (F.max(F.col(col_x).cast("double")) - F.min(F.col(col_x).cast("double"))).alias("x_span"),
        (F.max(F.col(col_y).cast("double")) - F.min(F.col(col_y).cast("double"))).alias("y_span"),
    )
    return per_file.join(F.broadcast(span)).select(
        "_file",
        ((F.col("x_hi") - F.col("x_lo")) / F.col("x_span")).alias("x_cover"),
        ((F.col("y_hi") - F.col("y_lo")) / F.col("y_span")).alias("y_cover"),
    )
