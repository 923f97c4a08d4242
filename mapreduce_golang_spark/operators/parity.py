"""Reference workload parity operators W2/W3/W7 (SURVEY.md §2.2).

Each function is the DataFrame-native re-expression of one mrapp's
Map/Reduce pair; the generic-UDF forms live in ``plans.mapreduce``.

Scale notes shared by all three: the per-group ``collect_list`` +
``sort_array`` aggregations are faithful to reference semantics
(reducers that must see the complete, sorted value list —
/root/reference/src/mrapps/indexer.go:36-39, crash.go:45-55). At
100 TB the indexer's per-word doc list is bounded by corpus doc count
per word (zipfian — hot words get big lists); that is inherent to the
*query*, not the plan: the exchange is on the group key, partial
aggregation ships compacted arrays, and AQE splits skewed partitions.
For unbounded-group analytics prefer the extension operators
(top-k, counts) instead of materializing full lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_golang_spark.functions.tokenize import doc_name, tokenize


def inverted_index(
    df: DataFrame, doc_col=None, text_col: str = "text", packed: bool = False
) -> DataFrame:
    """W2 `indexer` — word → (n_docs, sorted comma-joined doc list).

    Reference map dedupes words within a doc via a set, reduce sorts
    doc names and joins with ',' prefixing the count
    (/root/reference/src/mrapps/indexer.go:20-39). Relationally:
    distinct (doc, word) pairs → count + ordered string_agg. By default
    we keep count and list as separate typed columns instead of the
    "<n> <list>" packed string — same information, honest schema;
    ``packed=True`` emits the reference's exact output value
    (indexer.go:38: ``fmt.Sprintf("%d %s", len(docs), join(docs,","))``)
    as (word, index) for bit-exact mr-out parity.

    Plan shape: explode → local+global DISTINCT (partial aggregate
    before the exchange — the reference's map-side dedup, generalized)
    → hash-agg on word.
    """
    doc = doc_col if doc_col is not None else doc_name()
    pairs = tokenize(df.withColumn("doc", doc), text_col=text_col, out="word", keep=("doc",)).distinct()
    idx = pairs.groupBy("word").agg(
        F.count("doc").alias("n_docs"),
        F.concat_ws(",", F.sort_array(F.collect_list("doc"))).alias("docs"),
    )
    if packed:
        return idx.select(
            "word",
            F.concat_ws(" ", F.col("n_docs").cast("string"), "docs").alias("index"),
        )
    return idx


def file_counts(df: DataFrame, file_col: str = "source") -> DataFrame:
    """W3 `early_exit` — records per file: SELECT file, COUNT(*) GROUP BY file
    (/root/reference/src/mrapps/early_exit.go:21-40; the reducer's
    3 s sleep is a test device, not semantics). Pure hash aggregate
    with map-side combine; trivially scale-safe.
    """
    return df.groupBy(F.col(file_col).alias("filename")).agg(F.count("*").alias("cnt"))


def crash_data(df: DataFrame, doc_col=None, text_col: str = "text") -> DataFrame:
    """W7/W8 `crash`/`nocrash` data semantics — per input file emit
    (a, filename), (b, len(filename)), (c, len(contents)), (d, "xyzzy"),
    then per key the space-joined sorted value list
    (/root/reference/src/mrapps/crash.go:34-55 map, 45-55 reduce;
    nocrash.go:17-47 is the identical computation minus fault
    injection — the golden twin). The crash/delay behavior itself maps
    to Spark task retry (spark.task.maxFailures), not to a data op.

    Only 4 groups exist, each collecting one value per input row — the
    four lists are proportional to the input, which is the reference's
    own contract. At scale this is a concat-of-everything query; it
    exists for parity, not as a recommended pattern.
    """
    doc = doc_col if doc_col is not None else doc_name()
    fname = doc.alias("filename")
    kv = df.select(
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("key"), doc.alias("value")),
                F.struct(F.lit("b").alias("key"), F.length(doc).cast("string").alias("value")),
                F.struct(F.lit("c").alias("key"), F.length(F.col(text_col)).cast("string").alias("value")),
                F.struct(F.lit("d").alias("key"), F.lit("xyzzy").alias("value")),
            )
        ).alias("kv")
    ).select("kv.key", "kv.value")
    return kv.groupBy("key").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("value"))).alias("value")
    )
