"""Go-faithful letters-only tokenizer + shared text helpers.

The reference tokenizes by splitting on any run of non-letter runes —
``strings.FieldsFunc(contents, func(r rune) bool { return
!unicode.IsLetter(r) })`` (/root/reference/src/mrapps/wc.go:21-27):
letters-only, case-SENSITIVE, no Unicode folding. Java regex class
``\\p{L}`` is the same predicate as Go's ``unicode.IsLetter``, so the
Spark expression below is a faithful re-expression, and it stays
JVM-side inside whole-stage codegen (no Python UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: split pattern — any run of non-letter characters.
LETTERS_ONLY_RE = r"[^\p{L}]+"


def words(text_col: Column | str) -> Column:
    """Array of letters-only tokens of ``text_col`` (may contain '')."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(col, LETTERS_ONLY_RE)


def tokenize(df: DataFrame, text_col: str = "text", out: str = "word", keep: tuple[str, ...] = ()) -> DataFrame:
    """One row per token: explode(split) + drop the empty token that a
    leading/trailing separator produces. 1→N row explosion is the Spark
    form of the reference's Map UDTF (/root/reference/src/mr/worker.go:70).
    """
    exploded = df.select(*keep, F.explode(words(text_col)).alias(out))
    return exploded.where(F.col(out) != "")


def doc_name(source_col: str = "source", doc_id_col: str = "doc_id") -> Column:
    """The 'filename' of a documents-table row — plays the role the input
    file name plays in the reference (one file == one document,
    /root/reference/src/mr/worker.go:60-70). Contains no spaces, per the
    reference's space-delimited "k v" line constraint
    (/root/reference/src/mr/worker.go:82,112).
    """
    return F.concat_ws("/", F.col(source_col), F.col(doc_id_col).cast("string"))
