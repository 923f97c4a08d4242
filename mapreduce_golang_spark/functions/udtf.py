"""Python user-defined table functions (Spark 4 `@udtf`).

The reference's map stage is a user function emitting 0..N records
per input record (/root/reference/src/mr/worker.go:55-71 applies
mapf and scatters the emitted list); a Python UDTF is the
DataFrame-native expression of exactly that contract — one input
row in, a yielded batch of rows out, usable from SQL via LATERAL.

This is deliberately the DEMO surface for the API, not a hot-path
operator: row-at-a-time Python is the slow path, so every registered
query that needs sentence segmentation uses the pure array-expression
form (operators/text_analysis.py::sentence_stats) and the per-record
fan-out form uses generator columns (posexplode). The UDTF exists for
the case the array form can't cover — opaque Python logic per record
— and is arrow-optimized (`useArrow=True`) so batches cross the
Python boundary as Arrow, not pickled rows.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from mapreduce_golang_spark.operators.text_analysis import SENTENCE_SPLIT_RE

_SENT_RE = re.compile(SENTENCE_SPLIT_RE)
_WS_RE = re.compile(r"\s+")


@udtf(returnType="sent_idx: int, sentence: string, n_words: int", useArrow=True)
class SentenceSplitter:
    """Yield (sent_idx, sentence, n_words) per sentence of `text` —
    segmentation identical to sentence_stats' array expression.

    Parity requires matching SQL semantics exactly: SQL ``trim()``
    strips SPACES only (not tabs/newlines), so this strips ``' '``
    rather than Python's all-whitespace ``strip()``; and Java's
    ``split("\\s+")`` keeps the leading empty token on a string that
    starts with whitespace, which ``re.split`` also does — both count
    it. A fragment of only tabs/newlines therefore IS a sentence on
    both paths."""

    def eval(self, text: str):  # noqa: D102 — contract is the class doc
        if text is None:
            return
        idx = 0
        for raw in _SENT_RE.split(text):
            sent = raw.strip(" ")
            if sent == "":
                continue
            yield idx, sent, len(_WS_RE.split(sent))
            idx += 1


class NgramExplode:
    """POLYMORPHIC analyze-phase UDTF: output schema computed at plan
    time from the ``n`` argument — `ngram_explode(text, 2)` yields
    columns (tok_1, tok_2); `ngram_explode(text, 5)` yields five. This
    is the Spark 4 `analyze()` static-method contract (the engine
    calls it during resolution with the foldable argument values), the
    table-function analogue of a generic emitter the fixed-returnType
    decorator above cannot express.

    Tokenization matches the batch shingle family
    (dedup.py::word_shingles / tokenize.py::LETTERS_ONLY_RE) via the
    JVM-parity letter-run tokenizer (plans/mrapps.py::_tokens, which
    corrects CPython's letter class with the generated
    _unicode_compat divergence table) so the DuckDB oracle reproduces
    rows bit-identically. No decorator here — dynamic-schema UDTFs
    are created with `udtf(cls)` (no returnType) and the analyze
    method supplies the schema per call site.
    """

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        # n.value is None when the argument is not a foldable literal
        # (e.g. a column reference) — a distinct failure from a literal
        # that is out of range; bool is rejected explicitly because it
        # passes isinstance(..., int) (ngram_explode(text, true) would
        # otherwise silently mean n=1)
        if n.value is None:
            raise ValueError(
                "ngram_explode: n must be a LITERAL int (got a non-constant "
                "expression — the output schema is resolved at plan time)"
            )
        if isinstance(n.value, bool) or not isinstance(n.value, int) or not (
            1 <= n.value <= 16
        ):
            raise ValueError(
                f"ngram_explode: n must be a literal int in [1, 16], got "
                f"{n.value!r}"
            )
        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"tok_{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):
        if text is None:
            return
        from mapreduce_golang_spark.plans.mrapps import _tokens

        toks = _tokens(text)
        for i in range(len(toks) - n + 1):
            yield tuple(toks[i : i + n])


@udtf(
    returnType="user_id bigint, session_seq bigint, start_us bigint, "
    "n_events bigint, dur_us bigint"
)
class SessionizeEvents:
    """TABLE-ARGUMENT UDTF: per-group stateful sessionization driven by
    the engine's `TABLE(...) PARTITION BY user_id ORDER BY us, event_id`
    contract — Spark instantiates one object per partition group, feeds
    eval() the group's rows IN ORDER, and calls terminate() at group
    end. This is a third UDTF capability class next to the fixed-schema
    LATERAL emitter (SentenceSplitter) and the polymorphic analyze()
    UDTF (NgramExplode): the input is a whole partitioned relation, not
    a scalar column, and the function holds running state across the
    group — the DataFrame-native form of the classic reduce-side
    streaming iterator. Semantics are EXACTLY windows.py::sessionize
    (new session when the inter-event gap exceeds GAP_US; session_seq
    1-based), so the registered query shares sessionize's DuckDB
    oracle verbatim. Demo surface: the hot path remains the
    lag+cumsum window form, which stays in whole-stage codegen.
    """

    GAP_US = 1_800_000_000  # 30 min, as windows.py::sessionize

    def __init__(self):
        self._user = None
        self._seq = 0
        self._n = 0
        self._first = None
        self._last = None

    def _flush(self):
        return (self._user, self._seq, self._first, self._n, self._last - self._first)

    def eval(self, row):  # noqa: D102 — contract is the class doc
        us = row.us
        if self._last is not None and us - self._last > self.GAP_US:
            yield self._flush()
            self._seq += 1
            self._n = 0
            self._first = us
        if self._first is None:
            self._user, self._seq, self._first = row.user_id, 1, us
        self._n += 1
        self._last = us

    def terminate(self):  # noqa: D102
        if self._user is not None:
            yield self._flush()


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (SQL names:
    `split_sentences`, used as `... , LATERAL split_sentences(text)`;
    `ngram_explode`, used as `... , LATERAL ngram_explode(text, 3)` —
    schema resolved per call site by NgramExplode.analyze;
    `sessionize_tf`, used as `... FROM sessionize_tf(TABLE(v)
    PARTITION BY user_id ORDER BY us, event_id)`)."""
    spark.udtf.register("split_sentences", SentenceSplitter)
    spark.udtf.register("ngram_explode", udtf(NgramExplode, useArrow=True))
    spark.udtf.register("sessionize_tf", SessionizeEvents)
