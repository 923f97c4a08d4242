"""The reference's eight mrapp workloads as Python (mapf, reducef)
pairs for the generic layer (/root/reference/src/mrapps/*.go).

Data workloads (wc, indexer, early_exit counts, crash/nocrash data)
are re-expressed faithfully. Scheduler probes (jobcount, mtiming,
rtiming) are NOT data operators — they assert properties of the
reference's scheduler (at-most-once execution, ≥2-way parallelism,
/root/reference/src/main/test-mr.sh:133-210); on Spark the analogous
assertions are task-level smoke checks in tests/test_mapreduce.py.
"""

from __future__ import annotations

import re

# Same predicate as Go unicode.IsLetter splitting in the reference
# tokenizer (/root/reference/src/mrapps/wc.go:21-27): runs of letters.
# The engine's CANONICAL letter predicate is the JVM regex \p{L}
# (functions/tokenize.py tokenizes JVM-side in the hot path), so this
# Python tokenizer must match it exactly. Python's [^\W\d_] follows
# CPython's Unicode tables, which classify some codepoints differently
# from the JRE's (newer-Unicode letters like U+12F90, and category
# No/Nl word-chars like '²'); _unicode_compat holds the generated
# divergence sets and we correct the class with them.
from mapreduce_golang_spark.functions._unicode_compat import JVM_NOT_PY, PY_NOT_JVM


def _codepoint_class(cps) -> str:
    """Compress a codepoint set into regex character-class ranges."""
    out, run_start, prev = [], None, None
    for cp in sorted(cps):
        if run_start is None:
            run_start = prev = cp
        elif cp == prev + 1:
            prev = cp
        else:
            out.append((run_start, prev))
            run_start = prev = cp
    if run_start is not None:
        out.append((run_start, prev))
    return "".join(
        f"\\U{a:08X}" if a == b else f"\\U{a:08X}-\\U{b:08X}" for a, b in out
    )


def _build_letter_run() -> re.Pattern[str]:
    core = rf"[^\W\d_{_codepoint_class(PY_NOT_JVM)}]"
    if JVM_NOT_PY:
        return re.compile(rf"(?:{core}|[{_codepoint_class(JVM_NOT_PY)}])+", re.UNICODE)
    return re.compile(core + "+", re.UNICODE)


_LETTER_RUN = _build_letter_run()


def _tokens(text: str) -> list[str]:
    return _LETTER_RUN.findall(text)


# --- wc (/root/reference/src/mrapps/wc.go) ---------------------------------


def wc_map(filename: str, contents: str):
    return [(w, "1") for w in _tokens(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


# --- indexer (/root/reference/src/mrapps/indexer.go) -----------------------


def indexer_map(filename: str, contents: str):
    return [(w, filename) for w in set(_tokens(contents))]


def indexer_reduce(key: str, values: list[str]) -> str:
    docs = sorted(values)
    return f"{len(docs)} {','.join(docs)}"


# --- early_exit counts (/root/reference/src/mrapps/early_exit.go) ----------


def file_count_map(filename: str, contents: str):
    return [(filename, "1")]


def file_count_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


# --- crash/nocrash data semantics (/root/reference/src/mrapps/crash.go:34-55;
#     fault injection itself maps to Spark task retry, not data) ------------


def crash_map(filename: str, contents: str):
    return [
        ("a", filename),
        ("b", str(len(filename))),
        ("c", str(len(contents))),
        ("d", "xyzzy"),
    ]


def crash_reduce(key: str, values: list[str]) -> str:
    return " ".join(sorted(values))
