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
# tokenizer (/root/reference/src/mrapps/wc.go:21-27): runs of letters,
# expressed as word-chars minus digits/underscore (Python re lacks \p{L}).
_LETTER_RUN = re.compile(r"[^\W\d_]+", re.UNICODE)


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
