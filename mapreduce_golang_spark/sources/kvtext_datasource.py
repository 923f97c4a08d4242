"""`kvtext` Python DataSource — the reference's "key value" text format
as a first-class Spark format string:

    spark.dataSource.register(KvTextDataSource)
    df = spark.read.format("kvtext").load("/path/to/dir")
    df.write.format("kvtext").mode("append").save("/path/out")

Same line contract as sources/text.py: space-delimited "key value"
lines (/root/reference/src/mr/worker.go:125-141); malformed lines are
silently dropped on read (/root/reference/src/mr/worker.go:112-115);
the file set is order-insensitive (sort | cmp harness discipline,
/root/reference/src/main/test-mr.sh:90-91).

Why both forms exist: write_kv_text/read_kv_text compose the built-in
text source (JVM scan, codegen split — the fast path); this DataSource
exposes the SAME contract through Spark 4's Python DataSource API so
the format participates in the standard reader/writer surface
(`.format("kvtext")`, options, save modes). The reader is Python-batch
(Arrow-marshalled) — contract parity and ingestion tooling, not the
100 TB hot path.

Scale shape: one InputPartition per file — reads parallelize across
the file set exactly like the reference's one-task-per-mr-out-N
layout. Writers (batch and streaming) emit one file per Spark
partition via stage-then-atomic-rename: tasks write hidden dot-files,
the driver-side commit renames them into place (and, for
mode("overwrite"), clears stale parts from prior writes first).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType

KV_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("value", StringType(), True),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KvTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext: path required (use .load(path))")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                p
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
                and os.path.isfile(p := os.path.join(self.path, f))
            )
        else:
            files = [self.path]
        return [_FilePartition(p) for p in files]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.rstrip("\n").split(" ")
                if len(parts) == 2:  # malformed-line drop, worker.go:112-115
                    yield (parts[0], parts[1])


class _KvCommit(WriterCommitMessage):
    """Carries the task's staged file name to the driver-side commit."""

    def __init__(self, staged: str, pid: int):
        self.staged = staged
        self.pid = pid


def _write_staged(path: str, iterator, pid: int) -> _KvCommit:
    """Task-side write to a hidden staged name (dot-prefixed, so
    concurrent readers never see a half-written file — the reader skips
    '.'/'_' prefixes). The driver's commit() renames it into place,
    mirroring the reference's tmpfile + atomic os.Rename publish
    (/root/reference/src/mr/worker.go:136-140)."""
    os.makedirs(path, exist_ok=True)
    staged = os.path.join(path, f".staged-{uuid.uuid4().hex}-{pid:05d}.txt")
    with open(staged, "w", encoding="utf-8") as fh:
        for row in iterator:
            fh.write(f"{row[0]} {row[1]}\n")
    return _KvCommit(staged, pid)


def _abort_staged(messages) -> None:
    for m in messages:
        if m is not None:
            try:
                os.remove(m.staged)
            except OSError:
                pass


def _sweep_orphaned_staged(path: str) -> None:
    """Remove leftover ``.staged-*`` files after a successful commit.

    A task attempt that crashed or lost a speculative race staged a
    file whose name never reached the driver's commit messages — so
    neither commit's rename nor abort ever touches it, and without a
    sweep every retry leaks one hidden file forever. commit() runs
    only after all of this job/batch's winners were renamed into
    place, so anything still dot-staged is garbage. (Two concurrent
    writers in one directory could sweep each other's in-flight
    stages — but concurrent same-directory writers are already
    unsupported: overwrite deletes the other job's parts.)"""
    try:
        names = os.listdir(path)
    except OSError:
        return
    for f in names:
        if f.startswith(".staged-"):
            try:
                os.remove(os.path.join(path, f))
            except OSError:
                pass


class KvTextWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext: path required (use .save(path))")
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        return _write_staged(self.path, iterator, TaskContext.get().partitionId())

    def commit(self, messages):
        # All tasks succeeded. The directory may not exist yet (a
        # zero-partition DataFrame runs no write task), and overwrite
        # clears EVERY pre-existing part FILE first — a prior write
        # with more partitions must not leave stale parts that a later
        # read would mix with the new ones (subdirectories are left
        # alone: they are another format's output, not our parts).
        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            for f in os.listdir(self.path):
                p = os.path.join(self.path, f)
                if not f.startswith(("_", ".")) and os.path.isfile(p):
                    os.remove(p)
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self.path, f"part-{m.pid:05d}.txt")
            # append mode must never clobber an existing part file from
            # an earlier job — pick the first free suffixed name
            n = 0
            while os.path.exists(final):
                n += 1
                final = os.path.join(self.path, f"part-{m.pid:05d}-{n}.txt")
            os.replace(m.staged, final)
        _sweep_orphaned_staged(self.path)

    def abort(self, messages):
        _abort_staged(messages)


class KvTextStreamWriter(DataSourceStreamWriter):
    """Streaming sink with the same "k v" line contract: per microbatch,
    tasks stage hidden files and commit(batchId) renames them to
    ``part-<batchId>-<pid>.txt``. A retried batch re-commits the SAME
    deterministic names (os.replace is atomic), so the directory holds
    exactly one file set per (batch, partition) — the idempotent-rename
    exactly-once discipline of the reference's mr-out-N publish
    (/root/reference/src/mr/worker.go:136-140) lifted to microbatches.

    ``truncate`` (Spark passes overwrite=True for complete output mode)
    makes each commit replace the directory's contents: complete mode
    re-emits the FULL result every batch, so earlier batches' parts
    are stale snapshots that a reader must not union with the new one.
    Append/update modes keep all batches' parts.
    """

    def __init__(self, options, truncate: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext: path required (use .start(path))")
        self.truncate = truncate

    def write(self, iterator):
        from pyspark import TaskContext

        return _write_staged(self.path, iterator, TaskContext.get().partitionId())

    def commit(self, messages, batchId):
        os.makedirs(self.path, exist_ok=True)
        if self.truncate:
            # complete mode: this batch's snapshot REPLACES the sink.
            # Parts are batchId-prefixed, so prior batches' names never
            # collide with this batch's renames — clear them explicitly.
            prefix = f"part-{batchId:05d}-"
            for f in os.listdir(self.path):
                p = os.path.join(self.path, f)
                if (
                    not f.startswith(("_", "."))
                    and os.path.isfile(p)
                    and not f.startswith(prefix)
                ):
                    os.remove(p)
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self.path, f"part-{batchId:05d}-{m.pid:05d}.txt")
            os.replace(m.staged, final)
        _sweep_orphaned_staged(self.path)

    def abort(self, messages, batchId):
        _abort_staged(messages)


class KvTextStreamReader(SimpleDataSourceStreamReader):
    """File-arrival streaming read of a kvtext directory: the offset is
    the sorted list of files already processed; each microbatch reads
    files that appeared since. Mirrors the file-stream source contract
    (files are immutable once written — the reference's mr-out-N files
    are atomically renamed exactly like that,
    /root/reference/src/mr/worker.go:136-140)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext: path required (use .load(path))")

    def _files(self):
        if not os.path.isdir(self.path):
            return [self.path] if os.path.exists(self.path) else []
        return sorted(
            p
            for f in os.listdir(self.path)
            if not f.startswith(("_", "."))
            and os.path.isfile(p := os.path.join(self.path, f))
        )

    def initialOffset(self):
        return {"seen": []}

    def read(self, start):
        seen = set(start.get("seen", []))
        now = self._files()
        new = [f for f in now if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        return (self._rows(new), end)

    def readBetweenOffsets(self, start, end):
        seen = set(start.get("seen", []))
        target = [f for f in end.get("seen", []) if f not in seen]
        return self._rows(target)

    def _rows(self, files):
        # a LIST, not a generator: the prefetched batch is pickled into
        # the offset log by the simple stream reader runtime
        rows = []
        for path in files:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    parts = line.rstrip("\n").split(" ")
                    if len(parts) == 2:
                        rows.append((parts[0], parts[1]))
        return rows


class KvTextDataSource(DataSource):
    @classmethod
    def name(cls):
        return "kvtext"

    def schema(self):
        return KV_SCHEMA

    def reader(self, schema):
        return KvTextReader(self.options)

    def writer(self, schema, overwrite: bool):
        return KvTextWriter(self.options, overwrite)

    def simpleStreamReader(self, schema):
        return KvTextStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return KvTextStreamWriter(self.options, truncate=overwrite)
