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
layout. The writer emits one file per Spark partition.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
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
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
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


class KvTextWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext: path required (use .save(path))")
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.txt")
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row[0]} {row[1]}\n")
        return WriterCommitMessage()


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
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if not f.startswith(("_", "."))
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
