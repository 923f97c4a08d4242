"""Multimodal column plumbing (extension surface, SURVEY.md §2.4).

Media (image/audio/video) is carried as an opaque ``binary`` payload
column plus typed metadata — the standard lakehouse shape for 100 TB
multimodal corpora (payload stays columnar, metadata prunable).

The container has no image/audio libraries, so the actual DECODE step
is stubbed two ways (per the project brief):
- ``decode_media`` raises NotImplementedError — the seam where a real
  decoder (PIL/ffmpeg) plugs in;
- ``media_features`` computes a deterministic FAKE decode (pseudo
  width/height/frames derived from the payload's md5) so the whole
  Spark pipeline — binary schema, Arrow batch transfer through
  mapInPandas, partition-parallel feature extraction — is real and
  oracle-checkable end to end.

Scale notes: mapInPandas streams Arrow record batches per partition —
no per-row Python overhead, payload bytes cross to Python once;
metadata-only queries never touch the payload column thanks to
parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def attach_payload(documents: DataFrame) -> DataFrame:
    """documents → media rows: utf-8 payload bytes + media_type tag.
    (With real media, payloads come from the lake; the pipeline shape
    is identical.)"""
    return documents.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_media(payload: bytes, media_type: str):
    """The real-decoder seam. Image/audio libs are not in this
    container — plug PIL/torchaudio/ffmpeg in here when present."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; use media_features() for the deterministic "
        "fake-decode pipeline"
    )


def _fake_dims(md5_hex: str) -> tuple[int, int, int]:
    """Deterministic pseudo metadata from the payload hash — stands in
    for decoded width/height/frame-count; engine-portable."""
    width = int(md5_hex[0:4], 16) % 1920
    height = int(md5_hex[4:8], 16) % 1080
    n_frames = int(md5_hex[8:12], 16) % 240
    return width, height, n_frames


def media_features(media: DataFrame) -> DataFrame:
    """Per-payload features via mapInPandas (Arrow-batched).

    Real pipeline shape: bytes in → features out, partition-parallel,
    no driver involvement. The fake decode keeps it verifiable against
    a SQL oracle.
    """

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            md5s = [hashlib.md5(p).hexdigest() for p in payloads]
            dims = [_fake_dims(h) for h in md5s]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in payloads],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, frame_bytes: int = 16) -> DataFrame:
    """Frame-sampling plumbing: slice a pseudo-frame of ``frame_bytes``
    every ``every_n_bytes`` of payload (stands in for video frame
    extraction; the explode/batch shape is the real thing).
    Returns (doc_id, frame_idx, frame).
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(sample, out_schema)


def ingest_binary_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Lake-side media ingestion via Spark's built-in ``binaryFile``
    source: each file becomes one row (path, modificationTime, length,
    content) — the standard way raw image/audio/video objects enter a
    100 TB multimodal pipeline before decode/feature stages.

    Output is MEDIA_SCHEMA-shaped: doc_id is the xxhash64 of the file
    path (stable across re-ingests and partition layouts), media_type
    the lowercase file extension. Column pruning is real: a
    metadata-only query over this source never reads file contents
    (the scan's ReadSchema drops `content` — asserted in
    tests/test_streaming_multimodal.py).
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    # extension from the BASENAME only (a dot in a directory segment
    # must not leak a path fragment into media_type); extensionless
    # files get NULL, which downstream dispatch can route explicitly
    basename = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.nullif(F.lower(F.regexp_extract(basename, r"\.([^.]+)$", 1)), F.lit(""))
    return files.select(
        F.xxhash64("path").alias("doc_id"),
        ext.alias("media_type"),
        F.col("content").alias("payload"),
    )
