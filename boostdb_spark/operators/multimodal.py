"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``). North-star extension beyond the reference.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (``_fake_decode``) — the Spark-side
plumbing (schema contract, Arrow batching, partition-local processing,
binary payload handling) is real and tested. Swapping in PIL/ffmpeg is
a one-function change inside the batch iterator.

Scale shape: mapInPandas streams Arrow batches partition-locally — no
shuffle, no driver involvement; 100 TB of blobs processes at scan
speed. Metadata-only queries never touch the payload column thanks to
parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema produced by extract_media_meta
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of the
    text — the fixture stand-in for an image/audio blob)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic fake dimensions derived from the
    payload size. Replace with a real decoder (PIL.Image.open /
    soundfile / av) when codecs are available.

    Raises NotImplementedError for payloads that look like real media
    containers — this stub must never silently 'decode' actual media.
    """
    if payload[:4] in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError("real media decoding unavailable in this container")
    n = len(payload)
    return n % 640, (n * 7) % 480, "text/plain"


def extract_media_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, n_bytes, width, height, media_type) via Arrow-batched
    mapInPandas — the canonical multimodal feature-extraction shape:
    batch iterator in, batch iterator out, partition-local."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            decoded = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "media_type": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, MEDIA_META_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n: int,
    id_col: str = "doc_id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Video frame-sampling *plan*: expand (video, n_frames) into one
    row per sampled frame index — pure ``sequence``+``explode``, no
    decode. The decode of selected frames would run through
    extract_media_meta's mapInPandas pattern.
    """
    idx = F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
    return df.select(
        F.col(id_col), F.explode(idx).alias("frame_idx")
    )


#: schema produced by resize_media
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic fake — repeat/truncate the payload to
    exactly width*height bytes (the size contract a real thumbnail
    pipeline cares about). Replace with PIL ``Image.resize`` when
    codecs are available; raises on real media containers like
    _fake_decode so it never silently 'resizes' actual images."""
    if payload[:4] in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError("real media decoding unavailable in this container")
    n = width * height
    reps = -(-n // max(len(payload), 1))
    return (payload * reps)[:n]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Payload -> fixed-size payload (doc_id, payload, width, height):
    the decode-transform-reencode shape of an image resize / audio
    resample stage. Same mapInPandas contract as extract_media_meta:
    Arrow batches in and out, partition-local, zero shuffle — 100 TB of
    blobs runs at scan speed with the transform pipelined into the
    read. The byte-level transform is a clearly-marked stub
    (_fake_resize); the Spark plumbing (binary in/out through Arrow,
    schema, batching) is the real, tested part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [
                        _fake_resize(bytes(p), width, height)
                        for p in pdf[payload_col]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)
