"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``). North-star extension beyond the reference.

Capability layering:

- **Metadata extraction is REAL for PNG / JPEG / WAV** — container
  headers carry the dimensions/stream parameters, parsed with pure
  stdlib (no codec): PNG IHDR, JPEG SOFn markers, RIFF/WAVE fmt chunk.
- **Pixel-level transforms** (resize/stats) are REAL for both image
  containers with zero dependencies: PNG via the stdlib zlib codec
  (media_codec.py), baseline JPEG via the pure-numpy DCT codec
  (jpeg_codec.py). Unsupported subsets (progressive JPEG, 16-bit PNG)
  raise ``NotImplementedError`` — never silently fake-transformed.
- Non-media payloads (the fixture's utf-8 text blobs) go through the
  clearly-marked deterministic stubs so the Arrow plumbing stays
  oracle-testable in a codec-less container.

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

#: JPEG start-of-frame markers that carry dimensions (all SOFn except
#: DHT/DAC/RST which reuse the range)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_media_header(payload: bytes) -> tuple[int, int, str] | None:
    """(width, height, media_type) for a REAL media container, parsed
    from its header bytes — pure stdlib, no codec required. Returns
    None when the payload is not a recognized container. For WAV audio
    the pair is (channels, sample_rate): the stream-geometry analog of
    pixel dimensions.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        # IHDR is always the first chunk: width/height at bytes 16..24
        return (
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
            "image/png",
        )
    if payload[:3] == b"\xff\xd8\xff":
        # Marker scan per ITU-T.81 B.1.1: any number of 0xFF fill bytes
        # may precede a marker; TEM/SOI/RSTn are standalone (no length
        # segment); SOS starts entropy-coded data and EOI ends the
        # stream — a SOF must appear before either, so both terminate
        # the scan.
        n = len(payload)
        i = 2
        while i < n and payload[i] == 0xFF:
            while i < n and payload[i] == 0xFF:  # fill bytes
                i += 1
            if i >= n:
                break
            marker = payload[i]
            i += 1
            if marker in _JPEG_SOF:
                if i + 7 > n:
                    break
                return (
                    int.from_bytes(payload[i + 5 : i + 7], "big"),  # width
                    int.from_bytes(payload[i + 3 : i + 5], "big"),  # height
                    "image/jpeg",
                )
            if marker == 0x01 or marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                continue  # standalone marker, no length field
            if marker in (0xD9, 0xDA):  # EOI / SOS: no SOF will follow
                break
            if i + 2 > n:
                break
            seglen = int.from_bytes(payload[i : i + 2], "big")
            if seglen < 2:
                break  # corrupt length — stop rather than desync
            i += seglen
        raise ValueError("JPEG payload with no SOF marker (truncated?)")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # Walk RIFF chunks to the 'fmt ' chunk — it need not be first
        # (LIST/INFO chunks legally precede it); chunks are word-aligned
        n = len(payload)
        i = 12
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = int.from_bytes(payload[i + 4 : i + 8], "little")
            if cid == b"fmt " and clen >= 16 and i + 16 <= n:
                return (
                    int.from_bytes(payload[i + 10 : i + 12], "little"),  # channels
                    int.from_bytes(payload[i + 12 : i + 16], "little"),  # rate
                    "audio/wav",
                )
            i += 8 + clen + (clen & 1)
        return None
    return None

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
    """STUB for NON-media payloads only (the fixture's text blobs):
    deterministic fake dimensions derived from the payload size.

    Raises NotImplementedError for payloads that look like real media
    containers — those must route through :func:`parse_media_header`
    (which _decode_meta does); this stub must never silently 'decode'
    actual media."""
    if payload[:4] in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError("media payloads route via parse_media_header")
    n = len(payload)
    return n % 640, (n * 7) % 480, "text/plain"


def _decode_meta(payload: bytes) -> tuple[int, int, str]:
    """Real header parse for real containers; size-derived stub for the
    fixture's non-media payloads."""
    hdr = parse_media_header(payload)
    if hdr is not None:
        return hdr
    return _fake_decode(payload)


def extract_media_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, n_bytes, width, height, media_type) via Arrow-batched
    mapInPandas — the canonical multimodal feature-extraction shape:
    batch iterator in, batch iterator out, partition-local."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            decoded = [_decode_meta(bytes(p)) for p in payloads]
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


def decode_image(payload: bytes):
    """REAL pixel decode for any recognized image container -> uint8
    numpy array: PNG via the stdlib inflate+unfilter codec, baseline
    JPEG via the pure-numpy DCT codec. Raises for non-image payloads
    and (NotImplementedError) for unsupported container subsets —
    never a silent wrong decode."""
    hdr = parse_media_header(payload)
    if hdr is None or not hdr[2].startswith("image/"):
        raise ValueError(f"not an image payload ({hdr[2] if hdr else 'raw'})")
    if hdr[2] == "image/png":
        from boostdb_spark.operators import media_codec as mc

        return mc.decode_png(payload)
    from boostdb_spark.operators import jpeg_codec as jc

    return jc.decode_jpeg(payload)


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Resize one payload: REAL pixel path for BOTH image containers —
    PNG via the stdlib codec (inflate + unfilter), baseline JPEG via
    the pure-numpy DCT codec — nearest-neighbor resampled and
    re-encoded as deterministic PNG. Deterministic stub (repeat/
    truncate to exactly width*height bytes — the size contract a
    thumbnail pipeline cares about) for the fixture's non-media
    payloads; audio payloads refuse (resize is undefined) — never a
    silent fake 'resize' of real media."""
    hdr = parse_media_header(payload)
    if hdr is not None:
        if hdr[2].startswith("image/"):
            from boostdb_spark.operators import media_codec as mc

            arr = decode_image(payload)
            return mc.encode_png(mc.resize_nearest(arr, width, height))
        raise NotImplementedError(f"resize undefined for {hdr[2]}")
    n = width * height
    reps = -(-n // max(len(payload), 1))
    return (payload * reps)[:n]


#: schema produced by pixel_stats
PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_px", T.LongType()),
    ]
)


def pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL pixel decode: PNG payload -> (doc_id, width, height,
    sum_px) where sum_px is the integer sum over all pixel bytes —
    exact (no float), so it pairs with an analytic SQL oracle. Runs
    the full codec path (PNG inflate+unfilter or baseline-JPEG DCT) in
    Arrow-batched mapInPandas workers, partition-local."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_image(bytes(p))
                rows.append(
                    (
                        int(doc_id),
                        arr.shape[1],
                        arr.shape[0],
                        int(arr.sum(dtype="int64")),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "sum_px"]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, PIXEL_STATS_SCHEMA)


#: schema produced by audio_features
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("sum_amp", T.LongType()),
    ]
)


def audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode: PCM-16 WAV payload -> per-clip features
    (sample count, geometry, integer peak/sum amplitude, duration).
    All-integer outputs pair with an analytic SQL oracle; the decode
    walks RIFF chunks and parses PCM frames with numpy — stdlib only,
    inside mapInPandas (zero shuffle, scan-speed at 100 TB)."""
    from boostdb_spark.operators import media_codec as mc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                a, rate = mc.decode_wav_pcm16(bytes(p))
                n = a.shape[0]
                rows.append(
                    (
                        int(doc_id),
                        n,
                        a.shape[1],
                        rate,
                        n * 1000 // rate,
                        int(abs(a.astype("int64")).max(initial=0)),
                        int(a.sum(dtype="int64")),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "channels",
                    "sample_rate",
                    "duration_ms",
                    "peak_abs",
                    "sum_amp",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def synth_media_payloads(
    df: DataFrame, kind: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministically synthesize REAL media containers from row ids
    — the fixture generator for the real-codec paths (no media files
    ship with the testdata). ``kind='png'``: horizontal-gradient
    grayscale PNG, height 6 + id%5, width 8 + id%9, pixel(y, x) =
    id%128 + x (no mod-256 wrap, so oracles stay integer-analytic).
    ``kind='jpeg'``: solid gray baseline JPEG, same dims, level
    2*(id%128) — even levels survive the Annex-K quantizer EXACTLY, so
    the lossy codec still pairs with an exact analytic oracle.
    ``kind='wav'``: mono PCM-16 ramp, 64 + id%129 samples starting at
    (id*7)%1000, rate 8000 + (id%3)*4000."""
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc
    from boostdb_spark.operators import media_codec as mc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                if kind == "png":
                    h, w, base = 6 + i % 5, 8 + i % 9, i % 128
                    row = (base + np.arange(w, dtype=np.int64)).astype(np.uint8)
                    payloads.append(mc.encode_png(np.tile(row, (h, 1))))
                elif kind == "jpeg":
                    h, w, g = 6 + i % 5, 8 + i % 9, 2 * (i % 128)
                    payloads.append(
                        jc.encode_jpeg_gray(np.full((h, w), g, dtype=np.uint8))
                    )
                elif kind == "jpeg_color":
                    # neutral solid RGB (r=g=b): chroma quantizes to
                    # exactly 0, even luma survives the quantizer -> the
                    # LOSSY color path still has an exact analytic oracle
                    h, w, g = 6 + i % 5, 8 + i % 9, 2 * (i % 128)
                    payloads.append(
                        jc.encode_jpeg_color(
                            np.full((h, w, 3), g, dtype=np.uint8)
                        )
                    )
                elif kind == "wav":
                    n, base = 64 + i % 129, (i * 7) % 1000
                    rate = 8000 + (i % 3) * 4000
                    samples = (base + np.arange(n, dtype=np.int64)).astype("<i2")
                    payloads.append(mc.encode_wav_pcm16(samples, rate))
                else:
                    raise ValueError(f"unknown media kind {kind!r}")
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


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
    read. Per-payload behavior (real PIL resize / stub / refuse) is
    _resize_payload's capability contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [
                        _resize_payload(bytes(p), width, height)
                        for p in pdf[payload_col]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)
