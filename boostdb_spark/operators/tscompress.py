"""Gorilla-style compressed time-series blocks — the Spark
re-expression of the reference's storage heart: M3DB keeps series as
compressed blocks (delta-of-delta timestamps + XOR-encoded float
values, the Facebook Gorilla scheme, VLDB'15 — public algorithm;
reference storage noted at SURVEY.md §1/§3: "compressed time-series
blocks").

In this engine Parquet already gives general-purpose columnar
compression; these blocks are the SPECIALIZED codec for series data —
an opaque ``binary`` block per (series, time-chunk) that decodes back
bit-exactly. Use cases: compact state snapshots, wire-format export to
Gorilla-family stores, long-term archive where a 10-20x ratio on slow
counters matters.

Encoding (per block, bit-packed):

- varint count, then first timestamp as zigzag-varint, first value as
  raw 8 bytes;
- timestamps: delta-of-delta, zigzag-varint (regular sampling -> 1
  byte per point, usually 0);
- values: XOR with the previous value; control bit 0 = identical,
  else control bit 1 + 6-bit leading-zero count + 6-bit significant
  length + the significant XOR bits (the Gorilla value scheme,
  simplified to one window mode).

Spark shape: ``applyInPandas`` per series chunk — partition-local
numpy/int bit packing, zero shuffle beyond the one groupBy; decode is
the exact inverse, and the round trip is driver-certifiable because
decode(encode(x)) == x bit-for-bit.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        # drop flushed high bits — otherwise acc grows with the stream
        # and every shift turns O(total bits) (quadratic encode)
        self.acc &= (1 << self.n) - 1

    def write_varint(self, v: int) -> None:
        z = (v << 1) ^ (v >> 63) if v < 0 else v << 1  # zigzag
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                self.write(b | 0x80, 8)
            else:
                self.write(b, 8)
                break

    def bytes(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write(0, pad)
        return bytes(self.out)


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, bits: int) -> int:
        while self.n < bits:
            self.acc = (self.acc << 8) | self.buf[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1  # same O(1) bound as the writer
        return v

    def read_varint(self) -> int:
        z = 0
        shift = 0
        while True:
            b = self.read(8)
            z |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        return (z >> 1) ^ -(z & 1)  # un-zigzag


def encode_block(ts: list[int], values: list[float]) -> bytes:
    """(sorted int64 timestamps, float64 values) -> compressed block."""
    if len(ts) != len(values) or not ts:
        raise ValueError("encode_block needs equal-length non-empty inputs")
    w = _BitWriter()
    w.write_varint(len(ts))
    w.write_varint(ts[0])
    first_bits = struct.unpack(">Q", struct.pack(">d", values[0]))[0]
    w.write(first_bits, 64)
    prev_t, prev_delta = ts[0], 0
    prev_bits = first_bits
    for i in range(1, len(ts)):
        delta = ts[i] - prev_t
        w.write_varint(delta - prev_delta)
        prev_t, prev_delta = ts[i], delta
        bits = struct.unpack(">Q", struct.pack(">d", values[i]))[0]
        x = bits ^ prev_bits
        prev_bits = bits
        if x == 0:
            w.write(0, 1)
        else:
            lead = 64 - x.bit_length()
            sig = x.bit_length() - (_trailing_zeros(x))
            w.write(1, 1)
            w.write(lead, 6)
            w.write(sig - 1, 6)  # sig in 1..64 -> 0..63
            w.write(x >> _trailing_zeros(x), sig)
    return w.bytes()


def _trailing_zeros(x: int) -> int:
    return (x & -x).bit_length() - 1


def decode_block(block: bytes) -> tuple[list[int], list[float]]:
    """Inverse of :func:`encode_block` — bit-exact."""
    r = _BitReader(block)
    n = r.read_varint()
    t0 = r.read_varint()
    bits = r.read(64)
    ts = [t0]
    values = [struct.unpack(">d", struct.pack(">Q", bits))[0]]
    prev_t, prev_delta = t0, 0
    prev_bits = bits
    for _ in range(n - 1):
        dod = r.read_varint()
        delta = prev_delta + dod
        t = prev_t + delta
        ts.append(t)
        prev_t, prev_delta = t, delta
        if r.read(1):
            lead = r.read(6)
            sig = r.read(6) + 1
            frac = r.read(sig)
            x = frac << (64 - lead - sig)
            prev_bits ^= x
        values.append(struct.unpack(">d", struct.pack(">Q", prev_bits))[0])
    return ts, values


#: schema produced by compress_series
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("chunk", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("block", T.BinaryType()),
    ]
)


def compress_series(
    df: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_seconds: int | None = 6 * 3600,
) -> DataFrame:
    """(series, ts int64-ns, value) -> compressed blocks keyed
    (series, chunk): one block per series per ``chunk_seconds``
    tumbling window — the M3DB block-per-(series, time-window) layout.
    Chunking is what makes this scale: block size is bounded by the
    window (no unbounded per-series group), and encoding parallelizes
    over (series x chunks) tasks. ``chunk_seconds=None`` packs each
    whole series into one block (only for small snapshots)."""
    span = (chunk_seconds or 0) * 1_000_000_000
    chunk = (
        (F.col(ts_col) - F.col(ts_col) % F.lit(span)).cast("long")
        if chunk_seconds
        else F.lit(0).cast("long")
    )

    def one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ts = [int(t) for t in pdf[ts_col]]
        vals = [float(v) for v in pdf[value_col]]
        block = encode_block(ts, vals)
        return pd.DataFrame(
            {
                "series": [key[0]],
                "chunk": [int(key[1])],
                "n_points": [len(ts)],
                "n_bytes": [len(block)],
                "block": [block],
            }
        )

    return (
        df.select(series_col, ts_col, value_col)
        .withColumn("_chunk", chunk)
        .groupBy(series_col, "_chunk")
        .applyInPandas(one, BLOCK_SCHEMA)
    )


#: schema produced by decompress_series
POINTS_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def fetch_range(
    blocks: DataFrame,
    start_ns: int,
    end_ns: int,
    chunk_seconds: int = 6 * 3600,
) -> DataFrame:
    """Pruned block-store read: decode only blocks whose chunk window
    can overlap [start_ns, end_ns), then filter rows exactly — the
    block-skipping read path of a series store (M3DB reads only the
    blocks covering the query range). The chunk filter is a plain
    predicate, so with blocks persisted to parquet it pushes into the
    scan and untouched blocks are never read OR decoded."""
    span = chunk_seconds * 1_000_000_000
    lo = start_ns - start_ns % span
    pruned = blocks.filter(
        (F.col("chunk") >= F.lit(lo)) & (F.col("chunk") < F.lit(end_ns))
    )
    pts = decompress_series(pruned)
    return pts.filter((F.col("ts") >= start_ns) & (F.col("ts") < end_ns))


def decompress_series(blocks: DataFrame) -> DataFrame:
    """(series, ..., block) -> (series, ts, value) rows — the exact
    inverse scan, partition-local mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_s, out_t, out_v = [], [], []
            for series, block in zip(pdf["series"], pdf["block"]):
                ts, vals = decode_block(bytes(block))
                out_s.extend([series] * len(ts))
                out_t.extend(ts)
                out_v.extend(vals)
            yield pd.DataFrame({"series": out_s, "ts": out_t, "value": out_v})

    return blocks.select("series", "block").mapInPandas(batches, POINTS_SCHEMA)
