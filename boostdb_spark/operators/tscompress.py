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


def _bitlen_u32(x):
    """Exact bit_length for a uint32 array. float64 holds 32-bit ints
    exactly and log2 is correctly rounded, so floor(log2(x)) cannot
    round (2^k - eps) up to k for k <= 32 (the gap ~2^-k dwarfs
    ulp(32) = 2^-47)."""
    import numpy as np

    out = np.zeros(x.shape, dtype=np.int64)
    nz = x != 0
    out[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
    return out


def _bitlen_u64(x):
    import numpy as np

    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return np.where(hi != 0, _bitlen_u32(hi) + 64 - 32, _bitlen_u32(lo))


def encode_block(ts: list[int], values: list[float]) -> bytes:
    """(sorted int64 timestamps, float64 values) -> compressed block.

    Vectorized: every per-point quantity (delta-of-delta, zigzag,
    varint bytes, XOR lead/sig/frac) is a numpy array op, and the
    variable-width bit-packing runs as one repeat/cumsum expansion to
    a flat bit array + ``np.packbits`` — no per-point Python loop.
    Bit-identical to the scalar reference :func:`_encode_block_py`
    (pinned by a hypothesis test); the header is emitted through the
    same ``_BitWriter`` and is always whole bytes (varints + a 64-bit
    value), so the vectorized body starts byte-aligned."""
    import numpy as np

    if len(ts) != len(values) or not len(ts):
        raise ValueError("encode_block needs equal-length non-empty inputs")
    n = len(ts)
    t = np.asarray(ts, dtype=np.int64)
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)

    w = _BitWriter()
    w.write_varint(n)
    w.write_varint(int(t[0]))
    w.write(int(bits[0]), 64)
    header = w.bytes()  # whole bytes: n == 0 leftover bits
    if n == 1:
        return header

    # --- timestamps: delta-of-delta -> zigzag -> varint bytes ---
    deltas = np.diff(t)
    dod = np.diff(deltas, prepend=np.int64(0))
    u = dod.astype(np.uint64)
    z = (u << np.uint64(1)) ^ np.where(
        dod < 0, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0)
    )
    blz = _bitlen_u64(z)
    nb = np.maximum((blz + 6) // 7, 1)  # varint byte count, >=1

    # --- values: XOR records ---
    x = bits[1:] ^ bits[:-1]
    nzx = x != 0
    blx = _bitlen_u64(x)
    tz = np.where(nzx, _bitlen_u64(x & (~x + np.uint64(1))) - 1, 0)
    lead = (64 - blx).astype(np.uint64)
    sig = (blx - tz).astype(np.uint64)  # 1..64 where x != 0
    meta = np.where(
        nzx,
        (np.uint64(1) << np.uint64(12))
        | (lead << np.uint64(6))
        | (sig - np.uint64(1)),
        np.uint64(0),
    )
    frac = np.where(nzx, x >> tz.astype(np.uint64), np.uint64(0))

    # --- flat (value, width) field stream, per point:
    #     nb_i varint bytes, the control/meta field, the frac field ---
    m = n - 1
    per_point = nb + 1 + nzx  # fields contributed by each point
    f_start = np.cumsum(per_point) - per_point  # field index of byte 0
    n_fields = int(per_point.sum())
    fv = np.empty(n_fields, dtype=np.uint64)
    fw = np.empty(n_fields, dtype=np.int64)

    # varint bytes via ragged arange (no (m, nbmax) matrix)
    tot_vb = int(nb.sum())
    rj = np.arange(tot_vb) - np.repeat(np.cumsum(nb) - nb, nb)  # 0..nb_i-1
    z_rep = np.repeat(z, nb)
    cont = rj < np.repeat(nb - 1, nb)  # continuation bit
    vb = ((z_rep >> (rj * 7).astype(np.uint64)) & np.uint64(0x7F)) | (
        cont.astype(np.uint64) << np.uint64(7)
    )
    vb_pos = np.repeat(f_start, nb) + rj
    fv[vb_pos] = vb
    fw[vb_pos] = 8

    meta_pos = f_start + nb
    fv[meta_pos] = meta
    fw[meta_pos] = np.where(nzx, 13, 1)
    frac_pos = meta_pos[nzx] + 1
    fv[frac_pos] = frac[nzx]
    fw[frac_pos] = sig[nzx].astype(np.int64)

    # --- flat bit expansion + packbits (MSB-first, like _BitWriter) ---
    total = int(fw.sum())
    starts = np.cumsum(fw) - fw
    idx = np.repeat(np.arange(n_fields, dtype=np.int64), fw)
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, fw)
    shift = (fw[idx] - 1 - j).astype(np.uint64)
    bitarr = ((fv[idx] >> shift) & np.uint64(1)).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bitarr = np.concatenate([bitarr, np.zeros(pad, dtype=np.uint8)])
    return header + np.packbits(bitarr).tobytes()


def _encode_block_py(ts: list[int], values: list[float]) -> bytes:
    """Scalar reference encoder (the spec): kept for the
    vectorized==scalar hypothesis cross-check."""
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


def _decode_block_py(block: bytes) -> tuple[list[int], list[float]]:
    """Scalar reference decoder (the spec) — kept for the
    inlined==reference cross-check."""
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


def decode_block(block: bytes) -> tuple[list[int], list[float]]:
    """Inverse of :func:`encode_block` — bit-exact. The bit-reader
    state is inlined into ONE loop with local variables (no method
    calls in the ~3-reads-per-point hot path) and the float
    reconstruction batches through numpy at the end — ~3x the
    object-oriented reference decoder, same output (pinned by test)."""
    import numpy as np

    pos = 0
    acc = 0
    nb = 0  # bits held in acc

    # header varints are whole bytes at a byte-aligned position
    def hdr_varint():
        nonlocal pos
        z = 0
        shift = 0
        while True:
            b = block[pos]
            pos += 1
            z |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return (z >> 1) ^ -(z & 1)

    n = hdr_varint()
    t0 = hdr_varint()
    first_bits = int.from_bytes(block[pos : pos + 8], "big")
    pos += 8
    ts = [t0]
    out_bits = [first_bits]
    prev_t = t0
    prev_delta = 0
    prev_bits = first_bits
    ts_append = ts.append
    bits_append = out_bits.append
    for _ in range(n - 1):
        # --- zigzag varint (8-bit reads) ---
        z = 0
        shift = 0
        while True:
            while nb < 8:
                acc = (acc << 8) | block[pos]
                pos += 1
                nb += 8
            nb -= 8
            b = (acc >> nb) & 0xFF
            acc &= (1 << nb) - 1
            z |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        delta = prev_delta + ((z >> 1) ^ -(z & 1))
        prev_t += delta
        prev_delta = delta
        ts_append(prev_t)
        # --- control bit + optional XOR record ---
        if nb < 1:
            acc = (acc << 8) | block[pos]
            pos += 1
            nb += 8
        nb -= 1
        ctrl = (acc >> nb) & 1
        acc &= (1 << nb) - 1
        if ctrl:
            while nb < 12:
                acc = (acc << 8) | block[pos]
                pos += 1
                nb += 8
            nb -= 12
            meta = (acc >> nb) & 0xFFF
            acc &= (1 << nb) - 1
            lead = meta >> 6
            sig = (meta & 0x3F) + 1
            while nb < sig:
                acc = (acc << 8) | block[pos]
                pos += 1
                nb += 8
            nb -= sig
            frac = (acc >> nb) & ((1 << sig) - 1)
            acc &= (1 << nb) - 1
            prev_bits ^= frac << (64 - lead - sig)
        bits_append(prev_bits)
    values = (
        np.array(out_bits, dtype=np.uint64).view(np.float64).tolist()
    )
    return ts, values


#: schema produced by compress_series
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("chunk", T.LongType()),
        T.StructField("span_ns", T.LongType()),
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
        import numpy as np

        pdf = pdf.sort_values(ts_col)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        block = encode_block(ts, vals)
        return pd.DataFrame(
            {
                "series": [key[0]],
                "chunk": [int(key[1])],
                "span_ns": [span],
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
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Pruned block-store read: decode only blocks whose chunk window
    can overlap [start_ns, end_ns), then filter rows exactly — the
    block-skipping read path of a series store (M3DB reads only the
    blocks covering the query range). The chunk filter is a plain
    predicate, so with blocks persisted to parquet it pushes into the
    scan and untouched blocks are never read OR decoded.

    The chunk span is READ FROM the blocks themselves (``span_ns``,
    written by :func:`compress_series`) — a caller-supplied constant
    that disagreed with the writer's span would silently mis-compute
    the lower prune bound and drop overlapping blocks. Passing
    ``chunk_seconds`` is now only an assertion of intent: it raises if
    it doesn't match the recorded span. The span probe is a min/max
    agg over one small metadata column (partial-agg, column-pruned)."""
    row = blocks.agg(
        F.min("span_ns").alias("lo"), F.max("span_ns").alias("hi")
    ).first()
    if row["lo"] is None:  # empty block table
        return decompress_series(blocks.limit(0))
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"fetch_range: mixed chunk spans in block table "
            f"({row['lo']} != {row['hi']} ns) — re-chunk to one span"
        )
    span = int(row["lo"])
    if chunk_seconds is not None and chunk_seconds * 1_000_000_000 != span:
        raise ValueError(
            f"fetch_range: caller chunk_seconds={chunk_seconds} does not "
            f"match the span recorded at write time ({span} ns)"
        )
    if span > 0:
        lo = start_ns - start_ns % span
        blocks = blocks.filter(
            (F.col("chunk") >= F.lit(lo)) & (F.col("chunk") < F.lit(end_ns))
        )
    # span == 0: whole-series blocks — nothing to prune by
    pts = decompress_series(blocks)
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
