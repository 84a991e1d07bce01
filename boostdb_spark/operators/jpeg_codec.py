"""Pure numpy/stdlib BASELINE JPEG codec — the DCT companion of the
PNG/WAV codecs in :mod:`media_codec`, so the multimodal pixel path
needs NO image library for JPEG either.

Scope (ITU-T.81 baseline DCT, JFIF):

- **decode**: sequential baseline (SOF0), 8-bit, grayscale or YCbCr
  with 4:4:4 / 4:2:2 / 4:2:0 sampling, standard or custom huffman/
  quant tables, restart markers. Progressive (SOF2), arithmetic
  coding, and 12-bit raise ``NotImplementedError`` — never a wrong
  silent decode.
- **encode**: grayscale 4:4:4 (``encode_jpeg_gray``) and RGB 4:2:0
  YCbCr (``encode_jpeg_color``) baseline with the Annex K example
  tables. Deterministic: fixed tables, ``floor(x+0.5)`` rounding,
  no RNG — equal arrays encode to equal bytes on every platform.

All the per-pixel math (level shift, 8x8 orthonormal DCT pair,
quantization, chroma upsampling, color transform) is numpy; entropy
coding is plain Python over small per-block symbol streams. Runs
inside Arrow-batched ``mapInPandas`` workers, partition-local.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T.81 Annex K examples) --------------------------------

#: zig-zag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

#: Annex K.1 luminance quantization table (quality ~50 baseline)
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 typical huffman tables: (bits[1..16], values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: orthonormal 8-point DCT-II matrix: F = _DCT @ f @ _DCT.T
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list[int], vals: list[int]):
    """bits[i] = number of codes of length i+1 -> {(length, code): value}
    per the canonical JPEG assignment (ITU-T.81 Annex C)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing; stops at any real marker (caller inspects it)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        b = self.buf
        while self.n <= 24:
            if self.pos >= len(b):
                return self.n > 0
            c = b[self.pos]
            if c == 0xFF:
                nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
                if nxt == 0x00:  # stuffed data byte
                    self.pos += 2
                elif nxt is None:
                    return self.n > 0
                else:  # real marker: stop here
                    self.marker = nxt
                    return self.n > 0
                c = 0xFF
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | c
            self.n += 8
        return True

    def read_bit(self) -> int:
        if self.n == 0 and not self._fill():
            raise ValueError("JPEG: entropy data exhausted")
        self.n -= 1
        bit = (self.acc >> self.n) & 1
        self.acc &= (1 << self.n) - 1  # keep acc bounded: O(1) per bit
        return bit

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Drop partial-byte padding bits and consume the expected RST
        marker. The marker may not have been seen by ``_fill`` yet
        (fills stop early once >=24 bits are buffered), so look for it
        directly at the stream position when needed."""
        self.acc = 0
        self.n = 0
        if self.marker is None:
            b = self.buf
            if (
                self.pos + 1 < len(b)
                and b[self.pos] == 0xFF
                and 0xD0 <= b[self.pos + 1] <= 0xD7
            ):
                self.marker = b[self.pos + 1]
        if self.marker is not None:
            self.pos += 2  # skip FF Dn
            self.marker = None


def _huff_decode(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid huffman code")


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient magnitude decode (ITU-T.81 F.2.2.1)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W) grayscale or (H, W, 3) RGB uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        while i < n and payload[i] == 0xFF:
            i += 1
        marker = payload[i]
        i += 1
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[i : i + 2], "big")
        seg = payload[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k in range(64):
                    tbl[_ZZ[k]] = seg[p + 1 + k]
                qt[tid] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                huff[(cls, tid)] = _canonical_codes(bits, vals)
                p += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline sequential
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("JPEG: 12-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("JPEG: only baseline sequential (SOF0/1)")
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tt >> 4, tt & 0xF)
            data_start = i + seglen
            return _decode_scan(
                payload, data_start, frame, scan, qt, huff, restart_interval
            )
        i += seglen
    raise ValueError("JPEG: no SOS scan found")


def _decode_scan(buf, pos, frame, scan, qt, huff, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    r = _BitReader(buf, pos)
    pred = [0] * len(comps)
    idct = _DCT.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_to_marker()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tbl = huff[(0, scan[c["id"]][0])]
                ac_tbl = huff[(1, scan[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros((8, 8))
                        t = _huff_decode(r, dc_tbl)
                        diff = _extend(r.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coef[0, 0] = pred[ci] * q[0, 0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_tbl)
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            zz = _ZZ[k]
                            coef[zz] = _extend(r.read_bits(ss), ss) * q[zz]
                            k += 1
                        block = idct @ coef @ _DCT
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample to full resolution, crop, level shift
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0
            )
        out.append(p[:h, :w] + 128.0)
    if len(out) == 1:
        return np.clip(np.floor(out[0] + 0.5), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    # BT.601 inverse (JFIF)
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# --- encoder (grayscale baseline, Annex K tables) --------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # drop flushed bits so acc stays O(1) regardless of stream size
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _encode_codes(bits, vals):
    """value -> (code, length) for the encoder side."""
    dec = _canonical_codes(bits, vals)
    return {v: (code, length) for (length, code), v in dec.items()}


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit representation) of a DIFF/AC value."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, v if v >= 0 else v + (1 << t) - 1


def _scaled_table(base: "np.ndarray", quality: int) -> "np.ndarray":
    """Scale an Annex-K quantization table to a 1-100 quality setting
    with the libjpeg convention (integer math, deterministic):
    S = 5000/q below 50 else 200-2q; cell = clamp((base*S+50)//100, 1, 255)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base.astype(np.int64) * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def encode_jpeg_gray(arr: np.ndarray, quality: int | None = None) -> bytes:
    """(H, W) uint8 -> deterministic grayscale baseline JFIF bytes
    (Annex K luminance tables, floor(x+0.5) coefficient rounding).
    ``quality`` 1-100 scales the tables with the libjpeg convention;
    None keeps the exact Annex-K tables (the certified default)."""
    if arr.ndim != 2:
        raise ValueError("encode_jpeg_gray expects a 2-D grayscale array")
    h, w = arr.shape
    bh, bw = -(-h // 8), -(-w // 8)
    # edge-replicate to full blocks (standard practice; keeps DC local)
    padded = np.pad(
        arr.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    ) - 128.0
    dc_codes = _encode_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _encode_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bwr = _BitWriter()
    pred = 0
    qt = _Q_LUMA if quality is None else _scaled_table(_Q_LUMA, quality)
    q = qt.astype(np.float64)
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            pred = _encode_block(bwr, block, q, pred, dc_codes, ac_codes)
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = bytes([0]) + bytes(int(qt[_ZZ[k]]) for k in range(64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    app0 = b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + bytes(bwr.out)
        + b"\xff\xd9"
    )


#: Annex K.1 chrominance quantization table
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 typical chrominance huffman tables
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _encode_block(bwr, block, q, pred, dc_codes, ac_codes) -> int:
    """DCT + quantize + entropy-code one 8x8 block; returns the new DC
    predictor (shared by the gray and color encoders)."""
    coef = _DCT @ block @ _DCT.T
    qc = np.floor(coef / q + 0.5).astype(np.int64)
    dc = int(qc[0, 0])
    t, bits_v = _magnitude(dc - pred)
    code, ln = dc_codes[t]
    bwr.write(code, ln)
    if t:
        bwr.write(bits_v, t)
    zz_vals = [int(qc[_ZZ[k]]) for k in range(1, 64)]
    last_nz = 0
    for k, v in enumerate(zz_vals, start=1):
        if v != 0:
            last_nz = k
    run = 0
    for k, v in enumerate(zz_vals, start=1):
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bwr.write(code, ln)
            run -= 16
        t, bits_v = _magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        bwr.write(code, ln)
        bwr.write(bits_v, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bwr.write(code, ln)
    return dc


def encode_jpeg_color(arr: np.ndarray, quality: int | None = None) -> bytes:
    """(H, W, 3) RGB uint8 -> deterministic 4:2:0 YCbCr baseline JFIF
    bytes (Annex K luminance + chrominance tables, BT.601 forward
    transform, 2x2 box-average chroma subsampling). ``quality`` 1-100
    scales both tables with the libjpeg convention; None keeps the
    exact Annex-K tables."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg_color expects an (H, W, 3) RGB array")
    h, w = arr.shape[:2]
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    # pad to whole MCUs (16x16), edge-replicate
    mh, mw = -(-h // 16) * 16, -(-w // 16) * 16
    pad = ((0, mh - h), (0, mw - w))
    y, cb, cr = (np.pad(p, pad, mode="edge") for p in (y, cb, cr))
    # 2x2 box-average chroma subsample
    cb = cb.reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3))

    dc_l = _encode_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _encode_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _encode_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _encode_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    qtl = _Q_LUMA if quality is None else _scaled_table(_Q_LUMA, quality)
    qtc = _Q_CHROMA if quality is None else _scaled_table(_Q_CHROMA, quality)
    ql, qc_ = qtl.astype(np.float64), qtc.astype(np.float64)
    bwr = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mh // 16):
        for mx in range(mw // 16):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    pred[0] = _encode_block(
                        bwr, y[y0 : y0 + 8, x0 : x0 + 8], ql, pred[0], dc_l, ac_l
                    )
            c0, cx0 = my * 8, mx * 8
            pred[1] = _encode_block(
                bwr, cb[c0 : c0 + 8, cx0 : cx0 + 8], qc_, pred[1], dc_c, ac_c
            )
            pred[2] = _encode_block(
                bwr, cr[c0 : c0 + 8, cx0 : cx0 + 8], qc_, pred[2], dc_c, ac_c
            )
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt0 = bytes([0]) + bytes(int(qtl[_ZZ[k]]) for k in range(64))
    dqt1 = bytes([1]) + bytes(int(qtc[_ZZ[k]]) for k in range(64))
    sof = (
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    dht = (
        seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
        + seg(0xC4, bytes([0x01]) + bytes(_DC_CHROMA_BITS) + bytes(_DC_CHROMA_VALS))
        + seg(0xC4, bytes([0x11]) + bytes(_AC_CHROMA_BITS) + bytes(_AC_CHROMA_VALS))
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    app0 = b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt0)
        + seg(0xDB, dqt1)
        + seg(0xC0, sof)
        + dht
        + seg(0xDA, sos)
        + bytes(bwr.out)
        + b"\xff\xd9"
    )
