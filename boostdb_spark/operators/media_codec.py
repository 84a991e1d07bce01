"""Pure-stdlib media codecs: PNG (zlib inflate + scanline unfilter) and
PCM WAV — so the multimodal pixel/sample paths are REAL in a container
without image/audio libraries. North-star extension beyond the
reference (which has no media surface; see SURVEY.md §2.7 note).

Scope is the deterministic subset a curation pipeline needs:

- PNG decode: 8-bit depth, grayscale / gray+alpha / RGB / RGBA
  (color types 0, 4, 2, 6), non-interlaced. All five scanline filters
  (None/Sub/Up/Average/Paeth) per the PNG spec §9. Palette and 16-bit
  images raise ``NotImplementedError`` — never a silent wrong decode.
- PNG encode: filter 0 + fixed-level zlib, so byte output is
  deterministic for a given pixel array on every platform.
- Nearest-neighbor resize on the decoded array (numpy index maps).
- PCM WAV: 16-bit little-endian samples, the RIFF/fmt/data walk shared
  with :func:`boostdb_spark.operators.multimodal.parse_media_header`.

Everything here runs inside Arrow-batched ``mapInPandas`` workers —
partition-local, zero shuffle; numpy does the per-pixel math.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (8-bit, non-palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (H, W, ch) uint8."""
    stride = width * ch
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 1:  # Sub: cumulative sum per byte lane
            out[y] = (
                row.reshape(width, ch).astype(np.uint64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            out[y] = row + prev  # uint8 wraparound is the spec's mod 256
        elif ftype == 3:  # Average: sequential in the left neighbor
            r = out[y]
            for i in range(stride):
                left = int(r[i - ch]) if i >= ch else 0
                r[i] = (int(row[i]) + (left + int(prev[i])) // 2) % 256
        elif ftype == 4:  # Paeth
            r = out[y]
            for i in range(stride):
                a = int(r[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(out[y - 1][i - ch]) if (i >= ch and y) else 0
                r[i] = (int(row[i]) + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
    return out.reshape(height, width, ch)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 pixel array. Pure stdlib inflate +
    unfilter; supports the 8-bit non-interlaced subset documented in
    the module docstring."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    width = height = None
    color_type = depth = interlace = None
    idat = bytearray()
    i = 8
    n = len(payload)
    while i + 8 <= n:
        clen = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG subset: depth={depth} color_type={color_type} "
            f"interlace={interlace} not supported (8-bit 0/2/4/6 only)"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * ch)
    if len(raw) != expect:
        raise ValueError(f"PNG: inflated {len(raw)} bytes, expected {expect}")
    return _unfilter(raw, width, height, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 -> deterministic PNG bytes (filter 0,
    fixed zlib level, so equal arrays encode to equal bytes)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"PNG encode: {ch} channels unsupported")
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + tag
            + data
            + (zlib.crc32(tag + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (pixel-center
    sampling: src = floor((dst + 0.5) * src_dim / dst_dim))."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys][:, xs]


# --- PCM WAV ---------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """int16 sample array (n,) or (n, channels) -> RIFF/WAVE bytes."""
    a = np.ascontiguousarray(samples, dtype="<i2").reshape(-1, channels)
    data = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((n, channels) int16 array, sample_rate).
    Walks chunks (fmt need not precede LIST etc.); PCM 16-bit only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    n = len(payload)
    i = 12
    channels = rate = bits = audio_fmt = None
    data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and clen >= 16:
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
        elif cid == b"data":
            data = payload[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen & 1)
    if channels is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(f"WAV subset: fmt={audio_fmt} bits={bits}")
    a = np.frombuffer(data, dtype="<i2")
    return a.reshape(-1, channels), rate
