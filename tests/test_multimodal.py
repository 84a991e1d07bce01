"""Multimodal operators: REAL header parsing for PNG/JPEG/WAV built
in-memory from stdlib (no codec needed), the non-media stub path, and
the capability contract of the resize stage."""

import io
import struct
import wave
import zlib

import pytest

from boostdb_spark.operators import multimodal as mm


def _png(width: int, height: int) -> bytes:
    """Minimal valid grayscale PNG built with stdlib only."""
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg(width: int, height: int) -> bytes:
    """JPEG header bytes through SOF0 (enough for dimension parsing)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(channels: int, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * 4)
    return buf.getvalue()


def test_parse_media_header_real_containers():
    assert mm.parse_media_header(_png(31, 17)) == (31, 17, "image/png")
    assert mm.parse_media_header(_jpeg(640, 480)) == (640, 480, "image/jpeg")
    assert mm.parse_media_header(_wav(2, 44100)) == (2, 44100, "audio/wav")
    assert mm.parse_media_header(b"just some text bytes") is None


def test_parse_jpeg_marker_edge_cases():
    """ITU-T.81 B.1.1 scan rules: 0xFF fill bytes may pad any marker,
    TEM (0x01) is standalone, and SOS/EOI terminate the header scan."""
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 99, 77, 1) + b"\x01\x11\x00"
    # fill bytes before the SOF marker
    assert mm.parse_media_header(b"\xff\xd8\xff\xff\xff" + sof0[1:]) == (
        77, 99, "image/jpeg",
    )
    # standalone TEM marker between segments
    assert mm.parse_media_header(b"\xff\xd8" + b"\xff\x01" + sof0) == (
        77, 99, "image/jpeg",
    )
    # SOS before any SOF: scan must stop at entropy data, not walk into
    # it (the old fixed-step scan read garbage dimensions here)
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    entropy = b"\x12\x34\x56\xff\x00\x9a"  # stuffed 0xFF00 inside
    with pytest.raises(ValueError, match="no SOF"):
        mm.parse_media_header(b"\xff\xd8\xff\xe1" + struct.pack(">H", 4)
                              + b"ab" + sos + entropy)


def test_parse_wav_chunk_walk():
    """The fmt chunk need not sit at offset 12 — a LIST/INFO chunk may
    legally precede it; fixed-offset parsing returned garbage here."""
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 2, 22050, 22050 * 4, 4, 16
    )
    listc = b"LIST" + struct.pack("<I", 10) + b"INFOabcdef"
    data = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    wav = b"RIFF" + struct.pack("<I", 4 + len(listc) + len(fmt) + len(data)) \
        + b"WAVE" + listc + fmt + data
    assert mm.parse_media_header(wav) == (2, 22050, "audio/wav")
    # no fmt chunk at all -> None, not garbage
    nofmt = b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data
    assert mm.parse_media_header(nofmt) is None


def test_extract_media_meta_mixed_batch(spark):
    rows = [
        (1, _png(8, 4)),
        (2, _jpeg(320, 200)),
        (3, _wav(1, 16000)),
        (4, b"plain text payload"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.extract_media_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["media_type"]) == (8, 4, "image/png")
    assert (got[2]["width"], got[2]["height"], got[2]["media_type"]) == (320, 200, "image/jpeg")
    assert (got[3]["width"], got[3]["height"], got[3]["media_type"]) == (1, 16000, "audio/wav")
    assert got[4]["media_type"] == "text/plain"
    assert got[4]["n_bytes"] == len(b"plain text payload")


def test_resize_capability_contract(spark):
    # non-media payloads: deterministic stub honoring the size contract
    df = spark.createDataFrame([(1, b"abc")], "doc_id long, payload binary")
    out = mm.resize_media(df, 4, 3).collect()[0]
    assert len(out["payload"]) == 12 and (out["width"], out["height"]) == (4, 3)

    # real PNG: resized through the stdlib codec regardless of PIL
    img_df = spark.createDataFrame(
        [(2, _png(8, 4))], "doc_id long, payload binary"
    )
    r = mm.resize_media(img_df, 4, 2).collect()[0]
    assert mm.parse_media_header(bytes(r["payload"]))[:2] == (4, 2)

    # real JPEG: resized through the pure-numpy DCT codec
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc
    from boostdb_spark.operators import media_codec as mc

    jp = jc.encode_jpeg_gray(np.full((8, 4), 90, dtype=np.uint8))
    out = mm._resize_payload(jp, 4, 2)
    assert (mc.decode_png(out) == 90).all()

    # truncated JPEG (header only, no scan): refused, not faked
    with pytest.raises(Exception):
        mm._resize_payload(_jpeg(8, 4), 4, 2)

    # audio: resize undefined — refused
    with pytest.raises(NotImplementedError, match="audio"):
        mm._resize_payload(_wav(1, 8000), 4, 2)


# --- pure-stdlib codecs (media_codec) --------------------------------------


def test_png_roundtrip_all_shapes():
    import numpy as np

    from boostdb_spark.operators import media_codec as mc

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        out = mc.decode_png(mc.encode_png(arr))
        assert out.shape == (13, 9, ch)
        assert (out == arr).all()


def test_png_decode_every_filter_type():
    """Hand-encode scanlines with filters 1-4 (our encoder only emits
    filter 0) and check the decoder reconstructs the same pixels."""
    import numpy as np

    from boostdb_spark.operators import media_codec as mc

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w, ch = arr.shape
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    flat = arr.reshape(h, stride).astype(int)
    for y in range(h):
        f = y % 5  # cycle through all five filter types
        raw.append(f)
        for i in range(stride):
            x = flat[y][i]
            left = flat[y][i - ch] if i >= ch else 0
            up = flat[y - 1][i] if y else 0
            ul = flat[y - 1][i - ch] if (y and i >= ch) else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - (left + up) // 2
            else:
                v = x - paeth(left, up, ul)
            raw.append(v % 256)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (mc.decode_png(payload) == arr).all()


def test_png_unsupported_subsets_refuse():
    from boostdb_spark.operators import media_codec as mc

    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)  # 16-bit depth

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 36))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        mc.decode_png(payload)


def test_resize_nearest_matches_naive():
    import numpy as np

    from boostdb_spark.operators import media_codec as mc

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    out = mc.resize_nearest(arr, 9, 21)
    assert out.shape == (21, 9, 3)
    for y in range(21):
        for x in range(9):
            sy = min(int((y + 0.5) * 10 / 21), 9)
            sx = min(int((x + 0.5) * 14 / 9), 13)
            assert (out[y, x] == arr[sy, sx]).all()


def test_wav_pcm16_roundtrip_and_stdlib_compat():
    import numpy as np

    from boostdb_spark.operators import media_codec as mc

    rng = np.random.default_rng(5)
    samples = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    payload = mc.encode_wav_pcm16(samples, 22050, channels=2)
    # our decoder
    a, rate = mc.decode_wav_pcm16(payload)
    assert rate == 22050 and a.shape == (100, 2) and (a == samples).all()
    # stdlib wave agrees on geometry and frames
    with wave.open(io.BytesIO(payload)) as w:
        assert (w.getnchannels(), w.getframerate(), w.getnframes()) == (2, 22050, 100)
        assert w.readframes(100) == samples.tobytes()
    # header parser sees the same geometry
    assert mm.parse_media_header(payload) == (2, 22050, "audio/wav")


def test_resize_payload_real_png_pixel_path():
    """_resize_payload on a REAL PNG must use the stdlib codec (no PIL
    needed) and produce a decodable PNG with the resized pixels."""
    import numpy as np

    from boostdb_spark.operators import media_codec as mc

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)[:, :, None] * 3
    out = mm._resize_payload(mc.encode_png(arr), 4, 4)
    decoded = mc.decode_png(out)
    assert (decoded == mc.resize_nearest(arr, 4, 4)).all()


# --- baseline JPEG codec (jpeg_codec) --------------------------------------


def test_jpeg_even_gray_levels_roundtrip_exactly():
    """Even gray levels hit the Annex-K quantizer on integer DC steps:
    the full encode->decode round trip is IDENTITY for all 128 of
    them (the basis of the multimodal_jpeg analytic oracle)."""
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc

    for g in range(0, 256, 2):
        arr = np.full((6, 10), g, dtype=np.uint8)
        out = jc.decode_jpeg(jc.encode_jpeg_gray(arr))
        assert out.shape == (6, 10)
        u = np.unique(out)
        assert len(u) == 1 and u[0] == g, (g, u)


def test_jpeg_smooth_gradient_small_error():
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc

    x = np.linspace(0, 255, 64)
    arr = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg_gray(arr))
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.max() <= 8 and err.mean() < 2


def test_jpeg_encoder_deterministic_and_header_parseable():
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc

    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    p1, p2 = jc.encode_jpeg_gray(arr), jc.encode_jpeg_gray(arr.copy())
    assert p1 == p2
    # the multimodal header parser reads the SOF dims from our stream
    assert mm.parse_media_header(p1) == (23, 17, "image/jpeg")
    out = jc.decode_jpeg(p1)
    assert out.shape == (17, 23)


def test_jpeg_refuses_progressive():
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc

    payload = bytearray(jc.encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        jc.decode_jpeg(bytes(payload))


def test_jpeg_color_420_dc_only_decode():
    """Hand-built 4:2:0 YCbCr JPEG (one 16x16 MCU, DC-only blocks, all
    components on huffman/quant table 0): covers the color decode path
    — MCU interleave, chroma upsampling, YCbCr->RGB — with analytic
    expectations."""
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc

    qy, qcb, qcr = 12, -6, 20  # quantized DC per component
    q00 = int(jc._Q_LUMA[0, 0])  # 16

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0]) + bytes(int(jc._Q_LUMA[jc._ZZ[k]]) for k in range(64)))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", 16, 16)
              + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(jc._DC_LUMA_BITS) + bytes(jc._DC_LUMA_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(jc._AC_LUMA_BITS) + bytes(jc._AC_LUMA_VALS))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    dc_codes = jc._encode_codes(jc._DC_LUMA_BITS, jc._DC_LUMA_VALS)
    ac_codes = jc._encode_codes(jc._AC_LUMA_BITS, jc._AC_LUMA_VALS)
    w = jc._BitWriter()

    def dc_block(diff):
        t, bits_v = jc._magnitude(diff)
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(bits_v, t)
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)

    # MCU: 4 Y blocks (diff qy then 0,0,0 — per-component DC prediction),
    # then Cb, Cr (each its own predictor)
    dc_block(qy); dc_block(0); dc_block(0); dc_block(0)
    dc_block(qcb)
    dc_block(qcr)
    w.flush()

    payload = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
               + bytes(w.out) + b"\xff\xd9")
    out = jc.decode_jpeg(payload)
    assert out.shape == (16, 16, 3)

    y = qy * q00 / 8.0 + 128
    cb = qcb * q00 / 8.0
    cr = qcr * q00 / 8.0
    exp = [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb]
    exp = [int(np.clip(np.floor(v + 0.5), 0, 255)) for v in exp]
    got = np.unique(out.reshape(-1, 3), axis=0)
    assert got.shape[0] == 1 and list(got[0]) == exp, (got, exp)


def test_jpeg_color_encoder_roundtrip():
    """Full-color 4:2:0 encode -> decode: neutral solid colors are
    exact, smooth gradients stay within JPEG-typical error."""
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc

    solid = np.full((20, 30, 3), 120, dtype=np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg_color(solid))
    assert out.shape == (20, 30, 3) and (out == 120).all()

    x = np.linspace(0, 255, 48)
    arr = np.clip(
        np.stack([np.tile(x, (48, 1)), np.tile(x, (48, 1)).T,
                  np.full((48, 48), 100.0)], axis=-1),
        0, 255,
    ).astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg_color(arr))
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.mean() < 4 and err.max() <= 25

    # odd (non-MCU-aligned) dims crop correctly; output is deterministic
    odd = arr[:19, :25]
    o1 = jc.encode_jpeg_color(odd)
    assert jc.decode_jpeg(o1).shape == (19, 25, 3)
    assert o1 == jc.encode_jpeg_color(odd.copy())
    # the multimodal pipeline decodes it too (resize path)
    assert mm.parse_media_header(o1) == (25, 19, "image/jpeg")
    resized = mm._resize_payload(o1, 5, 4)
    from boostdb_spark.operators import media_codec as mc

    assert mc.decode_png(resized).shape == (4, 5, 3)


# --- codec property tests --------------------------------------------------


def test_png_roundtrip_property():
    """Property: every uint8 array (any dims 1..40, 1..4 channels)
    survives encode->decode bit-exactly."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from boostdb_spark.operators import media_codec as mc

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        ch=st.integers(1, 4),
        seed=st.integers(0, 2**31),
    )
    def check(h, w, ch, seed):
        arr = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, ch), dtype=np.uint8
        )
        assert (mc.decode_png(mc.encode_png(arr)) == arr).all()

    check()


def test_wav_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from boostdb_spark.operators import media_codec as mc

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 500),
        ch=st.integers(1, 4),
        rate=st.sampled_from([8000, 22050, 44100, 48000]),
        seed=st.integers(0, 2**31),
    )
    def check(n, ch, rate, seed):
        s = np.random.default_rng(seed).integers(
            -32768, 32768, size=(n, ch), dtype=np.int16
        )
        a, r = mc.decode_wav_pcm16(mc.encode_wav_pcm16(s, rate, channels=ch))
        assert r == rate and (a == s).all()

    check()


def test_codec_corrupt_inputs_raise_not_garbage():
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc
    from boostdb_spark.operators import media_codec as mc

    good = mc.encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(Exception):
        mc.decode_png(good[:30])  # truncated IDAT
    with pytest.raises(ValueError):
        mc.decode_png(b"\x89PNG\r\n\x1a\x00garbage")  # bad signature tail
    with pytest.raises(ValueError):
        mc.decode_wav_pcm16(b"RIFFxxxxWAVE")  # no fmt/data chunks
    jp = jc.encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(Exception):
        jc.decode_jpeg(jp[: len(jp) // 2])  # truncated entropy data


def test_jpeg_restart_markers_decode():
    """DRI/RSTn streams: hand-build a 2-MCU grayscale JPEG with a
    restart interval of 1 (RST0 between MCUs, DC predictors reset) and
    check the decoder reproduces both blocks."""
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc

    q00 = int(jc._Q_LUMA[0, 0])
    dc_codes = jc._encode_codes(jc._DC_LUMA_BITS, jc._DC_LUMA_VALS)
    ac_codes = jc._encode_codes(jc._AC_LUMA_BITS, jc._AC_LUMA_VALS)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dc_only_mcu(qdc):
        w = jc._BitWriter()
        t, bits_v = jc._magnitude(qdc)  # predictor RESET: diff == dc
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(bits_v, t)
        code, ln = ac_codes[0x00]
        w.write(code, ln)
        w.flush()
        return bytes(w.out)

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(int(jc._Q_LUMA[jc._ZZ[k]]) for k in range(64)))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(jc._DC_LUMA_BITS) + bytes(jc._DC_LUMA_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(jc._AC_LUMA_BITS) + bytes(jc._AC_LUMA_VALS))
        + seg(0xDD, (1).to_bytes(2, "big"))  # DRI: restart every MCU
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + dc_only_mcu(10)
        + b"\xff\xd0"  # RST0
        + dc_only_mcu(-4)
        + b"\xff\xd9"
    )
    out = jc.decode_jpeg(payload)
    assert out.shape == (8, 16)
    import numpy as np

    v0 = int(np.clip(np.floor(10 * q00 / 8.0 + 128 + 0.5), 0, 255))
    v1 = int(np.clip(np.floor(-4 * q00 / 8.0 + 128 + 0.5), 0, 255))
    assert (out[:, :8] == v0).all() and (out[:, 8:] == v1).all()


def test_jpeg_quality_knob():
    """libjpeg-convention quality scaling: default == Annex-K exactly;
    higher quality -> lower error, lower quality -> fewer bytes."""
    import numpy as np

    from boostdb_spark.operators import jpeg_codec as jc

    x = np.linspace(0, 255, 64)
    arr = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    assert jc.encode_jpeg_gray(arr) == jc.encode_jpeg_gray(arr, quality=None)

    def err(q):
        return np.abs(
            jc.decode_jpeg(jc.encode_jpeg_gray(arr, quality=q)).astype(int) - arr
        ).mean()

    assert err(95) < err(50) < err(10)
    assert len(jc.encode_jpeg_gray(arr, 10)) < len(jc.encode_jpeg_gray(arr, 95))
    # quality-50 scaling is the identity on the Annex-K base tables
    assert (jc._scaled_table(jc._Q_LUMA, 50) == jc._Q_LUMA).all()
    with pytest.raises(ValueError):
        jc.encode_jpeg_gray(arr, quality=0)
    # color path accepts the knob and stays decodable
    carr = np.stack([arr] * 3, axis=-1)
    assert jc.decode_jpeg(jc.encode_jpeg_color(carr, quality=80)).shape == (64, 64, 3)
