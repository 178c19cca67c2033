"""Multimodal decode plumbing: real PNG/GIF header parse + stub fallback."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from mahjong_etl_spark.operators.multimodal import (
    decode_payload,
    extract_media_features,
    parse_image_header,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # fake crc; header parse must not need it
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def test_parse_png_header():
    assert parse_image_header(_png(640, 480)) == (640, 480)
    assert parse_image_header(_png(1, 1)) == (1, 1)
    assert parse_image_header(_png(65535, 3)) == (65535, 3)


def test_parse_gif_header():
    assert parse_image_header(_gif(320, 200)) == (320, 200)
    assert parse_image_header(b"GIF87a" + struct.pack("<HH", 7, 9) + b"\x00" * 6) == (7, 9)


def test_parse_header_rejects_non_images():
    assert parse_image_header(b"") is None
    assert parse_image_header(b"plain text payload") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\n" + b"short") is None
    # PNG signature but first chunk is not IHDR
    bad = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"XXXX" + b"\x00" * 13
    assert parse_image_header(bad) is None


def test_decode_uses_real_dims_for_png_and_fallback_otherwise():
    png = _png(123, 45)
    d = decode_payload(png, "image")
    assert (d["width"], d["height"]) == (123, 45)
    # non-image kinds never take the header path
    n = len(png)
    d_audio = decode_payload(png, "audio")
    assert (d_audio["width"], d_audio["height"]) == (n % 640 + 1, (n * 31) % 480 + 1)
    # deterministic fallback for text payloads (what the oracle checks)
    text = b"some document text"
    d_text = decode_payload(text, "image")
    m = len(text)
    assert (d_text["width"], d_text["height"]) == (m % 640 + 1, (m * 31) % 480 + 1)
    # a TEXT document that merely starts with an ASCII image signature
    # must stay on the arithmetic path (the SQL oracle computes that
    # unconditionally — diverging here would fail the driver hash)
    trap = b"GIF87a is an image format from 1987"
    d_trap = decode_payload(trap, "image")
    k = len(trap)
    assert (d_trap["width"], d_trap["height"]) == (k % 640 + 1, (k * 31) % 480 + 1)


def test_extract_features_with_planted_png(spark):
    rows = [
        (1, "image", bytearray(_png(800, 600))),
        (2, "image", bytearray(b"not an image")),
        (3, "video", bytearray(b"fake video bytes")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    ).withColumn("meta", F.struct(F.lit(0).alias("n_chars")))
    out = {r.media_id: r for r in extract_media_features(media).collect()}
    assert (out[1].width, out[1].height) == (800, 600)
    n2 = len(b"not an image")
    assert (out[2].width, out[2].height) == (n2 % 640 + 1, (n2 * 31) % 480 + 1)
    assert out[3].n_frames == len(b"fake video bytes") % 24 + 1


def _jpeg(w: int, h: int) -> bytes:
    # SOI, APP0 (len 16), SOF0 with dims, then junk
    # seg_len 16 = 2 length bytes + 14 data bytes
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_jpeg_header():
    assert parse_image_header(_jpeg(1024, 768)) == (1024, 768)
    assert parse_image_header(_jpeg(1, 1)) == (1, 1)
    # truncated after SOI -> None
    assert parse_image_header(b"\xff\xd8\xff") is None
    # no SOF before EOI -> None
    assert parse_image_header(b"\xff\xd8\xff\xd9" + b"\x00" * 8) is None


def _wav(rate=44100, channels=2, bits=16) -> bytes:
    import struct

    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    data = b"\x00" * 8
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
           + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_header_parse_and_fallback():
    from mahjong_etl_spark.operators.multimodal import parse_wav_header

    assert parse_wav_header(_wav(22050, 1, 8)) == (22050, 1, 8)
    assert parse_wav_header(b"RIFF0000WAVE") is None  # no fmt chunk
    assert parse_wav_header(b"not audio at all") is None
    # fmt not first chunk: parser walks word-aligned chunks to find it
    import struct

    fmt = struct.pack("<HHIIHH", 1, 2, 48000, 48000 * 4, 4, 16)
    body = (b"WAVE" + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    assert parse_wav_header(b"RIFF" + struct.pack("<I", len(body)) + body) == (48000, 2, 16)


def test_extract_audio_features_planted_wav(spark):
    from mahjong_etl_spark.operators.multimodal import extract_audio_features
    from mahjong_etl_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    rows = [
        (1, "audio", bytearray(_wav(8000, 1, 16))),
        (2, "audio", bytearray(b"just some text bytes")),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert (got[1].sample_rate, got[1].n_channels, got[1].bits_per_sample) == (8000, 1, 16)
    n = len(b"just some text bytes")
    assert (got[2].sample_rate, got[2].n_channels) == (n % 48000 + 1, n % 2 + 1)


# ---------------------------------------------------------------------------
# Real PNG pixel decode (pure stdlib)
# ---------------------------------------------------------------------------


def _encode_png(px, filters):
    """Minimal in-test PNG encoder: uint8 (h, w, c) + per-row filter
    types -> valid PNG bytes.  Applies the spec filters FORWARD so the
    decoder's reconstruction is checked against known pixels through a
    genuinely filtered stream, not just filter-0."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    flat = px.reshape(h, w * c).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 2:
            enc = (row - prev) & 0xFF
        elif f == 1:
            enc = row.copy()
            for x in range(w * c - 1, c - 1, -1):
                enc[x] = (enc[x] - row[x - c]) & 0xFF
        elif f == 3:
            enc = row.copy()
            for x in range(w * c - 1, -1, -1):
                a = row[x - c] if x >= c else 0
                enc[x] = (enc[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            enc = row.copy()
            for x in range(w * c - 1, -1, -1):
                a = row[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (enc[x] - pred) & 0xFF
        raw.extend(int(v) & 0xFF for v in enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_pixel_decode_all_filters_roundtrip():
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import decode_png_pixels

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(11, 7, c), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            payload = _encode_png(px, filters)
            got = decode_png_pixels(payload)
            assert got is not None, (c, filters)
            assert got.shape == px.shape
            assert (got == px).all(), (c, filters)


def test_png_pixel_decode_rejects_unsupported():
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import decode_png_pixels

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = _encode_png(px, [0])
    assert decode_png_pixels(good) is not None
    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(good[:30]) is None  # truncated
    # 16-bit depth flag -> unsupported subset
    bad = bytearray(good)
    bad[24] = 16
    assert decode_png_pixels(bytes(bad)) is None


def test_pixel_stats_through_spark(spark):
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        decode_png_pixels,
        extract_pixel_stats,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    png = _encode_png(px, [0, 1, 2, 3, 4])
    rows = [
        (1, "image", bytearray(png)),
        (2, "image", bytearray(b"plain text payload")),  # undecodable
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r.media_id: r for r in extract_pixel_stats(media).collect()}
    assert set(got) == {1}
    r = got[1]
    assert (r.px_h, r.px_w, r.channels) == (9, 5, 3)
    assert r.px_mean_milli == round(float(np.mean(px)) * 1000)
    assert r.px_min == int(px.min()) and r.px_max == int(px.max())
    assert decode_png_pixels(bytes(png)) is not None


def test_pil_present_degrades_to_fallback_not_raise(monkeypatch):
    """An installed-but-unwired imaging library must NOT detonate the
    decode plane (r5 verdict: the old in-call `import PIL` +
    `raise NotImplementedError` sat outside its except-ImportError and
    would have killed every non-header decode the moment Pillow
    appeared).  Force the import-time probe flag on and assert
    decode_payload returns arithmetic dims with exactly one warning."""
    import warnings

    import mahjong_etl_spark.operators.multimodal as mm

    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    monkeypatch.setattr(mm, "_PIL_WARNED", False)
    payload = b"\xff\xfe not utf8, not a known header"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        d = mm.decode_payload(payload, "image")
        d2 = mm.decode_payload(payload, "image")
    n = len(payload)
    assert (d["width"], d["height"]) == (n % 640 + 1, (n * 31) % 480 + 1)
    assert d == d2
    assert sum("arithmetic dims" in str(x.message) for x in w) == 1


def test_pil_probe_happens_at_import(tmp_path):
    """The probe must run at module import (workers import fresh), so
    plant a fake PIL package on a subprocess's path and import the
    module there: the probe must set _HAVE_PIL and the module import
    itself must not raise."""
    import subprocess
    import sys

    pkg = tmp_path / "PIL"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "Image.py").write_text("")
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import mahjong_etl_spark.operators.multimodal as mm; "
        "assert mm._HAVE_PIL is True; "
        "d = mm.decode_payload(b'\\xff\\xfe not a header', 'image'); "
        "print(d['width'], d['height'])"
    )
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code, str(tmp_path)],
        capture_output=True,
        text=True,
        cwd=repo_root,
        check=True,
    )
    assert out.stdout.strip()


# ---------------------------------------------------------------------------
# GIF codec: pure-Python LZW encode/decode
# ---------------------------------------------------------------------------


def test_gif_roundtrip_shapes_palettes_interlace():
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    rng = np.random.default_rng(7)
    for h, w, ncol, inter in [
        (1, 1, 1, False),
        (3, 5, 2, True),
        (8, 8, 4, False),
        (16, 16, 64, False),
        (16, 16, 64, True),
        (17, 13, 256, True),  # odd dims, full palette
    ]:
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        px = pal[rng.integers(0, ncol, size=(h, w))]
        back = decode_gif_pixels(encode_gif(px, interlace=inter))
        assert back is not None and back.shape == (h, w, 3)
        assert np.array_equal(back, px), (h, w, ncol, inter)


def test_gif_lzw_table_full_clear_path():
    """A 128x128 256-color noise image forces the LZW dictionary past
    the 4096-entry spec ceiling: the encoder must emit a clear and
    reset, and the decoder must follow — byte-exact roundtrip."""
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        _gif_lzw_encode,
        decode_gif_pixels,
        encode_gif,
    )

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(128, 128))
    px = pal[idx]
    assert np.array_equal(decode_gif_pixels(encode_gif(px)), px)
    # noise at 256 symbols adds ~1 entry per code: the table must
    # have wrapped (>4096 entries worth of additions)
    assert 128 * 128 / 2 > 4096


def test_gif_decode_never_raises_on_garbage():
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    g = encode_gif(pal[rng.integers(0, 16, size=(12, 12))])
    for cut in range(0, len(g), 23):
        r = decode_gif_pixels(g[:cut])
        assert r is None or r.shape[2] == 3
    for i in range(0, len(g), 17):
        b = bytearray(g)
        b[i] ^= 0xFF
        r = decode_gif_pixels(bytes(b))
        assert r is None or (r.ndim == 3 and r.shape[2] == 3)
    assert decode_gif_pixels(b"GIF89a") is None
    assert decode_gif_pixels(b"not a gif at all") is None


def test_gif_encode_rejects_over_256_colors():
    import numpy as np
    import pytest as _pytest

    from mahjong_etl_spark.operators.multimodal import encode_gif

    grad = np.zeros((32, 32, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(32)[:, None] * 8
    grad[:, :, 1] = np.arange(32)[None, :] * 8
    with _pytest.raises(ValueError):
        encode_gif(grad)


def test_pixel_stats_cover_gif_payloads(spark):
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        encode_gif,
        extract_pixel_stats,
    )

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 32, size=(7, 9))]
    rows = [
        (1, "image", bytearray(encode_gif(px, interlace=True))),
        (2, "image", bytearray(b"plain text payload")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r.media_id: r for r in extract_pixel_stats(media).collect()}
    assert set(got) == {1}
    r = got[1]
    assert (r.px_h, r.px_w, r.channels) == (7, 9, 3)
    assert r.px_min == int(px.min()) and r.px_max == int(px.max())


# ---------------------------------------------------------------------------
# WAV PCM sample codec
# ---------------------------------------------------------------------------


def test_wav_sample_roundtrip_bit_exact():
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav,
        parse_wav_header,
    )

    rng = np.random.default_rng(17)
    for n, rate in [(1, 8000), (256, 8000), (1000, 44100)]:
        v = rng.integers(-32768, 32768, size=n).astype(np.int16)
        w = encode_wav(v, rate)
        assert parse_wav_header(w) == (rate, 1, 16)
        got = decode_wav_samples(w)
        assert got is not None
        s, r, c = got
        assert (r, c) == (rate, 1)
        assert np.array_equal(s, v)


def test_wav_decode_rejects_out_of_subset_and_garbage():
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav,
    )

    v = np.arange(64, dtype=np.int16)
    w = bytearray(encode_wav(v))
    # 8-bit PCM flag -> out of subset
    bits_off = w.find(b"fmt ") + 8 + 14
    w8 = bytearray(w)
    w8[bits_off] = 8
    assert decode_wav_samples(bytes(w8)) is None
    # truncation fuzz: never raises
    for cut in range(0, len(w), 11):
        r = decode_wav_samples(bytes(w[:cut]))
        assert r is None or len(r) == 3
    assert decode_wav_samples(b"not audio") is None


def test_gif_multiframe_roundtrip_and_first_frame_compat():
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        decode_gif_frames,
        decode_gif_pixels,
        encode_gif,
    )

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 64, size=(8, 8))] for _ in range(5)]
    g = encode_gif(frames, interlace=True)
    back = decode_gif_frames(g)
    assert back is not None and len(back) == 5
    for a, b in zip(back, frames):
        assert np.array_equal(a, b)
    # first-frame decoder sees frame 0 of an animation
    assert np.array_equal(decode_gif_pixels(g), frames[0])
    # a single ndarray still encodes as a 1-frame stream
    fr = decode_gif_frames(encode_gif(frames[0]))
    assert len(fr) == 1 and np.array_equal(fr[0], frames[0])
    # missing trailer -> None (frame walk must not silently truncate)
    assert decode_gif_frames(g[:-1]) is None
    # mismatched frame shapes refused at encode time
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_gif([frames[0], pal[rng.integers(0, 64, size=(4, 4))]])


def test_png_palette_decode():
    """Color-type-3 (PLTE-indexed) PNG decodes to the palette's RGB."""
    import struct
    import zlib

    import numpy as np

    from mahjong_etl_spark.operators.multimodal import decode_png_pixels

    rng = np.random.default_rng(29)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 7), dtype=np.uint8)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    px = decode_png_pixels(png)
    assert px is not None and px.shape == (6, 7, 3)
    assert np.array_equal(px, pal[idx])
    # index beyond the palette -> refused, not garbage
    bad_idx = idx.copy()
    bad_idx[0, 0] = 200
    raw = b"".join(b"\x00" + bad_idx[y].tobytes() for y in range(6))
    png_bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(png_bad) is None
    # palette stream without PLTE -> refused
    png_noplte = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(png_noplte) is None


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video container
# ---------------------------------------------------------------------------


def test_avi_container_layer_is_lossless():
    """The RIFF walk must hand back exactly the JPEG streams that went
    in: extracted frames == direct JPEG decode of the same bytes."""
    import numpy as np

    from mahjong_etl_spark.operators.jpeg_codec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )
    from mahjong_etl_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(37)
    frames = [
        rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    avi = encode_avi_mjpeg(frames, fps=10, quality=85)
    back = decode_avi_frames(avi)
    assert back is not None and len(back) == 4
    for f, b in zip(frames, back):
        assert np.array_equal(b, decode_jpeg_pixels(encode_jpeg(f, 85)))


def test_avi_decode_never_raises_and_rejects_non_avi():
    import numpy as np

    from mahjong_etl_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(41)
    avi = encode_avi_mjpeg(
        [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)]
    )
    for cut in range(0, len(avi), 37):
        r = decode_avi_frames(avi[:cut])
        assert r is None or isinstance(r, list)
    for i in range(0, len(avi), 53):
        b = bytearray(avi)
        b[i] ^= 0xFF
        r = decode_avi_frames(bytes(b))
        assert r is None or isinstance(r, list)
    assert decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert decode_avi_frames(b"not a container") is None
