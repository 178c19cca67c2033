"""Baseline JPEG codec contracts (operators/jpeg_codec.py).

JPEG is lossy, so the driver-facing roundtrip query rides a committed
golden — the contracts that regeneration can never weaken live HERE:
the hand-built spec interop vector, flat-block exactness, error
bounds, structural table sanity, and never-raise fuzz.
"""

from __future__ import annotations

import numpy as np
import pytest

from mahjong_etl_spark.operators.jpeg_codec import (
    STD_AC_CHROMA,
    STD_AC_LUMA,
    STD_DC_CHROMA,
    STD_DC_LUMA,
    ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg,
)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def test_zigzag_is_canonical_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # T.81 Figure 5 prefix
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-3:].tolist() == [55, 62, 63]


def test_huffman_tables_are_valid_prefix_codes():
    for bits, vals in (STD_DC_LUMA, STD_DC_CHROMA, STD_AC_LUMA, STD_AC_CHROMA):
        assert sum(bits) == len(vals) == len(set(vals))
        # Kraft sum of a complete-or-under prefix code never exceeds 1
        kraft = sum(n / (1 << (ln + 1)) for ln, n in enumerate(bits))
        assert kraft <= 1.0
    assert len(STD_AC_LUMA[1]) == 162 and len(STD_AC_CHROMA[1]) == 162


def test_hand_built_spec_vector_decodes_to_flat_130():
    """Interop evidence independent of our encoder: a minimal baseline
    file built byte-by-byte from T.81 — 8x8 grayscale, all-ones quant
    table, single DC coefficient 16, no AC.  The spec IDCT gives
    pixel = 16 · (√½/2)² + 128 = 130 everywhere; any desync in marker
    parsing, canonical Huffman assignment, EXTEND, dequant or the IDCT
    normalization breaks this."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(
        0xC0,
        bytes([8])
        + (8).to_bytes(2, "big")
        + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    # DC table 0: one 1-bit code "0" -> size category 5
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([5]))
    # AC table 0: one 1-bit code "0" -> EOB
    dht_ac = _seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0x00, 0x3F, 0x00]))
    # bits: DC huff "0", magnitude "10000" (=16), EOB "0", pad "1"
    data = bytes([0b01000001])
    j = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + data + b"\xff\xd9"
    px = decode_jpeg_pixels(j)
    assert px is not None and px.shape == (8, 8, 1)
    assert (px == 130).all()


def test_flat_images_roundtrip_exactly():
    for level in (0, 64, 128, 200, 255):
        px = np.full((16, 24, 3), level, dtype=np.uint8)
        back = decode_jpeg_pixels(encode_jpeg(px, 85))
        assert back is not None
        assert int(np.abs(back.astype(int) - px.astype(int)).max()) <= 1


def test_smooth_gradient_error_small():
    i = np.arange(32)
    base = (np.add.outer(i * 2, i * 3) % 256).astype(np.uint8)
    px = np.stack([base, base, base], axis=-1)
    back = decode_jpeg_pixels(encode_jpeg(px, 90))
    assert back is not None and back.shape == px.shape
    err = np.abs(back.astype(int) - px.astype(int))
    assert err.max() <= 40  # wrap edges ring; interiors stay tight
    assert err.mean() <= 4.0


def test_quality_monotonically_tightens_error():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    errs = []
    for q in (30, 60, 95):
        back = decode_jpeg_pixels(encode_jpeg(px, q))
        assert back is not None and back.shape == (24, 17, 3)
        errs.append(float(np.abs(back.astype(int) - px.astype(int)).mean()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] <= 5.0


def test_grayscale_and_odd_dims():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    back = decode_jpeg_pixels(encode_jpeg(g, 90))
    assert back is not None and back.shape == (9, 11, 1)
    assert np.abs(back[..., 0].astype(int) - g.astype(int)).max() <= 16


def test_encode_decode_deterministic():
    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    a, b = encode_jpeg(px, 85), encode_jpeg(px, 85)
    assert a == b
    da, db = decode_jpeg_pixels(a), decode_jpeg_pixels(b)
    assert np.array_equal(da, db)


def test_decode_never_raises_on_garbage():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    j = encode_jpeg(px, 85)
    for cut in range(0, len(j), 19):
        r = decode_jpeg_pixels(j[:cut])
        assert r is None or r.ndim == 3
    for i in range(0, len(j), 13):
        b = bytearray(j)
        b[i] ^= 0xFF
        r = decode_jpeg_pixels(bytes(b))
        assert r is None or r.ndim == 3
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_pixels(b"not a jpeg") is None


def test_grayscale_foreign_sampling_factors_non_interleaved():
    """T.81 A.2: a single-component scan is non-interleaved — declared
    sampling factors are irrelevant (they only position a component
    against others).  A foreign grayscale baseline file declaring 2x2
    (or 2x1) factors must decode IDENTICALLY to the 1x1 encoding: the
    entropy stream of a lone component is the same raster of
    ceil(w/8) x ceil(h/8) data units either way.  MCU-aligned dims
    (32x16) are the case the old interleaved loop silently garbled
    (r6 advice)."""
    rng = np.random.default_rng(44)
    g = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    j = encode_jpeg(g, 90)
    base = decode_jpeg_pixels(j)
    assert base is not None and base.shape == (16, 32, 1)
    i = j.find(b"\xff\xc0")
    # SOF0 layout: FFC0 len(2) prec(1) h(2) w(2) nc(1) [cid samp tq]
    assert j[i + 11] == 0x11  # our encoder always emits 1x1 grayscale
    for samp in (0x22, 0x21, 0x12):
        patched = bytearray(j)
        patched[i + 11] = samp
        back = decode_jpeg_pixels(bytes(patched))
        assert back is not None, f"samp={samp:#x} refused"
        assert np.array_equal(back, base), f"samp={samp:#x} garbled"


def test_out_of_subset_returns_none():
    px = np.full((8, 8, 3), 100, dtype=np.uint8)
    j = bytearray(encode_jpeg(px, 85))
    # flip SOF0 -> SOF2 (progressive): must refuse, not misdecode
    i = j.find(b"\xff\xc0")
    j[i + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(j)) is None


def test_pixel_stats_cover_jpeg_payloads(spark):
    from mahjong_etl_spark.operators.multimodal import extract_pixel_stats

    px = np.full((8, 8, 3), 77, dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_jpeg(px, 85))),
        (2, "image", bytearray(b"plain text payload")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r.media_id: r for r in extract_pixel_stats(media).collect()}
    assert set(got) == {1}
    r = got[1]
    assert (r.px_h, r.px_w, r.channels) == (8, 8, 3)
    assert abs(r.px_mean_milli - 77000) <= 1000  # lossy, near-flat


def test_roundtrip_query_error_contract(spark):
    """The contract the committed golden cannot weaken: every document
    decodes with bounded reconstruction error."""
    from mahjong_etl_spark.plans.registry import registry

    df = registry()["multimodal_jpeg_roundtrip"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    pdf = df.toPandas()
    assert len(pdf) == 500
    assert int(pdf.max_abs_err.max()) <= 64  # mod-ramp wrap edges ring
    assert (pdf.n_bytes > 0).all()
    assert pdf.px_min.min() >= 0 and pdf.px_max.max() <= 255


def test_420_subsampling_roundtrip_and_size_win():
    """4:2:0 exercises the general MCU interleave (4 Y + Cb + Cr per
    MCU) and the replication upsampler: smooth content must come back
    with small error and a smaller file than 4:4:4."""
    i = np.arange(32)
    base = np.add.outer(i * 3, i * 2) % 200 + 20
    px = np.stack([base, base // 2 + 30, 255 - base], axis=-1).astype(
        np.uint8
    )
    e420 = encode_jpeg(px, 90, subsample="420")
    e444 = encode_jpeg(px, 90, subsample="444")
    assert len(e420) < len(e444)
    back = decode_jpeg_pixels(e420)
    assert back is not None and back.shape == px.shape
    err = np.abs(back.astype(int) - px.astype(int))
    assert err.max() <= 20 and err.mean() <= 3.0
    # flat content survives subsampling exactly
    flat = np.full((16, 16, 3), 99, dtype=np.uint8)
    bf = decode_jpeg_pixels(encode_jpeg(flat, 85, subsample="420"))
    assert int(np.abs(bf.astype(int) - flat.astype(int)).max()) <= 1


def test_420_odd_dims_mcu_padding():
    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    back = decode_jpeg_pixels(encode_jpeg(px, 85, subsample="420"))
    assert back is not None and back.shape == (19, 21, 3)
    # luma survives tightly even when noise chroma is averaged away
    import mahjong_etl_spark.operators.jpeg_codec as J

    y_src = J._rgb_to_ycbcr(px)[..., 0]
    y_back = J._rgb_to_ycbcr(back)[..., 0]
    assert float(np.abs(y_back - y_src).mean()) < 12.0


def test_unknown_subsample_layout_rejected():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg(px, 85, subsample="422")


def test_restart_markers_roundtrip_and_resync():
    """DRI/RSTn: every interval the encoder byte-aligns, emits the
    cycling RST marker and resets DC prediction; the decoder must
    resync to the SAME pixels as the marker-free stream, and refuse a
    broken marker sequence."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    base = decode_jpeg_pixels(encode_jpeg(px, 90))
    for ri in (1, 2, 3, 7):
        jr = encode_jpeg(px, 90, restart_interval=ri)
        assert b"\xff\xdd" in jr and b"\xff\xd0" in jr
        assert np.array_equal(decode_jpeg_pixels(jr), base)
    # restarts compose with 4:2:0 MCU geometry
    j420 = encode_jpeg(px, 90, subsample="420", restart_interval=2)
    assert np.array_equal(
        decode_jpeg_pixels(j420),
        decode_jpeg_pixels(encode_jpeg(px, 90, subsample="420")),
    )
    # an out-of-sequence RST marker must refuse, not desync silently
    jr = bytearray(encode_jpeg(px, 90, restart_interval=2))
    i = jr.find(b"\xff\xd0")
    jr[i + 1] = 0xD5
    assert decode_jpeg_pixels(bytes(jr)) is None
