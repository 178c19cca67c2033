"""Property-based and frozen-vector contracts for the media codec
plane (round 6): PNG / GIF / WAV roundtrips must be BIT-EXACT for
arbitrary inputs in their subsets, and frozen byte vectors pin the
on-disk format against silent drift in either codec half.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mahjong_etl_spark.operators.multimodal import (
    decode_gif_frames,
    decode_gif_pixels,
    decode_png_pixels,
    decode_wav_samples,
    encode_gif,
    encode_png,
    encode_wav,
)

# Frozen vectors: bytes generated once, now format law.  If either
# codec half drifts (width rule, chunk layout, palette packing, RIFF
# framing), one of these fails even though self-roundtrips still pass.
GIF_2X2 = bytes.fromhex(
    "47494638396102000200f000000a141ec864322c000000000200020000"
    "0203440205003b"
)
GIF_2X2_PX = np.array(
    [[[10, 20, 30], [200, 100, 50]], [[200, 100, 50], [10, 20, 30]]],
    dtype=np.uint8,
)
WAV_5 = bytes.fromhex(
    "524946462e00000057415645666d74201000000001000100401f0000803e"
    "000002001000646174610a0000000000e80318fcff7f0080"
)
WAV_5_SAMPLES = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)


def test_frozen_gif_vector():
    px = decode_gif_pixels(GIF_2X2)
    assert px is not None and np.array_equal(px, GIF_2X2_PX)
    assert encode_gif(GIF_2X2_PX) == GIF_2X2


def test_frozen_wav_vector():
    got = decode_wav_samples(WAV_5)
    assert got is not None
    s, rate, ch = got
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(s, WAV_5_SAMPLES)
    assert encode_wav(WAV_5_SAMPLES, 8000) == WAV_5


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    back = decode_png_pixels(encode_png(px))
    assert back is not None and np.array_equal(back, px)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    ncol=st.integers(1, 64),
    nframes=st.integers(1, 4),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_animation_roundtrip_property(h, w, ncol, nframes, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    frames = [
        pal[rng.integers(0, ncol, size=(h, w))] for _ in range(nframes)
    ]
    back = decode_gif_frames(encode_gif(frames, interlace=interlace))
    assert back is not None and len(back) == nframes
    for a, b in zip(back, frames):
        assert np.array_equal(a, b)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 400),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    v = rng.integers(-32768, 32768, size=n).astype(np.int16)
    got = decode_wav_samples(encode_wav(v, rate))
    assert got is not None
    s, r, ch = got
    assert (r, ch) == (rate, 1)
    assert np.array_equal(s, v)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_error_bound_property(h, w, seed):
    """JPEG is lossy but BOUNDED at high quality: systematic breakage
    (wrong dequant, desynced Huffman, bad IDCT scale) produces errors
    an order of magnitude above quantization noise, so a generous
    ceiling still catches it on arbitrary inputs."""
    from mahjong_etl_spark.operators.jpeg_codec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    back = decode_jpeg_pixels(encode_jpeg(px, 95))
    assert back is not None and back.shape == px.shape
    assert int(np.abs(back.astype(int) - px.astype(int)).max()) <= 64


def test_avi_walker_skips_junk_chunks():
    """Real AVI writers pad with JUNK chunks; the RIFF walk must skip
    any unknown chunk and still find movi."""
    from mahjong_etl_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(43)
    frames = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)]
    avi = bytearray(encode_avi_mjpeg(frames))
    # splice a JUNK chunk between hdrl and movi
    movi_at = avi.find(b"LIST", 12 + 4)  # first LIST is hdrl
    movi_at = avi.find(b"LIST", movi_at + 4)
    junk = b"JUNK" + (6).to_bytes(4, "little") + b"abcdef"
    patched = bytes(avi[:movi_at]) + junk + bytes(avi[movi_at:])
    # fix the RIFF size field
    patched = (
        patched[:4]
        + (len(patched) - 8).to_bytes(4, "little")
        + patched[8:]
    )
    back = decode_avi_frames(patched)
    assert back is not None and len(back) == 1
