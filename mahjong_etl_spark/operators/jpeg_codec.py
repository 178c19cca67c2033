"""Baseline JPEG codec — pure Python + numpy, no imaging library.

The third REAL image codec beside PNG (``multimodal.decode_png_pixels``)
and GIF (``multimodal.decode_gif_pixels``): ITU-T T.81 baseline
sequential DCT, 8-bit, Huffman entropy coding.  The encoder emits
JFIF files with Annex-K-style quantization tables (libjpeg quality
scaling) and standard Huffman tables, at 4:4:4 or 4:2:0 chroma
sampling; the decoder reads ANY baseline file within the honest
subset below — it takes its quantization and Huffman tables from the
file's own DQT/DHT segments, so table fidelity affects only
compression ratio, never correctness, and it implements the general
MCU interleave (spec A.2.3) for sampling factors up to 2x2 with
replication upsampling (4:2:0, 4:2:2, 4:4:0 and 4:4:4 all decode).

Honest subset (everything else returns None, same contract as the
PNG/GIF decoders — callers fall back to the header/arithmetic
ladder):

- baseline sequential (SOF0) only — progressive (SOF2) and the other
  frame types are out of scope;
- 8-bit precision, 1 or 3 components, sampling factors 1..2.

Restart markers (DRI/RSTn) are fully supported on both sides: the
decoder resyncs and resets DC predictors at every interval, the
encoder emits them on request.

JPEG is lossy, so unlike PNG/GIF there is no bit-exact roundtrip: the
pipeline contract is a committed-golden oracle (functions/goldens.py)
plus pytest error bounds and a hand-derivable flat-block interop
vector (a single-DC-coefficient file must decode to the flat level
the spec's IDCT equation gives by hand).
"""

from __future__ import annotations

import numpy as np

# --- zigzag --------------------------------------------------------------
# Generated, not transcribed: diagonal s = i+j walked upward (i
# decreasing) on even s and downward on odd s — the T.81 Figure 5
# pattern — so a typo cannot silently desync encoder and decoder.


def _zigzag() -> np.ndarray:
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        order.extend(ij if s % 2 else ij[::-1])
    return np.array([i * 8 + j for i, j in order], dtype=np.int64)


ZIGZAG = _zigzag()  # natural index for each zigzag position
UNZIGZAG = np.argsort(ZIGZAG)

# --- quantization (Annex K tables, libjpeg quality scaling) --------------

QUANT_LUMA = np.array(
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
    dtype=np.int64,
)

QUANT_CHROMA = np.array(
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
    dtype=np.int64,
)


def scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


# --- Huffman tables (standard layout; embedded in every file) ------------
# (bits-per-length, values) pairs.  The decoder never assumes these —
# it always builds its codes from the file's DHT — so the constants
# only shape OUR encoder's output.

STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)


def _ac_values(first: list[int]) -> list[int]:
    """Standard AC value lists share a regular tail: after the
    table-specific head, the symbols run through each size class 1..10
    for runs 0..15 in the documented order.  Rather than transcribing
    162 bytes from memory, build the canonical ordering and let the
    head pin the table-specific prefix."""
    seen = list(first)
    have = set(seen)
    # remaining symbols in (run, size) column-major spec order
    for run in range(16):
        for size in range(1, 11):
            v = (run << 4) | size
            if v not in have:
                seen.append(v)
                have.add(v)
    for v in (0xF0, 0x00):  # ZRL and EOB if the head missed them
        if v not in have:
            seen.append(v)
            have.add(v)
    return seen


# Heads follow T.81 Tables K.5/K.6; the generated tail keeps the code
# a valid prefix table even if the canonical ordering drifts (the
# decoder reads whatever we wrote).
STD_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
STD_AC_LUMA_HEAD = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72,
]
STD_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
STD_AC_CHROMA_HEAD = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1,
]

STD_AC_LUMA = (STD_AC_LUMA_BITS, _ac_values(STD_AC_LUMA_HEAD)[:162])
STD_AC_CHROMA = (STD_AC_CHROMA_BITS, _ac_values(STD_AC_CHROMA_HEAD)[:162])


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman assignment (T.81
    Annex C): codes of each length count up from twice the previous
    length's end."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# The four standard encoder tables are constants — build their code
# tables once per process instead of once per encode call (r14, guide
# §4.5: heavyweight init hoisted out of the per-record path).  The
# fast form is a 256-slot list indexed by the symbol, holding
# (code << size, code_len + size): since a symbol's magnitude-bit
# count IS its low nibble (or the whole symbol, for DC), the Huffman
# code can be pre-shifted so emission is one shift-or per symbol.
def _fast_enc_table(codes: dict[int, tuple[int, int]]) -> list:
    out: list = [None] * 256
    for sym, (code, ln) in codes.items():
        size = sym & 0x0F
        out[sym] = (code << size, ln + size)
    return out


_STD_CODES: tuple | None = None


def _std_codes() -> tuple:
    global _STD_CODES
    if _STD_CODES is None:
        _STD_CODES = (
            [
                _fast_enc_table(_build_codes(*STD_DC_LUMA)),
                _fast_enc_table(_build_codes(*STD_DC_CHROMA)),
            ],
            [
                _fast_enc_table(_build_codes(*STD_AC_LUMA)),
                _fast_enc_table(_build_codes(*STD_AC_CHROMA)),
            ],
        )
    return _STD_CODES


# DHT bytes -> flat peek-16 decode table.  Every baseline Huffman code
# is <= 16 bits, so a 2^16-entry table indexed by the next 16 bits of
# the stream resolves any symbol in ONE lookup: entry = (length << 8)
# | symbol for every index whose high bits equal the code (prefix
# property — padding bits beyond the code length cannot change the
# match), 0 where no code of any length matches (invalid stream).
# Keyed by the raw DHT payload so repeated images carrying the same
# tables (every file our encoder writes) build it once per process
# (r14, guide §4.5); replaces the bit-at-a-time tree walk that cost
# up to 16 Python-level reads per symbol.
_DEC_LUT_CACHE: dict[bytes, list[int]] = {}


def _build_decode_lut(bits: list[int], vals: list[int] | bytes) -> list[int]:
    key = bytes(bits) + bytes(vals)
    got = _DEC_LUT_CACHE.get(key)
    if got is not None:
        return got
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = (length << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()
    _DEC_LUT_CACHE[key] = out
    return out


# --- DCT -----------------------------------------------------------------

_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            / 2.0
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) coefficients."""
    return _C @ blocks @ _C.T


def _idct(coefs: np.ndarray) -> np.ndarray:
    return _C.T @ coefs @ _C


# --- color ---------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = (px[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --- bit IO --------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        # whole-bytes emission is chunked: one C-level to_bytes plus
        # one C-level replace() performs the byte split and the 0xFF00
        # stuffing the old per-byte Python loop did, bit-identically
        # (stuffing appends 0x00 after EVERY 0xFF, which is exactly
        # what replace does, consecutive 0xFFs included) — r14, the
        # callers now hand whole blocks (~10²-10³ bits) per call
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        nbytes = self.nbits >> 3
        if nbytes:
            self.nbits &= 7
            chunk = (self.acc >> self.nbits).to_bytes(nbytes, "big")
            self.acc &= (1 << self.nbits) - 1
            self.out += chunk.replace(b"\xff", b"\xff\x00")

    def pad_align(self) -> None:
        """Pad to a byte boundary with 1s (spec F.1.2.3) — the state
        markers (RSTn) must land on."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, m: int) -> None:
        """Emit a raw marker into the entropy stream (RSTn) — markers
        are never byte-stuffed."""
        self.pad_align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.out)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at any other
    marker.  Raises _Corrupt past the end (decode returns None)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.done = False

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise _Corrupt
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker terminates the entropy segment
                self.done = True
                raise _Corrupt
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise _Corrupt

    def peek_symbol(self, lut: list[int]) -> int:
        """One-lookup Huffman decode against a ``_build_decode_lut``
        table: peek (up to) the next 16 bits, resolve (length,
        symbol), consume ``length`` bits.  Identical accept/reject
        behavior to the bit-at-a-time ``read_symbol``: near the
        segment end the peek is padded (prefix property — pad bits
        can never alter which code the REAL bits match), and a match
        longer than the real bits remaining raises exactly where the
        old per-bit read would have (r14, guide §4.2)."""
        nbits = self.nbits
        while nbits < 16 and not self.done:
            if self.pos >= len(self.data):
                self.done = True
                break
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else None
                )
                if nxt == 0x00:
                    self.pos += 2
                else:  # marker: no more real bits in this segment
                    self.done = True
                    break
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            nbits += 8
        if nbits >= 16:
            entry = lut[(self.acc >> (nbits - 16)) & 0xFFFF]
        else:
            pad = 16 - nbits
            entry = lut[((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF]
        length = entry >> 8
        if length == 0 or length > nbits:
            raise _Corrupt
        nbits -= length
        self.nbits = nbits
        self.acc &= (1 << nbits) - 1
        return entry & 0xFF

    def restart(self, n: int) -> None:
        """Consume an RSTn marker at the next byte boundary (leftover
        buffered bits are the encoder's 1-padding — reads always leave
        <8 bits, so ``pos`` already sits on the marker).  ``done`` is
        cleared: peek_symbol sets it as a NORMAL state on reaching the
        marker (unlike _fill, which raises), and entropy data resumes
        right after the marker."""
        self.acc = 0
        self.nbits = 0
        self.done = False
        d = self.data
        if (
            self.pos + 2 > len(d)
            or d[self.pos] != 0xFF
            or d[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise _Corrupt
        self.pos += 2


class _Corrupt(Exception):
    pass


def _extend(val: int, size: int) -> int:
    """T.81 EXTEND: map the raw magnitude bits to a signed value."""
    if size == 0:
        return 0
    return val if val >= (1 << (size - 1)) else val - (1 << size) + 1


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


# --- encoder -------------------------------------------------------------


def encode_jpeg(
    px: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) / (h, w, 1) grayscale -> baseline
    JFIF bytes.  ``subsample`` picks the chroma layout: "444" (every
    component full resolution, 1x1 factors) or "420" (Y at 2x2,
    chroma 2x2-mean-downsampled at 1x1 — the common photographic
    layout, exercising the decoder's general MCU interleave).
    ``restart_interval`` > 0 emits a DRI segment and an RST0-7 marker
    after every that-many MCUs (DC predictors reset) — the resync
    structure streaming decoders rely on."""
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[..., 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        factors = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., i] for i in range(3)]
        if subsample == "420":
            factors = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            factors = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsample layout: {subsample}")

    qluma = scaled_quant(QUANT_LUMA, quality)
    qchroma = scaled_quant(QUANT_CHROMA, quality)
    qtabs = [qluma] if gray else [qluma, qchroma]

    hmax = max(hs for hs, _ in factors)
    vmax = max(vs for _, vs in factors)
    mrows = (h + 8 * vmax - 1) // (8 * vmax)
    mcols = (w + 8 * hmax - 1) // (8 * hmax)
    # pad every full-res plane to the MCU grid by edge replication,
    # then mean-pool the subsampled components
    ph, pw = mrows * vmax * 8, mcols * hmax * 8

    comp_coefs = []
    for ci, plane in enumerate(planes):
        hs, vs = factors[ci]
        q = qtabs[min(ci, len(qtabs) - 1)]
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        fy, fx = vmax // vs, hmax // hs
        if fy > 1 or fx > 1:
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        p = p - 128.0
        cbh, cbw = p.shape[0] // 8, p.shape[1] // 8
        blocks = (
            p.reshape(cbh, 8, cbw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = _fdct(blocks)
        quant = np.round(coefs / q).astype(np.int64)
        # zigzag once per plane (vectorized) instead of per block; the
        # nonzero positions drive the AC loop below so the Python-level
        # work per block is proportional to the (few) surviving
        # coefficients, not all 63 (r14, guide §4.2)
        comp_coefs.append(quant.reshape(cbh, cbw, 64)[:, :, ZIGZAG])

    dc_codes, ac_codes = _std_codes()

    bw_out = _BitWriter()
    bw_write = bw_out.write
    prev_dc = [0] * len(planes)

    def emit_block(ci: int, by: int, bx: int) -> None:
        # the whole block's bit string is packed into one local
        # (acc, nbits) accumulator — pure int shifts, no per-symbol
        # method call — and flushed with ONE BitWriter.write: the
        # MSB-first concatenation is associative, so the emitted
        # stream is bit-identical to the old per-symbol writes
        t = min(ci, 1)
        zz = comp_coefs[ci][by, bx]
        dc = int(zz[0])
        diff = dc - prev_dc[ci]
        prev_dc[ci] = dc
        size = abs(diff).bit_length()
        pre, tot = dc_codes[t][size]
        v = 0 if size == 0 else (diff if diff >= 0 else diff + (1 << size) - 1)
        acc = pre | v
        nbits = tot
        act = ac_codes[t]
        zrl_pre, zrl_len = act[0xF0]
        nz = np.nonzero(zz)[0]
        prev_k = 0
        for k, v in zip(nz.tolist(), zz[nz].tolist()):
            if k == 0:
                continue
            run = k - prev_k - 1
            prev_k = k
            while run > 15:
                acc = (acc << zrl_len) | zrl_pre  # ZRL
                nbits += zrl_len
                run -= 16
            size = abs(v).bit_length()
            pre, tot = act[(run << 4) | size]
            bits = v if v >= 0 else v + (1 << size) - 1
            acc = (acc << tot) | pre | bits
            nbits += tot
        if prev_k != 63:
            pre, tot = act[0x00]  # EOB
            acc = (acc << tot) | pre
            nbits += tot
        bw_write(acc, nbits)

    mcu_n = 0
    rst_n = 0
    for my in range(mrows):
        for mx in range(mcols):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw_out.marker(0xD0 + rst_n)
                rst_n = (rst_n + 1) & 7
                prev_dc = [0] * len(planes)
            mcu_n += 1
            for ci in range(len(planes)):
                hs, vs = factors[ci]
                for bv in range(vs):
                    for bu in range(hs):
                        emit_block(ci, my * vs + bv, mx * hs + bu)
    data = bw_out.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        out += seg(
            0xDB,
            bytes([ti]) + q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes(),
        )
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = factors[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, len(qtabs) - 1)])
    out += seg(0xC0, sof)
    huffs = [(0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)]
    if not gray:
        huffs += [(0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)]
    for tc, (bits, vals) in huffs:
        out += seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -------------------------------------------------------------


def decode_jpeg_pixels(payload: bytes):
    """Baseline JPEG -> (h, w, 3) or (h, w, 1) uint8, or None outside
    the honest subset / on any malformed input (never raises)."""
    try:
        return _decode(payload)
    except (
        _Corrupt,
        IndexError,
        KeyError,
        OverflowError,
        ValueError,
        ZeroDivisionError,
    ):
        return None


def _decode(payload: bytes):
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list[int]] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            return None
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:  # 16-bit tables out of subset
                    return None
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(body, np.uint8, 64, i + 1)
                qtabs[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) != nv:
                    return None
                huff[(tc, th)] = _build_decode_lut(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = (
                body[0],
                int.from_bytes(body[1:3], "big"),
                int.from_bytes(body[3:5], "big"),
                body[5],
            )
            if prec != 8 or nc not in (1, 3) or not fh or not fw:
                return None
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = samp >> 4, samp & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    return None  # 4x factors out of subset
                comps.append((cid, tq, hs, vs))
            frame = (fh, fw, comps)
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive/extended frames out of subset
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            if len(body) != 2:
                return None
            restart_interval = int.from_bytes(body, "big")
        elif marker == 0xDA:  # SOS: entropy decode
            if frame is None:
                return None
            fh, fw, comps = frame
            if len(comps) == 1:
                # T.81 A.2: a single-component scan is NON-interleaved
                # — one data unit per MCU, raster over ceil(w/8) x
                # ceil(h/8) — REGARDLESS of the declared sampling
                # factors (those only position a component against the
                # others).  Normalizing to 1x1 reproduces that order
                # exactly: a lone component's plane is full-resolution
                # (h_i == h_max by definition), so a foreign grayscale
                # file declaring 2x2 decodes identically to 1x1
                # instead of silently garbling through the interleaved
                # MCU loop below (r6 advice).
                cid, tq, _, _ = comps[0]
                comps = [(cid, tq, 1, 1)]
            ns = body[0]
            if ns != len(comps):
                return None
            sel = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                sel.append((tt >> 4, tt & 0x0F))
            hmax = max(hs for _, _, hs, _ in comps)
            vmax = max(vs for _, _, _, vs in comps)
            # MCU grid (spec A.2.3): each MCU holds hs x vs blocks of
            # every component, raster order, components interleaved.
            mrows = (fh + 8 * vmax - 1) // (8 * vmax)
            mcols = (fw + 8 * hmax - 1) // (8 * hmax)
            prev_dc = [0] * len(comps)
            # per-component table set hoisted out of the MCU loop (it
            # is loop-invariant; missing tables returned None on the
            # first MCU before, so checking up front is identical),
            # and one zigzag-coefficient row buffer per data unit so
            # dequantization + IDCT run BATCHED per component after
            # entropy decode (r14, guide §4.2: thousands of 8x8
            # matmuls and 64-element scatters collapse into a few
            # whole-plane numpy ops; same per-block arithmetic).
            tabs = []
            for ci, (cid, tq, hs, vs) in enumerate(comps):
                dct_t = huff.get((0, sel[ci][0]))
                act = huff.get((1, sel[ci][1]))
                q = qtabs.get(tq)
                if dct_t is None or act is None or q is None:
                    return None
                tabs.append((dct_t, act))
            coef_zz = [
                np.zeros((mrows * mcols * hs * vs, 64), dtype=np.int64)
                for _, _, hs, vs in comps
            ]
            # Entropy area pre-split into restart segments at C speed:
            # each segment is the byte run up to the next real marker
            # (anything but stuffed FF00), unstuffed with ONE
            # bytes.replace.  The old _BitReader walked the same bytes
            # one at a time in Python, re-testing for 0xFF per byte;
            # the bit-level read order and every accept/reject outcome
            # are unchanged (r14, guide §4.2).  term records the
            # marker byte that cut the segment (None = ran off the
            # end), so the restart check below can verify RSTn order
            # exactly as _BitReader.restart did.
            start = pos + 2 + seg_len
            ndata = len(payload)
            segs = []
            p0 = start
            while True:
                q = p0
                term = None
                end = ndata
                while True:
                    f = payload.find(b"\xff", q)
                    if f == -1:
                        break
                    if f + 1 >= ndata:
                        end = f
                        break
                    nxt = payload[f + 1]
                    if nxt == 0x00:
                        q = f + 2
                        continue
                    end = f
                    term = nxt
                    break
                segs.append(
                    (payload[p0:end].replace(b"\xff\x00", b"\xff"), term)
                )
                if term is not None and 0xD0 <= term <= 0xD7:
                    p0 = end + 2
                else:
                    break
            # decode schedule: per MCU, each component's vs*hs data
            # units in raster order (loop-invariant, hoisted)
            sched = []
            for ci, (cid, tq, hs, vs) in enumerate(comps):
                for _ in range(vs * hs):
                    sched.append((ci, tabs[ci][0], tabs[ci][1], coef_zz[ci]))
            nseen = [0] * len(comps)
            seg_i = 0
            seg, seg_term = segs[0]
            nseg = len(seg)
            spos = 0
            acc = 0
            nbits = 0
            rst_n = 0
            for mcu_n in range(mrows * mcols):
                if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                    # only the encoder's pad bits (<8) may remain, the
                    # cutting marker must be the expected RSTn, and
                    # decoding resumes in the next segment — the same
                    # three checks _BitReader.restart performed
                    if (
                        (nseg - spos) * 8 + nbits >= 8
                        or seg_term != 0xD0 + (rst_n & 7)
                    ):
                        raise _Corrupt
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise _Corrupt
                    seg, seg_term = segs[seg_i]
                    nseg = len(seg)
                    spos = 0
                    acc = 0
                    nbits = 0
                    rst_n = (rst_n + 1) & 7
                    prev_dc = [0] * len(comps)
                for ci, dct_t, act, rows in sched:
                    row = rows[nseen[ci]]
                    nseen[ci] += 1
                    # --- DC: one LUT lookup + magnitude bits ---
                    while nbits < 32 and spos < nseg:
                        acc = (acc << 8) | seg[spos]
                        spos += 1
                        nbits += 8
                    if nbits >= 16:
                        entry = dct_t[(acc >> (nbits - 16)) & 0xFFFF]
                    else:
                        pad = 16 - nbits
                        entry = dct_t[((acc << pad) | ((1 << pad) - 1)) & 0xFFFF]
                    ln = entry >> 8
                    if ln == 0 or ln > nbits:
                        raise _Corrupt
                    nbits -= ln
                    acc &= (1 << nbits) - 1
                    size = entry & 0xFF
                    if size > 15:  # baseline DC categories stop at 11
                        raise _Corrupt
                    if size:
                        while nbits < size:
                            if spos >= nseg:
                                raise _Corrupt
                            acc = (acc << 8) | seg[spos]
                            spos += 1
                            nbits += 8
                        nbits -= size
                        v = (acc >> nbits) & ((1 << size) - 1)
                        acc &= (1 << nbits) - 1
                        dcv = (
                            v
                            if v >= (1 << (size - 1))
                            else v - (1 << size) + 1
                        ) + prev_dc[ci]
                    else:
                        dcv = prev_dc[ci]
                    prev_dc[ci] = dcv
                    row[0] = dcv
                    # --- AC run-length loop ---
                    k = 1
                    while k < 64:
                        while nbits < 32 and spos < nseg:
                            acc = (acc << 8) | seg[spos]
                            spos += 1
                            nbits += 8
                        if nbits >= 16:
                            entry = act[(acc >> (nbits - 16)) & 0xFFFF]
                        else:
                            pad = 16 - nbits
                            entry = act[
                                ((acc << pad) | ((1 << pad) - 1)) & 0xFFFF
                            ]
                        ln = entry >> 8
                        if ln == 0 or ln > nbits:
                            raise _Corrupt
                        nbits -= ln
                        acc &= (1 << nbits) - 1
                        sym = entry & 0xFF
                        if sym == 0x00:  # EOB
                            break
                        size = sym & 0x0F
                        if size == 0:
                            if (sym >> 4) != 15:
                                raise _Corrupt
                            k += 16  # ZRL
                            continue
                        k += sym >> 4
                        if k > 63:
                            raise _Corrupt
                        while nbits < size:
                            if spos >= nseg:
                                raise _Corrupt
                            acc = (acc << 8) | seg[spos]
                            spos += 1
                            nbits += 8
                        nbits -= size
                        v = (acc >> nbits) & ((1 << size) - 1)
                        acc &= (1 << nbits) - 1
                        row[k] = (
                            v
                            if v >= (1 << (size - 1))
                            else v - (1 << size) + 1
                        )
                        k += 1
            # batched dequantize -> unzigzag -> IDCT -> plane assembly
            # (block order in coef_zz is (my, mx, bv, bu) raster —
            # exactly the positions the per-block loop wrote)
            planes = []
            for ci, (cid, tq, hs, vs) in enumerate(comps):
                qzig = qtabs[tq].reshape(64)[ZIGZAG]
                deq = np.zeros((mrows * mcols * hs * vs, 64), dtype=np.float64)
                deq[:, ZIGZAG] = coef_zz[ci] * qzig
                blocks = _idct(deq.reshape(-1, 8, 8)) + 128.0
                planes.append(
                    blocks.reshape(mrows, mcols, vs, hs, 8, 8)
                    .transpose(0, 2, 4, 1, 3, 5)
                    .reshape(mrows * vs * 8, mcols * hs * 8)
                )
            # upsample subsampled components to full resolution by
            # sample replication, then crop to the frame
            full = []
            for p, (_, _, hs, vs) in zip(planes, comps):
                if hs < hmax:
                    p = np.repeat(p, hmax // hs, axis=1)
                if vs < vmax:
                    p = np.repeat(p, vmax // vs, axis=0)
                full.append(p[:fh, :fw])
            if len(comps) == 1:
                out = np.clip(np.round(full[0]), 0, 255)
                return out.astype(np.uint8)[..., None]
            ycc = np.stack(full, axis=-1)
            return _ycbcr_to_rgb(ycc)
        pos += 2 + seg_len
    return None
