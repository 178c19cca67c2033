"""Property-based codec invariants (SURVEY §5 item 3) — hypothesis
over the pure functions, no Spark session needed.

decode_meld is exercised over CONSTRUCTIVELY valid Tenhou meld words
(the bitfield grammar from reference scrape.py:262-352): like the
reference, the decoder is undefined on garbage bit patterns — real
logs never produce them — so totality is asserted per word class,
not over all 16-bit ints.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from mahjong_etl_spark.functions.codec import (
    decode_meld,
    next_dora,
    pack_meld,
    render_tiles,
)

tile_ids = st.integers(min_value=0, max_value=135)


@given(tile_ids)
def test_next_dora_stays_in_tile_space(t):
    d = next_dora(t)
    assert 0 <= d <= 135
    # suit is preserved and so is the copy index
    assert d // 36 == t // 36
    assert d % 4 == t % 4


@settings(max_examples=200)
@given(tile_ids)
def test_next_dora_is_a_bijection_within_suit(t):
    """Every dora cycle closes: applying next_dora suit-size times
    returns to the start (9 ranks for number suits; winds cycle in 4,
    dragons in 3)."""
    suit, rank = t // 36, (t % 36) // 4
    if suit < 3:
        period = 9
    elif rank < 4:
        period = 4
    else:
        period = 3
    cur = t
    for _ in range(period):
        cur = next_dora(cur)
    assert cur == t


def test_next_dora_full_bijection():
    assert sorted(next_dora(t) for t in range(136)) == list(range(136))


@given(st.lists(tile_ids, min_size=1, max_size=14), st.booleans())
def test_render_tiles_roundtrip_multiset(ids, has_aka):
    """The rendered string parses back to the same tile multiset at
    (suit, rank-digit) granularity — suit letter once per run, digits
    ascending within it, aka five rendered as 0."""
    s = render_tiles(ids, has_aka)
    assert re.fullmatch(r"([mpsz][0-9]+)+", s), s
    parsed = []
    for suit, digits in re.findall(r"([mpsz])([0-9]+)", s):
        for ch in digits:
            parsed.append((suit, int(ch)))
    expected = []
    for t in sorted(ids):
        suit, rank, copy = t // 36, (t % 36) // 4, t % 4
        digit = rank + 1
        if has_aka and suit < 3 and rank == 4 and copy == 0:
            digit = 0  # red five
        expected.append(("mpsz"[suit], digit))
    assert sorted(parsed) == sorted(expected)


@given(
    st.integers(0, 255),
    st.integers(0, 255),
    st.integers(0, 255),
    st.sampled_from([0, 1, 2, 4, 5, 6]),
    st.integers(0, 3),
    st.integers(0, 7),
)
def test_pack_meld_fields_recoverable(p0, p1, p2, mtype, by, index):
    w = pack_meld(p0, p1, p2, mtype, by, index)
    assert w & 0xFF == p0
    assert (w >> 8) & 0xFF == p1
    assert (w >> 16) & 0xFF == p2
    assert (w >> 24) & 0x7 == mtype
    assert (w >> 27) & 0x3 == by
    assert 0 <= w < 2**32


# --- constructive meld-word strategies (the valid Tenhou grammar) ---

chi_words = st.builds(
    lambda frm, c0, c1, c2, base, pos: frm
    | 0x4
    | (c0 << 3)
    | (c1 << 5)
    | (c2 << 7)
    | ((base * 3 + pos) << 10),
    st.integers(0, 3),
    st.integers(0, 3),
    st.integers(0, 3),
    st.integers(0, 3),
    st.integers(0, 20),  # suit 0-2 x low-rank 0-6
    st.integers(0, 2),
)

pon_words = st.builds(
    lambda frm, unused, base, pos: frm | 0x8 | (unused << 5) | ((base * 3 + pos) << 9),
    st.integers(0, 3),
    st.integers(0, 3),
    st.integers(0, 33),  # suit*9 + (rank-1)
    st.integers(0, 2),
)

addkan_words = st.builds(
    lambda frm, copy, base, pos: frm | 0x10 | (copy << 5) | ((base * 3 + pos) << 9),
    st.integers(0, 3),
    st.integers(0, 3),
    st.integers(0, 33),
    st.integers(0, 2),
)

bigkan_words = st.builds(
    lambda frm, base, pos: frm | ((base * 4 + pos) << 8),
    st.integers(0, 3),
    st.integers(0, 33),
    st.integers(0, 3),
)

nuki_words = st.builds(lambda frm: frm | 0x20, st.integers(0, 3))


@settings(max_examples=300)
@given(
    st.one_of(chi_words, pon_words, addkan_words, bigkan_words, nuki_words),
    st.booleans(),
    st.booleans(),
)
def test_decode_meld_total_on_valid_words(m, has_aka, compat):
    out = decode_meld(m, has_aka, compat)
    if m & 0x3C == 0x20:  # nuki-dora: explicitly not a meld
        assert out is None
        return
    pais, action, packed = out
    expected_action = "tii" if m & 0x4 else ("pon" if m & 0x8 else "kan")
    assert action == expected_action
    assert re.fullmatch(r"[mpsz][0-9+=\-]+", pais), pais
    assert 0 <= packed < 2**32


@given(st.one_of(chi_words, pon_words, addkan_words, bigkan_words), st.booleans())
def test_decode_meld_action_independent_of_compat(m, has_aka):
    """compat only changes member tile IDS, never the action class or
    the display string."""
    a = decode_meld(m, has_aka, True)
    b = decode_meld(m, has_aka, False)
    assert a[0] == b[0] and a[1] == b[1]
