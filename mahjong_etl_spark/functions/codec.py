"""Pure tile / meld codec functions (no Spark dependency).

Semantics match the reference implementation bit-for-bit under
``compat=True`` (the default used by the parser), including its two
documented quirks (see QUIRKS below).  All behavior derived from the
reference at /root/reference:

- tile id encoding: suit = id//36, rank = (id%36)//4, copy = id%4
  (reference scrape.py:219-221, 247-252)
- red five ("aka"): copy 0 of rank 5 in suits m/p/s renders as digit 0
  when the game has aka (reference scrape.py:252-253)
- dora derivation wraps 9->1 in number suits, E->S->W->N->E for winds
  and haku->hatsu->chun->haku for dragons (reference scrape.py:216-235)
- packed meld word layout p0|p1<<8|p2<<16|type<<24|by<<27|index<<29
  (reference scrape.py:212-213)
- Tenhou meld bitfield decode (reference scrape.py:262-352)

QUIRKS reproduced under compat=True (reference bugs kept because
stored output parity is the correctness contract; compat=False applies
the documented fix):

1. Meld tile-id precedence: the reference computes chi/pon member ids
   as ``base << 2 + copy`` which Python parses as ``base << (2+copy)``
   (reference scrape.py:292, 316), and uses the 1-based rank in
   ``base``.  compat=False computes the true tile id
   ``(suit*9 + rank0) * 4 + copy``.
(Quirk 2, the discard-tile rendering bug, lives in the parser.)
"""

from __future__ import annotations

MELD_NONE = 0
MELD_RIICHI = 1
MELD_ANKAN = 2
MELD_TII = 4
MELD_PON = 5
MELD_MINKAN = 6

_SUIT_LETTERS = "mpsz"
_CLAIM_MARKS = ("", "+", "=", "-")  # from: self, shimocha, toimen, kamicha

# Tenhou yaku-id -> name; index 36 is the blank separator before the
# yakuman block (reference scrape.py:137-193).
YAKU_NAMES = [
    "門前清自摸和", "立直", "一発", "槍槓", "嶺上開花", "海底摸月",
    "河底撈魚", "平和", "断幺九", "一盃口", "自風 東", "自風 南",
    "自風 西", "自風 北", "場風 東", "場風 南", "場風 西", "場風 北",
    "役牌 白", "役牌 發", "役牌 中", "両立直", "七対子", "混全帯幺九",
    "一気通貫", "三色同順", "三色同刻", "三槓子", "対々和", "三暗刻",
    "小三元", "混老頭", "二盃口", "純全帯幺九", "混一色", "清一色",
    "", "天和", "地和", "大三元", "四暗刻", "四暗刻単騎", "字一色",
    "緑一色", "清老頭", "九蓮宝燈", "純正九蓮宝燈", "国士無双",
    "国士無双１３面", "大四喜", "小四喜", "四槓子", "ドラ", "裏ドラ",
    "赤ドラ",
]

# abortive-draw type code -> display name (reference scrape.py:195-202)
DRAW_NAMES = {
    "nm": "流し満貫",
    "yao9": "九種九牌",
    "kaze4": "四風連打",
    "reach4": "四家立直",
    "ron3": "三家和了",
    "kan4": "四槓散了",
}
DRAW_DEFAULT = "流局"


def pack_meld(p0: int, p1: int, p2: int, meld_type: int, by: int, index: int) -> int:
    """Pack meld members + metadata into the reference's uint32 word."""
    return p0 | (p1 << 8) | (p2 << 16) | (meld_type << 24) | (by << 27) | (index << 29)


def next_dora(indicator: int) -> int:
    """Indicator tile -> actual dora tile (copy index preserved)."""
    suit, rank, copy = indicator // 36, (indicator % 36) // 4, indicator % 4
    if suit == 3:
        rank += 1
        if rank == 4:  # winds wrap N -> E
            rank = 0
        elif rank == 7:  # dragons wrap chun -> haku
            rank = 4
    else:
        rank += 1
        if rank >= 9:
            rank = 0
    return suit * 36 + rank * 4 + copy


def next_dora_list(indicators: list[int]) -> list[int]:
    return [next_dora(x) for x in indicators]


def _build_single_table(has_aka: bool) -> list[str]:
    out = []
    for t in range(136):
        letter = _SUIT_LETTERS[t // 36]
        digit = (t % 36) // 4 + 1
        if has_aka and letter != "z" and digit == 5 and t % 4 == 0:
            digit = 0
        out.append(letter + str(digit))
    return out


# single-tile render strings, precomputed per aka mode: the parser
# renders one tile per draw/discard action (the overwhelming majority
# of render_tiles calls — ~435 per game), so this lookup removes the
# sort/branch/join per action (~30% of total parse CPU measured)
_SINGLE_RENDER = {False: _build_single_table(False), True: _build_single_table(True)}


def single_render_table(has_aka: bool) -> list[str]:
    """The 136-entry single-tile render table for ``has_aka`` — bound
    once per game by the parser's draw/discard hot loop."""
    return _SINGLE_RENDER[has_aka]


def render_tiles(tile_ids: list[int], has_aka: bool) -> str:
    """Render sorted tile ids as a compact suit-run string, e.g.
    ``m123p055z77`` (aka five renders as digit 0)."""
    if len(tile_ids) == 1:
        return _SINGLE_RENDER[has_aka][tile_ids[0]]
    parts: list[str] = []
    current_suit = None
    for t in sorted(tile_ids):
        letter = _SUIT_LETTERS[t // 36]
        prefix = letter if letter != current_suit else ""
        current_suit = letter
        digit = (t % 36) // 4 + 1
        if has_aka and letter != "z" and digit == 5 and t % 4 == 0:
            digit = 0
        parts.append(prefix + str(digit))
    return "".join(parts)


def _member_id(base: int, copy: int, compat: bool) -> int:
    """Meld-member tile id fed into the packed word.

    compat=True: the reference's ``base << 2 + copy`` operator-
    precedence quirk, i.e. ``base << (2 + copy)`` with 1-based rank in
    ``base``.  compat=False: the true tile id ``base0 * 4 + copy``
    where base0 uses the 0-based rank.
    """
    if compat:
        return base << (2 + copy)
    return (base - 1) * 4 + copy


def decode_meld(m: int, has_aka: bool, compat: bool = True):
    """Decode a Tenhou ``m`` meld bitfield.

    Returns ``(display_string, action_type, packed_word)`` where
    action_type is one of tii/pon/kan, or ``None`` for the north-tile
    extraction encoding (sanma nuki-dora).
    """
    claimed_from = m & 0x03
    mark = _CLAIM_MARKS[claimed_from]

    if m & 0x0004:
        # chi: bits 10-15 encode (sequence base)*3 + claimed position,
        # bits 3-4 / 5-6 / 7-8 the copy index of each member
        pt = (m & 0xFC00) >> 10
        claimed_pos = pt % 3
        base = pt // 3
        suit = base // 7
        low = base % 7 + 1
        ranks = [low, low + 1, low + 2]
        copies = [(m & 0x0018) >> 3, (m & 0x0060) >> 5, (m & 0x0180) >> 7]
        digits = []
        for i in range(3):
            d = "0" if has_aka and copies[i] == 0 and ranks[i] == 5 else str(ranks[i])
            if i == claimed_pos:
                d += mark
            digits.append(d)
        display = _SUIT_LETTERS[suit] + "".join(digits)
        members = [
            _member_id(suit * 9 + r, c, compat) for r, c in zip(ranks, copies)
        ]
        packed = pack_meld(
            members[0], members[1], members[2], MELD_TII, claimed_from, claimed_pos
        )
        return display, "tii", packed

    if m & 0x0018:
        # pon (bit 3) or added kan (bit 4): bits 9-15 = triple*3 + pos
        pt = (m & 0xFE00) >> 9
        claimed_pos = pt % 3
        base = pt // 3
        suit = base // 9
        rank = base % 9 + 1
        digits4 = [rank, rank, rank, rank]
        copies = [0, 1, 2, 3]
        copies.remove((m & 0x0060) >> 5)  # the copy NOT in the pon
        if has_aka and suit != 3 and rank == 5:
            if (m & 0x0060) == 0:
                digits4[3] = 0
            elif claimed_pos == 0:
                digits4[2] = 0
            else:
                digits4[1] = 0
        members = [_member_id(suit * 9 + rank, c, compat) for c in copies]
        if m & 0x0008:
            display = (
                _SUIT_LETTERS[suit] + "".join(str(x) for x in digits4[0:3]) + mark
            )
            packed = pack_meld(
                members[0], members[1], members[2], MELD_PON, claimed_from, claimed_pos
            )
            return display, "pon", packed
        display = (
            _SUIT_LETTERS[suit]
            + "".join(str(x) for x in digits4[0:3])
            + mark
            + str(digits4[3])
        )
        kan_id = (suit * 9 + rank) << 2 if compat else (suit * 9 + rank - 1) * 4
        packed = pack_meld(kan_id, 0, 0, MELD_MINKAN, claimed_from, claimed_pos)
        return display, "kan", packed

    if (m & 0x0030) == 0:
        # closed kan (claimed_from == 0) or open daiminkan
        pt = m >> 8
        pos = pt % 4
        base = pt // 4
        suit = base // 9
        rank = base % 9 + 1
        digits4 = [rank, rank, rank, rank]
        if has_aka and suit != 3 and rank == 5:
            if mark == "" or pos == 0:
                digits4[3] = 0
            else:
                digits4[2] = 0
        display = _SUIT_LETTERS[suit] + "".join(str(x) for x in digits4) + mark
        kan_id = (suit * 9 + rank) << 2 if compat else (suit * 9 + rank - 1) * 4
        kind = MELD_ANKAN if claimed_from == 0 else MELD_MINKAN
        packed = pack_meld(kan_id, 0, 0, kind, claimed_from, pos)
        return display, "kan", packed

    # north-tile extraction (sanma nuki-dora): not a meld action
    return None
