"""Stateless Tenhou game-log parser: XML bytes -> rows for 9 tables.

This replaces the reference's global-mutable-state design (reference
scrape.py:127-135 + parse_document:355-609) with a pure function so it
can run inside mapInPandas on any number of executors: one call parses
one game and returns its rows; nothing is shared.

Kyoku-scoped rows carry ``kyoku_local`` — the 0-based ordinal of the
hand within its game — instead of a final id.  The reference mints
``kyoku_id = days_since_epoch*100000 + seqno`` with ``seqno`` threaded
across all games of a date in OS-listing order (reference main.py:19,
24, 31; scrape.py:447-448), which is nondeterministic even for the
reference itself.  The ETL (plans/etl.py) re-derives the same id space
deterministically: games are ordered by game_id within a date and each
game's kyoku ordinals are offset by the running total of preceding
games' hand counts.  Rows emitted before any INIT keep the reference's
literal ``kyoku_id = 0`` (kyoku_local = None).

compat=True reproduces the reference's two quirks (SURVEY.md §1.6):
1. meld-member id operator precedence (functions/codec._member_id);
2. every discard's ``pais`` string renders the last *drawn* tile, not
   the discarded one (reference scrape.py:597 uses tsumohai; the
   parsed sutehai only feeds the tsumogiri check).
"""

from __future__ import annotations

import urllib.parse
import xml.etree.ElementTree as ET
from datetime import date
from decimal import Decimal
from typing import Any

from ..functions.codec import (
    DRAW_DEFAULT,
    DRAW_NAMES,
    YAKU_NAMES,
    decode_meld,
    next_dora_list,
    render_tiles,
    single_render_table,
)

# wind assignment per seat given the dealer seat (reference scrape.py:442)
KAZE_TABLE = [[0, 1, 2, 3], [3, 0, 1, 2], [2, 3, 0, 1], [1, 2, 3, 0]]

TABLES = (
    "games",
    "rules",
    "game_players",
    "game_scores",
    "kyokus",
    "haipais",
    "agaris",
    "actions",
    "nagares",
)


def _decode_go_flags(tp: int, game_id: str, started_at: date) -> tuple[dict, dict, bool]:
    """GO type bitfield -> (games row, rules row, has_aka).

    Bit semantics from reference scrape.py:370-416; the wide games row
    is projected to (id, started_at) at write time per SURVEY §1.5, so
    we emit only the physical columns here.
    """
    has_aka = bool(tp & 0x02)
    is_sanma = bool(tp & 0x10)
    kuitan_ari = (tp & 0x04) == 0
    level = (tp & 0x20) >> 4 | (tp & 0x80) >> 7
    games_row = {"id": game_id, "started_at": started_at}
    rules_row = {
        "game_id": game_id,
        "enable_kuitan": kuitan_ari,
        "enable_atozuke": kuitan_ari,
        "enable_pao": True,
        "enable_tobi": True,
        "enable_wareme": False,
        "enable_kunaoshi": True,
        "enable_kuriage": False,
        "enable_agariyame": True,
        "enable_minus_riichi": True,
        "enable_ryanhan_shibari": False,
        "enable_keiten": True,
        "aka_type": 73 if has_aka else 0,
        "shanyu_score": 30000,
        "nannyu_score": 0 if (tp & 0x08) == 0 else -1,
        "uradora_type": 2,
        "furiten_riichi_type": 3,
        "oyanagare_type": 0xF,
        "double_ron_type": 1,
        "initial_score": 35000 if is_sanma else 25000,
        "kan_in_riichi_type": (tp & 0x10000) >> 16,
        "is_demo": (tp & 0x01) == 0,
        "is_soku": (tp & 0x40) != 0,
        "is_sanma": is_sanma,
        "level": level,
    }
    return games_row, rules_row, has_aka


def parse_game(
    xml_source: str | bytes,
    game_id: str,
    started_at: date,
    compat: bool = True,
) -> dict[str, list[dict[str, Any]]]:
    """Parse one Tenhou mjloggm document into per-table row lists."""
    root = ET.fromstring(xml_source)
    out: dict[str, list[dict[str, Any]]] = {t: [] for t in TABLES}

    has_aka = False
    # per-game binding of the 136-entry single-tile render table: the
    # draw/discard loop renders ONE tile per action (~435/game), so a
    # list index here replaces a render_tiles call (~30% of parse CPU)
    single = single_render_table(False)
    kyoku_local: int | None = None
    oya = 0
    riichi_pending = False
    after_kan = False
    last_drawn = 0
    action_seq = 0
    names: dict[str, str] = {}

    for el in root:
        tag = el.tag
        if tag == "GO":
            g, r, has_aka = _decode_go_flags(
                int(el.attrib["type"]), game_id, started_at
            )
            single = single_render_table(has_aka)
            out["games"].append(g)
            out["rules"].append(r)

        elif tag == "UN":
            for slot in ("n0", "n1", "n2", "n3"):
                v = el.attrib.get(slot)
                if v is not None:
                    names[slot] = urllib.parse.unquote(v)

        elif tag in ("TAIKYOKU", "DORA"):
            pass  # ignored by the reference too (scrape.py:432-434, 472-473)

        elif tag == "INIT":
            seeds = el.attrib["seed"].split(",")
            oya = int(el.attrib["oya"])
            after_kan = False
            riichi_pending = False
            kyoku_local = 0 if kyoku_local is None else kyoku_local + 1
            action_seq = 0
            out["kyokus"].append(
                {
                    "kyoku_local": kyoku_local,
                    "game_id": game_id,
                    "kyoku_num": int(seeds[0]),
                    "honba": int(seeds[1]),
                    "reachbou": int(seeds[2]),
                    "scores": [int(x) * 100 for x in el.attrib["ten"].split(",")],
                    "kazes": KAZE_TABLE[oya],
                }
            )
            for seat in range(4):
                tiles_csv = el.attrib.get(f"hai{seat}")
                if tiles_csv:  # sanma leaves hai3 empty
                    tiles = [int(x) for x in tiles_csv.split(",")]
                    out["haipais"].append(
                        {
                            "kyoku_local": kyoku_local,
                            "player_index": seat,
                            "haipai": render_tiles(tiles, has_aka),
                            "pai_ids": tiles,
                        }
                    )

        elif tag == "REACH":
            riichi_pending = el.attrib["step"] == "1"

        elif tag == "AGARI":
            ten = el.attrib["ten"].split(",")
            sc = [int(x) * 100 for x in el.attrib["sc"].split(",")]
            who = int(el.attrib["who"])
            from_who = int(el.attrib["fromWho"])
            owari_attr = el.attrib.get("owari")
            machi = int(el.attrib["machi"])

            # winning hand: machi moved to the end (all copies equal to
            # the machi id are filtered first — reference scrape.py:490)
            hand = [int(x) for x in el.attrib["hai"].split(",") if int(x) != machi]
            hand.append(machi)
            hand_strings = [render_tiles(hand, has_aka)]

            nukidora = 0
            melds_csv = el.attrib.get("m")
            if melds_csv is not None:
                for meld_word in reversed(melds_csv.split(",")):
                    decoded = decode_meld(int(meld_word), has_aka, compat)
                    if decoded is None:
                        nukidora += 1
                    else:
                        display, _kind, packed = decoded
                        hand_strings.append(display)
                        hand.append(packed)

            yaku_entries: list[dict[str, Any]] = []
            han = 0
            for y in (el.attrib.get("yakuman") or "").split(","):
                if y:
                    yaku_entries.append({"name": YAKU_NAMES[int(y)], "han": 0})
                    han += 13
            yaku_flat = (el.attrib.get("yaku") or "").split(",")
            for i in range(0, len(yaku_flat) - 1, 2):
                if yaku_flat[i]:
                    cnt = int(yaku_flat[i + 1])
                    if cnt > 0:
                        yaku_entries.append(
                            {"name": YAKU_NAMES[int(yaku_flat[i])], "han": cnt}
                        )
                        han += cnt

            dora_orig = [int(x) for x in el.attrib["doraHai"].split(",")]
            ura_csv = el.attrib.get("doraHaiUra")
            ura_orig = [int(x) for x in ura_csv.split(",")] if ura_csv else []

            out["agaris"].append(
                {
                    "kyoku_local": kyoku_local,
                    "machipai": machi,
                    "score": int(ten[1]),
                    "fu": int(ten[0]),
                    "han": han,
                    "tehai": ",".join(hand_strings),
                    "pai_ids": hand,
                    "yaku": yaku_entries,
                    "dora": next_dora_list(dora_orig),
                    "uradora": next_dora_list(ura_orig),
                    "dora_orig": dora_orig,
                    "uradora_orig": ura_orig,
                    "who": who,
                    "by": from_who,
                    "score_diff": [sc[1], sc[3], sc[5], sc[7]],
                    "owari": owari_attr is not None,
                    "nukidora": nukidora,
                }
            )

            if owari_attr is not None:
                final = owari_attr.split(",")
                for seat in range(0, len(final) // 2):
                    out["game_scores"].append(
                        {
                            "game_id": game_id,
                            "player_index": seat,
                            "score": int(final[seat * 2]) * 100,
                            "point": Decimal(final[seat * 2 + 1]),
                        }
                    )

        elif tag == "RYUUKYOKU":
            sc = [int(x) * 100 for x in el.attrib["sc"].split(",")]
            out["nagares"].append(
                {
                    "kyoku_local": kyoku_local,
                    "name": DRAW_NAMES.get(el.attrib.get("type"), DRAW_DEFAULT),
                    "score_diff": [sc[1], sc[3], sc[5], sc[7]],
                }
            )

        elif tag == "N":
            decoded = decode_meld(int(el.attrib["m"]), has_aka, compat)
            if decoded is not None:  # None = nuki-dora, not an action
                display, kind, packed = decoded
                out["actions"].append(
                    {
                        "kyoku_local": kyoku_local,
                        "player_index": int(el.attrib["who"]),
                        "seq": action_seq,
                        "type": kind,
                        "pais": display,
                        "pai_id": packed,
                    }
                )
                action_seq += 1
                if kind == "kan":
                    after_kan = True

        elif tag[0] in "TUVW" and tag[1:].isdigit():
            seat = (ord(tag[0]) - 84 + 4 - oya) % 4  # 84 = ord("T")
            last_drawn = int(tag[1:])
            out["actions"].append(
                {
                    "kyoku_local": kyoku_local,
                    "player_index": seat,
                    "seq": action_seq,
                    "type": "tsumo_k" if after_kan else "tsumo",
                    "pais": single[last_drawn],
                    "pai_id": None,
                }
            )
            action_seq += 1
            after_kan = False

        elif tag[0] in "DEFG" and tag[1:].isdigit():
            seat = (ord(tag[0]) - 68 + 4 - oya) % 4  # 68 = ord("D")
            discarded = int(tag[1:])
            # compat: reference renders the DRAWN tile here, not the
            # discarded one (scrape.py:597) — every non-tsumogiri
            # discard string is wrong; sutehai only feeds the '_' check
            shown = last_drawn if compat else discarded
            pais = single[shown]
            if discarded == last_drawn:
                pais += "_"
            if riichi_pending:
                pais += "*"
            riichi_pending = False
            out["actions"].append(
                {
                    "kyoku_local": kyoku_local,
                    "player_index": seat,
                    "seq": action_seq,
                    "type": "sutehai",
                    "pais": pais,
                    "pai_id": None,
                }
            )
            action_seq += 1

    for idx, (_slot, name) in enumerate(sorted(names.items())):
        # positional index from enumerate, matching the reference even
        # when slots are missing (scrape.py:606-607)
        out["game_players"].append(
            {"game_id": game_id, "player_name": name, "player_index": idx}
        )

    return out
