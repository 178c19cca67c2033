"""Deterministic synthetic Tenhou-log corpus generator (bench fixture).

The committed test fixtures are 4 hand-written games — enough to pin
parser semantics, far too small to measure parse THROUGHPUT (SURVEY §6
proxy metric "games parsed/sec").  This module fabricates an arbitrary
number of structurally-valid ``mjloggm`` documents — full kyoku loops
with draws, tsumogiri and from-hand discards, riichi declarations,
meld calls, AGARI and RYUUKYOKU endings — laid out exactly like the
scraper's output tree (``<root>/<YYYYMMDD>/<game_id>.xml``) so
``plans.etl.run_etl`` ingests them unchanged.

Everything is driven by ``random.Random(seed)`` per game: the corpus
for a given (n_games, seed) is byte-identical on every host, so bench
numbers are comparable round-over-round.  Meld words come from a small
pool of known-valid Tenhou bitfields (the generator fabricates call
CONTEXT, not new bit encodings — encoding is pinned separately by the
codec's reference-parity tests).

This is a load generator, not a rules engine: hands/walls are dealt
from a real 136-tile shuffle but call legality and scoring arithmetic
are not simulated — the parser under test is stateless per element, so
throughput depends on document shape and volume, which ARE realistic
(~8-60 actions per kyoku, 4-8 kyokus per game, 3-8 KB per file).
"""

from __future__ import annotations

import os
import random

# Known-valid Tenhou meld bitfields (decoded shapes pinned by codec
# tests): chi, pon, added-kan, closed-kan.
_MELD_POOL = [295, 20586, 20497, 26624, 33]

_GO_TYPES = [169, 3, 9, 161, 1]  # 4-player variants (aka on/off, soku)

_NAMES = ["ai", "bo", "cat", "dog", "emu", "fox", "gnu", "hen"]


def _pct(name: str) -> str:
    return "".join(f"%{b:02X}" for b in name.encode("utf-8"))


# sanma nuki-dora extraction word: bits 2 (chi), 3-4 (pon/added-kan)
# clear, bit 5 set — both decoders return "not a meld action" for it
# (functions/codec.py:239, reference scrape.py nakimentsu)
_NUKI_M = 32

# kan words in _MELD_POOL (a following DORA reveal is realistic)
_KAN_WORDS = {20497, 26624}


def render_game(rng: random.Random, rare: bool = False) -> str:
    """One synthetic mjloggm document.

    ``rare=False`` (the default) is BYTE-STABLE across releases — the
    bench corpus marker caches on (n_games, seed) and round-over-round
    throughput comparisons assume identical documents.  ``rare=True``
    additionally exercises the reference parser's rare branches:
    sanma (3-player: empty hai3, nuki-dora N words), mid-game DORA
    reveals after kans, mid-game UN re-joins (last name wins), BYE
    disconnects (ignored by both parsers), and double-ron (two AGARI
    closing one kyoku).  All rare draws live behind ``if rare:`` so
    the default rng stream is untouched."""
    sanma = rare and rng.random() < 0.2
    n_seats = 3 if sanma else 4
    lines = ['<mjloggm ver="2.3">']
    go_type = 17 if sanma else rng.choice(_GO_TYPES)
    lines.append(f'<GO type="{go_type}" lobby="0"/>')
    ns = rng.sample(_NAMES, n_seats)
    lines.append(
        "<UN "
        + " ".join(f'n{i}="{_pct(n)}"' for i, n in enumerate(ns))
        + f' dan="{",".join(str(i + 1) for i in range(n_seats))}"'
        + f' rate="{",".join(["1500"] * n_seats)}"/>'
    )
    oya0 = rng.randrange(n_seats)
    lines.append(f'<TAIKYOKU oya="{oya0}"/>')
    scores = [350, 350, 350, 350] if sanma else [250, 250, 250, 250]
    n_kyoku = rng.randint(4, 8)
    for k in range(n_kyoku):
        oya = (oya0 + k) % n_seats
        deck = list(range(136))
        rng.shuffle(deck)
        hands = [sorted(deck[13 * s : 13 * (s + 1)]) for s in range(n_seats)]
        wall = deck[13 * n_seats :]
        dora_ind = wall[-14]
        ten = ",".join(str(s) for s in scores)
        hai_attrs = " ".join(
            f'hai{s}="' + ",".join(map(str, hands[s])) + '"'
            for s in range(n_seats)
        )
        if sanma:
            hai_attrs += ' hai3=""'
        lines.append(
            f'<INIT seed="{k},{rng.randrange(3)},0,{rng.randrange(6)},'
            f'{rng.randrange(6)},{dora_ind}" ten="{ten}" oya="{oya}" {hai_attrs}/>'
        )
        riichi_declared = [False] * 4
        seat = oya
        for _turn in range(rng.randint(8, 60)):
            if len(wall) <= 14:
                break
            drawn = wall.pop(0)
            lines.append(f"<{'TUVW'[(seat + oya) % 4]}{drawn}/>")
            hand = hands[seat]
            if rare and sanma and rng.random() < 0.06:
                # north-tile extraction: no action row, turn continues
                lines.append(f'<N who="{seat}" m="{_NUKI_M}"/>')
            do_riichi = not riichi_declared[seat] and rng.random() < 0.05
            if do_riichi:
                lines.append(f'<REACH who="{seat}" step="1"/>')
            if rng.random() < 0.45:
                discard = drawn  # tsumogiri
            else:
                discard = hand.pop(rng.randrange(len(hand)))
                hand.append(drawn)
            lines.append(f"<{'DEFG'[(seat + oya) % 4]}{discard}/>")
            if do_riichi:
                riichi_declared[seat] = True
                scores[seat] -= 10
                ten2 = ",".join(str(s) for s in scores)
                lines.append(f'<REACH who="{seat}" ten="{ten2}" step="2"/>')
            if rare and rng.random() < 0.02:
                lines.append(f'<BYE who="{rng.randrange(n_seats)}"/>')
            if rare and rng.random() < 0.02:
                j = rng.randrange(n_seats)
                lines.append(f'<UN n{j}="{_pct(rng.choice(_NAMES))}"/>')
            if rng.random() < 0.06:
                caller = rng.choice([s for s in range(n_seats) if s != seat])
                word = rng.choice(_MELD_POOL)
                lines.append(f'<N who="{caller}" m="{word}"/>')
                if rare and word in _KAN_WORDS and len(wall) > 15:
                    lines.append(f"<DORA hai=\"{wall.pop()}\"/>")
                seat = caller
            else:
                seat = (seat + 1) % n_seats
        last = k == n_kyoku - 1
        owari = ""
        if last:
            pts = [(s - 300) for s in scores]
            owari = " owari=\"" + ",".join(
                f"{s},{p / 10:.1f}" for s, p in zip(scores, pts)
            ) + "\""
        if rng.random() < 0.45:
            if rare and rng.random() < 0.15:
                # double-ron: two winners off one discarder, owari on
                # the LAST AGARI only (Tenhou layout)
                winners = rng.sample(range(n_seats), 2)
                from_who = rng.choice(
                    [s for s in range(n_seats) if s not in winners]
                )
            else:
                # draw-for-draw identical to the legacy stream: the
                # default corpus must stay byte-stable for the bench
                w = rng.randrange(n_seats)
                winners = [w]
                from_who = rng.choice([w, rng.randrange(n_seats)])
            n_ron = len(winners)
            for i, who in enumerate(winners):
                machi = hands[who][-1]
                hai = ",".join(map(str, hands[who]))
                pts = rng.choice([1000, 2000, 3900, 7700, 8000, 12000])
                diffs = [0, 0, 0, 0]
                diffs[who] = pts // 100
                if from_who != who:
                    diffs[from_who] = -pts // 100
                sc = ",".join(f"{s},{d}" for s, d in zip(scores, diffs))
                scores = [s + d for s, d in zip(scores, diffs)]
                yaku = rng.choice(['yaku="1,1"', 'yaku="1,1,52,2"', 'yakuman="39"'])
                ura = f' doraHaiUra="{wall[-7]}"' if any(riichi_declared) else ""
                o = owari if i == n_ron - 1 else ""
                lines.append(
                    f'<AGARI who="{who}" fromWho="{from_who}" machi="{machi}" '
                    f'ten="30,{pts},0" hai="{hai}" {yaku} doraHai="{dora_ind}"'
                    f'{ura} sc="{sc}"{o}/>'
                )
        else:
            sc = ",".join(f"{s},0" for s in scores)
            rk_type = rng.choice(["", ' type="yao9"', ' type="reach4"'])
            lines.append(f'<RYUUKYOKU{rk_type} sc="{sc}"{owari}/>')
    lines.append("</mjloggm>")
    return "\n".join(lines)


def generate_corpus(
    root: str,
    n_games: int = 1000,
    seed: int = 42,
    n_dates: int = 10,
    rare: bool = False,
) -> str:
    """Write ``n_games`` synthetic logs under ``root`` across
    ``n_dates`` date partitions; returns ``root``.  Idempotent: a
    marker file records (n_games, seed, n_dates, rare) and
    short-circuits regeneration when it matches, so bench runs pay
    generation once per host.  ``rare=True`` turns on the rare-branch
    events of :func:`render_game` (parity fuzzing, not benching)."""
    marker = os.path.join(root, ".synth_corpus")
    stamp = f"{n_games},{seed},{n_dates}" + (",rare" if rare else "")
    if os.path.exists(marker) and open(marker).read() == stamp:
        return root
    for i in range(n_games):
        dt = f"202402{i % n_dates + 1:02d}"
        d = os.path.join(root, dt)
        os.makedirs(d, exist_ok=True)
        rng = random.Random((seed << 20) | i)
        with open(os.path.join(d, f"synth{i:05d}.xml"), "w") as f:
            f.write(render_game(rng, rare=rare))
    with open(marker, "w") as f:
        f.write(stamp)
    return root
