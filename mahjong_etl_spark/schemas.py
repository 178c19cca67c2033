"""StructType schemas for the nine mahjong tables + paiyamas.

Ground truth is the reference's *physical Parquet output* (SURVEY.md
§1.5): pyarrow silently projects away dict keys absent from the
declared schema, so e.g. ``games`` physically has only (id,
started_at) even though seven rule flags are computed for it
(reference scrape.py:13-18 vs 376-388).  We reproduce the physical
schemas exactly.

Type mapping decisions (SURVEY.md §1.2):
- uint32/uint64 -> LongType (packed meld words use bit 31; Spark has
  no unsigned types)
- date64 -> DateType (only day precision is ever used)
- fixed-size lists (4 / 136) -> ArrayType + a length data-quality
  check (Spark has no fixed-size array type)
- decimal128(4,1) -> DecimalType(4,1) end-to-end
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _f(name, dtype):
    return StructField(name, dtype, nullable=True)


GAMES = StructType([_f("id", StringType()), _f("started_at", DateType())])

# The ER diagram's last entity (reference er/mahjong.md:14-16):
# ``experiments { string id PK }`` with experiments ||--|{ games.  The
# reference DECLARES it but never writes it (no producer anywhere in
# scrape.py), so there is no physical layout to reproduce; the engine
# realizes it as a DERIVED dimension — one experiment per scrape batch
# (the dt the scraper was launched for, reference run_scraper.sh:3-7),
# registered as a view over the written games table (plans/catalog.py)
# rather than a tenth sink.  Kept OUT of TABLE_SCHEMAS on purpose:
# that dict drives the parser/sink fan-out and experiments has no
# parsed rows.
EXPERIMENTS = StructType([_f("id", StringType())])

RULES = StructType(
    [_f("game_id", StringType())]
    + [
        _f(n, BooleanType())
        for n in (
            "enable_kuitan",
            "enable_atozuke",
            "enable_pao",
            "enable_tobi",
            "enable_wareme",
            "enable_kunaoshi",
            "enable_kuriage",
            "enable_agariyame",
            "enable_minus_riichi",
            "enable_ryanhan_shibari",
            "enable_keiten",
        )
    ]
    + [
        _f("aka_type", LongType()),
        _f("shanyu_score", IntegerType()),
        _f("nannyu_score", IntegerType()),
        _f("uradora_type", IntegerType()),
        _f("furiten_riichi_type", LongType()),
        _f("oyanagare_type", LongType()),
        _f("double_ron_type", LongType()),
        _f("kan_in_riichi_type", LongType()),
        _f("initial_score", LongType()),
        _f("is_demo", BooleanType()),
        _f("is_soku", BooleanType()),
        _f("is_sanma", BooleanType()),
        _f("level", IntegerType()),
    ]
)

GAME_PLAYERS = StructType(
    [
        _f("game_id", StringType()),
        _f("player_name", StringType()),
        _f("player_index", IntegerType()),
    ]
)

GAME_SCORES = StructType(
    [
        _f("game_id", StringType()),
        _f("player_index", IntegerType()),
        _f("score", IntegerType()),
        _f("point", DecimalType(4, 1)),
    ]
)

KYOKUS = StructType(
    [
        _f("id", LongType()),
        _f("game_id", StringType()),
        _f("kyoku_num", IntegerType()),
        _f("honba", IntegerType()),
        _f("reachbou", IntegerType()),
        _f("scores", ArrayType(IntegerType())),  # len 4 invariant
        _f("kazes", ArrayType(IntegerType())),  # len 4 invariant
    ]
)

HAIPAIS = StructType(
    [
        _f("kyoku_id", LongType()),
        _f("player_index", IntegerType()),
        _f("haipai", StringType()),
        _f("pai_ids", ArrayType(LongType())),
    ]
)

YAKU_ENTRY = StructType([_f("name", StringType()), _f("han", IntegerType())])

AGARIS = StructType(
    [
        _f("kyoku_id", LongType()),
        _f("machipai", LongType()),
        _f("score", IntegerType()),
        _f("fu", IntegerType()),
        _f("han", IntegerType()),
        _f("tehai", StringType()),
        _f("pai_ids", ArrayType(LongType())),
        _f("yaku", ArrayType(YAKU_ENTRY)),
        _f("dora", ArrayType(LongType())),
        _f("uradora", ArrayType(LongType())),
        _f("dora_orig", ArrayType(LongType())),
        _f("uradora_orig", ArrayType(LongType())),
        _f("who", IntegerType()),
        _f("by", IntegerType()),
        _f("score_diff", ArrayType(IntegerType())),  # len 4 invariant
        _f("owari", BooleanType()),
        _f("nukidora", LongType()),
    ]
)

ACTIONS = StructType(
    [
        _f("kyoku_id", LongType()),
        _f("player_index", IntegerType()),
        _f("seq", IntegerType()),
        _f("type", StringType()),
        _f("pais", StringType()),
        _f("pai_id", LongType()),  # packed meld word; null for tsumo*/sutehai
    ]
)

NAGARES = StructType(
    [
        _f("kyoku_id", LongType()),
        _f("name", StringType()),
        _f("score_diff", ArrayType(IntegerType())),  # len 4 invariant
    ]
)

PAIYAMAS = StructType(
    [
        _f("id", LongType()),
        _f("pai_ids", ArrayType(LongType())),  # len 136, permutation of 0..135
    ]
)

TABLE_SCHEMAS: dict[str, StructType] = {
    "games": GAMES,
    "rules": RULES,
    "game_players": GAME_PLAYERS,
    "game_scores": GAME_SCORES,
    "kyokus": KYOKUS,
    "haipais": HAIPAIS,
    "agaris": AGARIS,
    "actions": ACTIONS,
    "nagares": NAGARES,
}
