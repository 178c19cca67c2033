"""Skew-resilient join helpers.

AQE's skew-join splitting (on in session.py) handles most hot keys at
runtime by splitting oversized shuffle partitions.  Explicit salting
is the second line of defense for the cases AQE cannot fix: a single
join KEY too hot for any partition split (every row of the key must
still meet every matching row), or a broadcast-ineligible dimension.

``salted_join`` rewrites ``big ⋈ small ON key`` as

    big  + salt = hash(whole row) % S     (deterministic, no rand())
    small × S   (one copy per salt value)
    join ON (key, salt)

so a key carrying p% of the big side spreads over S reducers at the
cost of replicating the SMALL side S× (choose S ≪ |small| safe).
Row-hash salting is deterministic across retries — important because
a failed task must re-derive the same salt or the join drops/dupes
rows (the classic rand()-salt bug).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # The small side is replicated num_salts times; for right/full
        # outer joins every unmatched small-side row would surface as
        # num_salts duplicate null-extended rows.  Only join types
        # where unmatched small-side rows are dropped are safe.
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt_col = "__salt"
    while salt_col in big.columns or salt_col in small.columns:
        salt_col += "_"
    big_salted = big.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    )
    small_salted = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<long>"))
    )
    return big_salted.join(small_salted, [*keys, salt_col], how).drop(salt_col)
