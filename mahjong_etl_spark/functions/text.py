"""Shared text expression builders (JVM-side, no Python UDFs).

Everything here stays inside whole-stage codegen: split / transform /
slice / concat_ws higher-order functions, never row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "in")


def words_col(text_col: str = "text") -> Column:
    """Whitespace tokens."""
    return F.split(F.col(text_col), " ")


def shingles_expr(n: int = 3, text_col: str = "text") -> Column:
    """Distinct word n-gram shingles as an array<string> column.

    The token array is materialized ONCE via a lambda binding
    (``transform(array(split(..)), ws -> ...)``) and then sliced per
    position — without the binding, Catalyst re-evaluates the split
    inside the per-element lambda, turning shingling O(words²) per
    document (measured 3-5x slower end-to-end on the dedup queries).
    Rows with fewer than ``n`` tokens yield an empty array (guard
    needed because ``sequence(0, k)`` with k<0 counts downward).
    """
    sh = F.expr(
        f"flatten(transform(array(split({text_col}, ' ')), ws ->"
        f"  transform(sequence(0, size(ws) - {n}),"
        f"            i -> concat_ws(' ', slice(ws, i + 1, {n})))))"
    )
    return F.when(
        F.size(F.split(F.col(text_col), " ")) >= n, F.array_distinct(sh)
    ).otherwise(F.array().cast("array<string>"))


def duckdb_shingles_sql(n: int = 3, text_col: str = "text") -> str:
    """The DuckDB-side mirror of ``shingles_expr`` (for oracle SQL)."""
    return (
        f"list_distinct(list_transform(range(len(string_split({text_col}, ' ')) - {n - 1}),"
        f" i -> array_to_string(string_split({text_col}, ' ')[i + 1 : i + {n}], ' ')))"
    )
