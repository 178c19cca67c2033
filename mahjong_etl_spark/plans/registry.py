"""Query registry — the declared query surface of the engine.

Every operator capability from SURVEY.md §2 (and the §7-step-6
extension plane) is exposed as a named query here.  Each entry pairs a
Spark callable ``(spark, sf_dir) -> DataFrame`` with, where the
semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL
string run by the driver's correctness harness (row-count + schema +
order-insensitive value-hash).

Conventions that keep the hash-match honest:
- every computed column is aliased identically on both sides;
- floating aggregates are rounded (2dp money, 4-6dp ratios) on BOTH
  sides so parallel-summation last-bit drift cannot flip the hash;
- timestamps are emitted as formatted strings or DATE casts;
- top-k queries order by (rounded metric, unique key) so the cut line
  is deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None => driver does rows-only check
    bench: bool  # include in bench.py headline set
    doc: str = field(default="")


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, bench: bool = True):
    """Decorator: register a query under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, bench, fn.__doc__ or "")
        return fn

    return deco


def registry() -> dict[str, Query]:
    """Import all query-defining modules, return the full registry."""
    from . import mahjong_queries, queries  # noqa: F401
    from ..operators import (  # noqa: F401
        asof,
        corpus,
        dedup,
        multimodal,
        rangejoin,
        sessionize,
        similarity,
        text_analysis,
    )

    return dict(_REGISTRY)
