"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry query through Spark and its oracle SQL through DuckDB
over the same parquet files, then compares row multisets
order-insensitively (columns sorted by name, rows sorted, values
normalized) — the same contract as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    sc, s_canon = _canon(s_cols, s_rows)
    oc, o_canon = _canon(o_cols, o_rows)
    assert len(s_canon) == len(o_canon), f"row counts differ: {len(s_canon)} vs {len(o_canon)}"
    for i, (a, b) in enumerate(zip(s_canon, o_canon)):
        assert a == b, f"row {i} differs ({sc}):\n spark:  {a}\n oracle: {b}"
