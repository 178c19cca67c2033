"""Strict driver-mirror sweep: every oracle-bearing registry query,
EXACT value equality (no 9-dp rounding slack), plus flags for output
columns the driver's pandas canonicalizer cannot sort (raw arrays).

Run: python tests/strict_sweep.py [sf_dir]
"""

from __future__ import annotations

import datetime
import math
import sys
import time
from decimal import Decimal

import duckdb


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir: str) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql.types import ArrayType, MapType

    from mahjong_etl_spark.plans.registry import registry

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    reg = registry()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_fail = 0
    for name, q in reg.items():
        t0 = time.time()
        try:
            df = q.spark_fn(spark, sf_dir)
            arr_cols = [
                f.name for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType))
            ]
            s_rows = [tuple(r) for r in df.collect()]
            s_cols = df.columns
            if q.oracle is None:
                tag = "rows-only"
                if arr_cols:
                    tag += f" ARRAY-OUT:{arr_cols}"
                print(f"{tag:12} {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
                continue
            cur = con.execute(q.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            ok = sorted(s_cols) == sorted(o_cols)
            msg = ""
            if not ok:
                msg = f"cols {sorted(s_cols)} vs {sorted(o_cols)}"
            elif len(s_rows) != len(o_rows):
                ok = False
                msg = f"rowcount {len(s_rows)} vs {len(o_rows)}"
            else:
                _, sc = _canon(s_cols, s_rows)
                _, oc = _canon(o_cols, o_rows)
                bad = [i for i, (a, b) in enumerate(zip(sc, oc)) if a != b]
                if bad:
                    ok = False
                    i = bad[0]
                    msg = f"{len(bad)} rows differ; first @{i}:\n  spark:  {sc[i]}\n  oracle: {oc[i]}"
            tag = "PASS" if ok else "FAIL"
            if arr_cols:
                tag += f" ARRAY-OUT:{arr_cols}"
            if not ok:
                n_fail += 1
            print(f"{tag:12} {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s) {msg}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"{'ERROR':12} {name}: {type(e).__name__}: {e}")
        sys.stdout.flush()
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
