"""Strict driver-mirror sweep: every oracle-bearing registry query,
compared at the PANDAS-MATERIALIZED STRING level — the strictest proxy
for the driver's representation-sensitive canonical hash.

Why strings: the driver materializes both sides into pandas and hashes
a canonicalized frame.  Value-equal results can still hash-red when the
materialized representation differs — the classic case is a DECIMAL
output column, which DuckDB's .df() turns into float64 (str '3.1')
while Spark's toPandas() yields Decimal objects (str '3.100000').
r1-r3 all shipped exactly one such red row; this sweep catches it
locally.  It also flags output columns the driver's pandas
canonicalizer cannot sort (raw arrays/maps — r3's paiyama row errored
with "unhashable type: 'list'").

Run: python tests/strict_sweep.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd


def _norm(v):
    """One cell -> canonical string, unifying only what the driver's
    pandas round-trip itself unifies (null spellings, numpy boxing,
    date/datetime carriers) — NOT numeric representation."""
    if v is None:
        return "<NULL>"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        return "<UNSORTABLE>"
    return str(v)


def _canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [
        tuple(_norm(df[c].iloc[i]) for c in cols) for i in range(len(df))
    ]
    rows.sort()
    return cols, rows


def main(sf_dir: str, only: list[str]) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql.types import ArrayType, DecimalType, MapType

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
    if only:
        reg = {k: v for k, v in reg.items() if any(k.startswith(p) for p in only)}
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
            risky = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, DecimalType))
            ]
            sdf = df.toPandas()
            if q.oracle is None:
                tag = "rows-only"
                if risky:
                    tag += f" RISKY-OUT:{risky}"
                print(f"{tag:12} {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
                continue
            odf = con.execute(q.oracle).df()
            ok = sorted(sdf.columns) == sorted(odf.columns)
            msg = ""
            if not ok:
                msg = f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            elif len(sdf) != len(odf):
                ok = False
                msg = f"rowcount {len(sdf)} vs {len(odf)}"
            else:
                _, sc = _canon(sdf)
                _, oc = _canon(odf)
                bad = [i for i, (a, b) in enumerate(zip(sc, oc)) if a != b]
                if bad:
                    ok = False
                    i = bad[0]
                    msg = (
                        f"{len(bad)} rows differ; first @{i}:\n"
                        f"  spark:  {sc[i]}\n  oracle: {oc[i]}"
                    )
            tag = "PASS" if ok else "FAIL"
            if risky:
                tag += f" RISKY-OUT:{risky}"
                if ok:
                    tag = f"WARN-{tag}"
            if not ok:
                n_fail += 1
            print(f"{tag:12} {name} ({len(sdf)} rows, {time.time()-t0:.1f}s) {msg}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"{'ERROR':12} {name}: {type(e).__name__}: {e}")
        sys.stdout.flush()
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:],
        )
    )
