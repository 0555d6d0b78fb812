"""Local stand-in for the driver's CORRECTNESS check: run every queries()
entry via Spark AND its oracle_sql() twin via DuckDB on the same parquet,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from p_id_text_extraction_spark.plans.queries import ORACLES, ORACLES_DYNAMIC, QUERIES
from p_id_text_extraction_spark.session import get_spark
from p_id_text_extraction_spark.util import unpersist_tracked

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(f"{v!r}")
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8, shuffle_partitions=8, extra={"spark.driver.memory": "8g"})
    con = duck_con(sf_dir)
    failures = 0
    import time
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            t0 = time.monotonic()
            sdf = fn(spark, sf_dir).toPandas()
            spark_s = round(time.monotonic() - t0, 2)
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"[rows-only] {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            sql = (ORACLES_DYNAMIC[name](sf_dir)
                   if name in ORACLES_DYNAMIC else ORACLES[name])
            t0 = time.monotonic()
            odf = con.execute(sql).df()
            duck_s = round(time.monotonic() - t0, 2)
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {exc}")
            failures += 1
            continue
        ok = True
        if len(sdf) != len(odf):
            print(f"[FAIL] {name}: rows spark={len(sdf)} duckdb={len(odf)}")
            ok = False
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"[FAIL] {name}: cols spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
            ok = False
        if ok:
            a, b = canon(sdf), canon(odf)
            if a != b:
                bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"[FAIL] {name}: value mismatch, first diffs: {bad}")
                ok = False
        if ok:
            print(f"[ OK ] {name}: {len(sdf)} rows match "
                  f"(spark {spark_s}s, duckdb {duck_s}s)")
        else:
            failures += 1
        unpersist_tracked()   # release this query's operator caches
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
