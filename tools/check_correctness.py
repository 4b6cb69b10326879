"""Local rehearsal of the driver's correctness gate.

For every ``queries()`` entry: run the Spark query and (if present) the
DuckDB ``oracle_sql()`` twin on the same parquet tables, then compare
row count, column names, and an order-insensitive value comparison
(columns sorted by name, rows sorted, exact equality).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_spark.session import get_spark
from mr_spark.sources import TPCH_TABLES
from mr_spark.oracle import diff

import __spark_entry__ as entry_mod


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    # Single source of truth: mr_spark.oracle.diff includes the dtype-parity
    # check (int-vs-float drift fails locally, mirroring the driver's
    # dtype-sensitive value hash).
    return diff(spark_pdf, duck_pdf)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            if len(spark_pdf) == 0:
                print(f"      WARNING: 0 rows from {name}")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"PASS  {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_fail} failures / {len(qs)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
