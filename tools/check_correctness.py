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

import __spark_entry__ as entry_mod


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None) if s.dt.tz is None else pd.to_datetime(s).dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns: spark={sorted(spark_pdf.columns)} duckdb={sorted(duck_pdf.columns)}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            sa, sb = a[c], b[c]
            if pd.api.types.is_float_dtype(sa) or pd.api.types.is_float_dtype(sb):
                eq = (sa.astype(float).fillna(1e308) == sb.astype(float).fillna(1e308))
                if not eq.all():
                    i = (~eq).idxmax()
                    problems.append(f"col {c}: {int((~eq).sum())} mismatches, e.g. row {i}: {sa[i]!r} vs {sb[i]!r}")
            else:
                eq = sa.fillna("\0NULL").astype(str) == sb.fillna("\0NULL").astype(str)
                if not eq.all():
                    i = (~eq).idxmax()
                    problems.append(f"col {c}: {int((~eq).sum())} mismatches, e.g. row {i}: {sa[i]!r} vs {sb[i]!r}")
    return problems


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
