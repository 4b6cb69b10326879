"""Shared driver-gate rehearsal machinery: run a registered query against
its DuckDB oracle and compare row count + columns + order-insensitive
exact values (the driver's CORRECTNESS check, rebuilt locally).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from .sources import TPCH_TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — the
    order-insensitive canonical form both sides are hashed in."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                df[c] = s.dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class that determines how the driver's hash renders a
    value: a DuckDB HUGEINT surfacing as float64 prints '1791.0' where
    Spark's bigint prints '1791' — same value, different hash. Any
    int-vs-float (or other cross-kind) drift must fail locally too."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def diff(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Empty list = exact match."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns: spark={sorted(spark_pdf.columns)} duckdb={sorted(duck_pdf.columns)}"
        )
        return problems
    if problems:
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        ka, kb = _dtype_kind(sa), _dtype_kind(sb)
        if ka != kb:
            problems.append(
                f"col {c}: dtype drift spark={sa.dtype}({ka}) vs duckdb={sb.dtype}({kb})"
                " — driver hash would mismatch even on equal values"
            )
        if pd.api.types.is_float_dtype(sa) or pd.api.types.is_float_dtype(sb):
            eq = sa.astype(float).fillna(1e308) == sb.astype(float).fillna(1e308)
        else:
            eq = sa.fillna("\0NULL").astype(str) == sb.fillna("\0NULL").astype(str)
        if not eq.all():
            i = (~eq).idxmax()
            problems.append(
                f"col {c}: {int((~eq).sum())} mismatches, e.g. row {i}: {sa[i]!r} vs {sb[i]!r}"
            )
    return problems
