"""Z-order layout: the point of the clustering key is DATA SKIPPING —
files written in Z-order have tighter per-file min/max ranges on BOTH
interleaved dimensions than files written in arrival order, so parquet
row-group statistics prune multi-predicate scans. Measured directly from
the written files' footer statistics."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mr_spark.operators.layout import with_normalized_zorder, zorder_key
from mr_spark.sources import load_table

from conftest import SF_DIR

_N_FILES = 8


def _avg_span(path: str, col: str) -> float:
    """Mean (max-min) of `col` across the parquet files under `path`."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        lo = min(pf.metadata.row_group(i).column(idx).statistics.min
                 for i in range(pf.metadata.num_row_groups))
        hi = max(pf.metadata.row_group(i).column(idx).statistics.max
                 for i in range(pf.metadata.num_row_groups))
        spans.append(hi - lo)
    assert len(spans) == _N_FILES
    return sum(spans) / len(spans)


def test_zorder_write_tightens_file_stats(spark):
    # l_partkey × l_orderkey: both high-cardinality at every SF
    # (l_suppkey has only 10 distinct values at sf0.001 — no span to tighten)
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    with tempfile.TemporaryDirectory() as d:
        plain, zed = os.path.join(d, "plain"), os.path.join(d, "zed")
        li.repartition(_N_FILES).write.parquet(plain)
        (
            with_normalized_zorder(li, "l_partkey", "l_orderkey")
            .repartitionByRange(_N_FILES, "zval")
            .sortWithinPartitions("zval")
            .drop("zval")
            .write.parquet(zed)
        )
        for col in ("l_partkey", "l_orderkey"):
            assert _avg_span(zed, col) < 0.8 * _avg_span(plain, col), col


def test_zorder_key_locality(spark):
    """Nearby Z-values decode to nearby (x, y): the key's defining
    property — check the max coordinate jump between consecutive
    Z-ordered points is bounded far below the domain size."""
    df = (
        spark.range(0, 1024)
        .select(
            (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
        )
        .select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
        .orderBy("z")
    )
    rows = df.collect()
    assert [r["z"] for r in rows] == sorted({r["z"] for r in rows})  # unique, sorted
    max_jump = max(
        abs(a["x"] - b["x"]) + abs(a["y"] - b["y"]) for a, b in zip(rows, rows[1:])
    )
    assert max_jump <= 32  # one Z-curve "seam" step, ≪ the 64-wide domain
