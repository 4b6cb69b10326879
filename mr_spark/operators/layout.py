"""Data-layout operators — Z-order (Morton) clustering keys.

At 100 TB the scan you avoid is worth more than the scan you speed up:
writing files clustered on a Z-order key keeps per-file min/max ranges
tight on EVERY interleaved dimension at once, so parquet row-group
statistics prune multi-predicate scans that a single-column sort cannot.
The key computation is pure integer bit arithmetic — whole-stage codegen,
no shuffle; the one shuffle is the final range-partitioning sort any
clustered write needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query

_BITS = 16  # bits kept per dimension (2 dims → 32-bit Z-value)


def zorder_key(x: F.Column, y: F.Column, *, bits: int = _BITS) -> F.Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    non-negative integer columns — the clustering key for
    multi-dimensional layout."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def with_normalized_zorder(
    df: DataFrame, xcol: str, ycol: str, *, bits: int = 8, out: str = "zval"
) -> DataFrame:
    """Append a Z-order key over two columns NORMALIZED to the same
    ``bits``-wide range first. Raw interleaving of mismatched domains
    (say an 8-bit part key against a 20-bit order key) degenerates: every
    high split bit comes from the wide column and the narrow one never
    clusters. Scaling both to [0, 2^bits) makes the curve alternate
    dimensions — what any real layout writer does before Z-ordering.

    The bounds come from one tiny min/max agg broadcast back (an exact,
    one-pass stand-in for the stats a table catalog already holds)."""
    bounds = df.agg(
        F.min(xcol).alias("_xmin"),
        F.max(xcol).alias("_xmax"),
        F.min(ycol).alias("_ymin"),
        F.max(ycol).alias("_ymax"),
    )
    scale = float(1 << bits)

    def _norm(col: str, lo: str, hi: str) -> F.Column:
        rng = (F.col(hi) - F.col(lo) + 1).cast("double")
        return F.floor(
            (F.col(col) - F.col(lo)).cast("double") * scale / rng
        ).cast("bigint")

    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out,
            zorder_key(
                _norm(xcol, "_xmin", "_xmax"), _norm(ycol, "_ymin", "_ymax"), bits=bits
            ),
        )
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )


_QBITS = 8  # normalized per-dimension width for the registered query


def _z_terms_bits(bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "zorder_key_lineitem",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(l_partkey) AS xmin, MAX(l_partkey) AS xmax,
             MIN(l_orderkey) AS ymin, MAX(l_orderkey) AS ymax
      FROM lineitem
    ), base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(FLOOR((l_partkey - xmin) * {float(1 << _QBITS)} / (xmax - xmin + 1))
                  AS BIGINT) AS x,
             CAST(FLOOR((l_orderkey - ymin) * {float(1 << _QBITS)} / (ymax - ymin + 1))
                  AS BIGINT) AS y
      FROM lineitem, bounds
    )
    SELECT l_orderkey, l_linenumber, CAST({_z_terms_bits(_QBITS)} AS BIGINT) AS zval
    FROM base
    """,
)
def zorder_key_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (l_partkey, l_orderkey), both
    normalized to 8 bits first (see with_normalized_zorder for why raw
    interleave of mismatched domains degenerates): the value a
    layout-optimizing writer sorts on so files stay tight on both
    dimensions. tests/test_layout.py proves the effect on parquet
    row-group min/max spans."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    return with_normalized_zorder(li, "l_partkey", "l_orderkey", bits=_QBITS).select(
        "l_orderkey", "l_linenumber", F.col("zval").cast("bigint").alias("zval")
    )
