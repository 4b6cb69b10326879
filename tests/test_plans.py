"""Physical-plan assertions — correctness of the SHAPE, not the values:
filters reach the parquet scan, projections prune columns, small dims
broadcast, aggregations have a map-side partial phase. These are the
properties that decide whether a plan survives 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_spark import operators as ops
from mr_spark import plans
from mr_spark.sources import load_table

from conftest import SF_DIR

QUERIES = ops.queries()


def test_q1_filter_pushdown_and_pruning(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    assert any("shipdate" in f.lower() for f in plans.pushed_filters(df))
    # 11-column table: the scan must NOT read columns q1 doesn't use
    schemas = plans.scan_schemas(df)
    assert schemas and all("l_orderkey" not in s for s in schemas)


def test_q5_broadcasts_dims(spark):
    df = QUERIES["q5_local_supplier"](spark, SF_DIR)
    assert plans.uses_broadcast_join(df)


def test_q3_broadcasts_filtered_customer(spark):
    df = QUERIES["q3_shipping_priority"](spark, SF_DIR)
    assert plans.uses_broadcast_join(df)


def test_wc_has_partial_aggregation(spark):
    """The map-side combine the reference's wc lacks entirely
    (SURVEY.md §4): partial count before the word shuffle."""
    df = QUERIES["wc"](spark, SF_DIR)
    assert plans.has_partial_aggregate(df)


def test_projection_pruning_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    schemas = plans.scan_schemas(df)
    assert schemas == ["struct<l_orderkey:bigint>"]


def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "part").where(F.col("p_size") > 10)
    assert any("p_size" in f for f in plans.pushed_filters(df))
