"""MERGE-upsert emulation: source wins on match, unmatched target rows
survive, no duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_spark.operators.cdc import merge_upsert
from mr_spark.sources import load_table

from conftest import SF_DIR


def test_merge_upsert(spark):
    c = load_table(spark, SF_DIR, "customer")
    # updates: bump acctbal for a third of customers
    updates = c.where(F.col("c_custkey") % 3 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    merged = merge_upsert(c, updates, "c_custkey")
    assert merged.count() == c.count()  # pure upsert: cardinality unchanged
    assert merged.select("c_custkey").distinct().count() == c.count()
    bumped = merged.join(updates.select("c_custkey"), "c_custkey", "left_semi")
    orig_third = c.where(F.col("c_custkey") % 3 == 0)
    assert (
        bumped.agg(F.sum("c_acctbal")).first()[0]
        - orig_third.agg(F.sum("c_acctbal")).first()[0]
    ) - 1000.0 * orig_third.count() < 1e-6


def test_merge_upsert_with_inserts(spark):
    c = load_table(spark, SF_DIR, "customer")
    new_rows = c.limit(5).withColumn("c_custkey", F.col("c_custkey") + 1_000_000)
    merged = merge_upsert(c, new_rows, "c_custkey")
    assert merged.count() == c.count() + 5
