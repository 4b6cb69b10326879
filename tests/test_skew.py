"""Salted join: same rows as the plain join, probe side spread across
salt replicas."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_spark.operators.skew import salted_join
from mr_spark.sources import load_table

from conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("o_orderkey").alias("s"))
    )
    salted = (
        salted_join(o, c, "o_custkey", "c_custkey", salt=4)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("o_orderkey").alias("s"))
    )
    assert sorted(salted.collect()) == sorted(plain.collect())


def test_salt_actually_spreads(spark):
    """A hot key's probe rows must land in >1 salt bucket."""
    o = load_table(spark, SF_DIR, "orders")
    salted = o.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(4))
    )
    hot = salted.groupBy("o_custkey").agg(
        F.countDistinct("__salt").alias("n_buckets"), F.count("*").alias("n")
    )
    multi = hot.where((F.col("n") >= 8) & (F.col("n_buckets") > 1)).count()
    some = hot.where(F.col("n") >= 8).count()
    assert some > 0 and multi == some
