"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in the session) handles most skew at
runtime; explicit salting remains the tool when one build-side key is so
hot that even split shuffle partitions overload (the classic power-law
user_id / null-key case at 100 TB).

``salted_join``: replicate the build side R ways, scatter the probe side
uniformly across the R replicas — same rows as a plain inner equi-join,
but the hot key's probe rows spread over R tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    *,
    salt: int = 8,
) -> DataFrame:
    """Inner equi-join with R-way salting (result == probe ⋈ build).

    probe gets a uniform salt in [0, R); build is exploded ×R with every
    salt value; the join key becomes (key, salt). Use when a specific key's
    row count per task exceeds memory even after AQE splitting; cost is an
    R× blow-up of the (small) build side."""
    salted_probe = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    salted_build = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_probe.join(
        salted_build,
        (salted_probe[probe_key] == salted_build[build_key])
        & (salted_probe["__salt"] == salted_build["__salt"]),
    )
    return out.drop("__salt")


@query(
    "salted_skew_join",
    oracle="""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join utility surfaced as a query: events (probe, skewed
    power-law user_id at scale) joined to customer (build) with 8-way
    salting, then aggregated per market segment. Salting must be
    result-invariant — the oracle is the PLAIN join — while the plan
    spreads any hot key's probe rows over 8 tasks instead of one. AQE's
    skew splitting covers most cases at runtime; explicit salting is the
    insurance for a single key too hot even after splitting."""
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(ev, cust, "user_id", "c_custkey", salt=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_value"),
    )
