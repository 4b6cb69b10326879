"""Sketch-contract quantiles and skyline (Pareto-frontier) operators.

`approx_quantile_bounds` turns the usually-untestable approx sketch into
an oracle-checkable query by emitting the sketch's *verified guarantee*
(rank error ≤ ε) instead of the sketch value itself. `pareto_frontier` is
the classic 2D skyline as a two-phase distributed sort-prune — no
quadratic dominance join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query
from .tpch import dec

_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
_ACC = 1000  # approx_percentile accuracy → rank error ≤ 1/_ACC


@query(
    "approx_quantile_bounds",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT CAST({q} AS DOUBLE) AS q,
           ROUND(quantile_cont(l_extendedprice, {q}), 2) AS exact_pctl,
           TRUE AS within_bounds
    FROM lineitem"""
        for q in _QS
    ),
)
def approx_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles WITH a verifiable contract. percentile_approx
    (GK sketch — the constant-memory 100 TB quantile path; exact
    percentile sorts the column) guarantees rank error ≤ 1/accuracy. The
    query computes the approx values, then verifies the guarantee with a
    second scan: the true rank interval of each approx value
    [count(<x)/n, count(≤x)/n] must overlap q ± 2/accuracy. Output is the
    exact percentile (cross-engine comparable) plus the verified
    `within_bounds` flag — if Spark's sketch ever violated its bound, the
    flag flips false and the oracle's literal TRUE catches it."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs_arr = F.array(*[F.lit(float(q)) for q in _QS])
    agg = li.agg(
        F.percentile_approx("l_extendedprice", qs_arr, F.lit(_ACC)).alias("approx"),
        F.expr(
            "percentile(l_extendedprice, array("
            + ", ".join(f"{q}D" for q in _QS)
            + "))"
        ).alias("exact"),
        F.count("*").alias("n"),
    )
    per_q = agg.select(
        F.explode(
            F.arrays_zip(qs_arr.alias("q"), F.col("approx").alias("a"), F.col("exact").alias("e"))
        ).alias("z"),
        "n",
    ).select(
        F.col("z.q").alias("q"), F.col("z.a").alias("a"), F.col("z.e").alias("e"), "n"
    )
    ranks = li.crossJoin(F.broadcast(per_q)).groupBy("q", "a", "e", "n").agg(
        F.sum(F.when(F.col("l_extendedprice") < F.col("a"), 1).otherwise(0)).alias("n_lt"),
        F.sum(F.when(F.col("l_extendedprice") <= F.col("a"), 1).otherwise(0)).alias("n_le"),
    )
    eps = 2.0 / _ACC
    return ranks.select(
        "q",
        F.round("e", 2).alias("exact_pctl"),
        (
            (F.col("n_le").cast("double") / F.col("n") >= F.col("q") - eps)
            & (F.col("n_lt").cast("double") / F.col("n") <= F.col("q") + eps)
        ).alias("within_bounds"),
    )


_PARETO_PC_SQL = """
  pc AS (
    SELECT o_custkey AS c_custkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS spend,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
  )
"""


@query(
    "pareto_frontier",
    oracle=f"""
    WITH {_PARETO_PC_SQL},
    d AS (SELECT DISTINCT spend, n_orders FROM pc),
    flag AS (
      SELECT spend, n_orders,
             MAX(n_orders) OVER (ORDER BY spend DESC, n_orders DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM d
    )
    SELECT pc.c_custkey, pc.spend, CAST(pc.n_orders AS BIGINT) AS n_orders
    FROM pc JOIN flag ON pc.spend = flag.spend AND pc.n_orders = flag.n_orders
    WHERE flag.prev_max IS NULL OR flag.prev_max < flag.n_orders
    """,
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline: customers not dominated on (total spend, order count) —
    no other customer ≥ on both with one strict. Two-phase sort-prune, no
    O(n²) dominance join: phase 1 computes a LOCAL skyline per partition
    over the distinct (spend, n_orders) pairs (a point dominated within
    any subset is dominated globally — partition-parallel window); phase 2
    runs the same running-max scan over the few survivors in one
    partition. A row survives the ordered scan (spend desc, n_orders desc)
    iff no earlier row has n_orders ≥ its own — on distinct pairs that is
    exactly non-dominance. Frontier pairs broadcast back to recover the
    customer rows (ties share the frontier)."""
    o = load_table(spark, sf_dir, "orders")
    pc = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias("spend"),
        F.count("*").alias("n_orders"),
    )
    d = pc.select("spend", "n_orders").distinct()

    def survivors(df: DataFrame, part_cols: list) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.desc("spend"), F.desc("n_orders"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            df.withColumn("prev_max", F.max("n_orders").over(w))
            .where(F.col("prev_max").isNull() | (F.col("prev_max") < F.col("n_orders")))
            .drop("prev_max")
        )

    local = survivors(d.withColumn("pid", F.spark_partition_id()), ["pid"]).drop("pid")
    frontier = survivors(local, [])
    return pc.join(F.broadcast(frontier), ["spend", "n_orders"], "left_semi").select(
        "c_custkey", "spend", F.col("n_orders").cast("bigint").alias("n_orders")
    )


_N_BUCKETS = 20


@query(
    "histogram_prices",
    oracle=f"""
    WITH b AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
               FROM lineitem)
    SELECT CAST(LEAST(CAST(FLOOR((l_extendedprice - b.mn)
                                 / ((b.mx - b.mn) / {_N_BUCKETS})) AS BIGINT),
                      {_N_BUCKETS - 1}) AS BIGINT) AS bucket,
           ROUND(b.mn + LEAST(CAST(FLOOR((l_extendedprice - b.mn)
                                 / ((b.mx - b.mn) / {_N_BUCKETS})) AS BIGINT),
                      {_N_BUCKETS - 1}) * ((b.mx - b.mn) / {_N_BUCKETS}), 2) AS lo,
           COUNT(*) AS n
    FROM lineitem, b
    GROUP BY 1, 2
    """,
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets over the observed price range) —
    the profiling primitive behind every dashboard distribution plot. The
    range comes from a scalar min/max aggregate broadcast as a one-row
    cross join (exactly how Catalyst rewrites a scalar subquery), then
    bucket assignment is a row-side floor division — one scan + one tiny
    agg + one group-by, no sort. The bucket edge floats are identical
    IEEE expressions on both engines (floor((p−mn)/w) with w computed
    once), so even boundary values bucket identically."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    b = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    w = (F.col("mx") - F.col("mn")) / _N_BUCKETS
    bucket = F.least(
        F.floor((F.col("l_extendedprice") - F.col("mn")) / w).cast("bigint"),
        F.lit(_N_BUCKETS - 1),
    ).cast("bigint")
    return (
        li.crossJoin(F.broadcast(b))
        .groupBy(
            bucket.alias("bucket"),
            F.round(F.col("mn") + bucket * w, 2).alias("lo"),
        )
        .agg(F.count("*").alias("n"))
    )
