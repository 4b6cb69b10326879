"""TPC-H-style analytics queries (Tier B extensions — SURVEY.md §2c notes
the reference has no joins/sorts/top-k; these are the scale-ready operators
the star schema begs for).

Determinism contract with the DuckDB oracle: money aggregates are computed
in DECIMAL(18,4) on BOTH sides — decimal addition is associative, so the
result is independent of partition/accumulation order (a double sum is not),
then cast to DOUBLE for a stable schema. Helper: :func:`dsum`.

Scale notes (100 TB design):
* dims (region/nation/supplier/part) are broadcast — no shuffle for them.
* fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  handles skew.
* aggregations are partial (map-side combine) by construction of groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query

DEC = "decimal(18,4)"
# factor type for decimal PRODUCTS: small enough that a 3-factor product
# ((12,4)·(12,4)·(12,4) → scale 12) stays under precision 38 in BOTH
# engines — at the 38 cap Spark and DuckDB reduce scale differently and
# results diverge in the 7th decimal.
DECM = "decimal(12,4)"


def dec(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def decm(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DECM)


def dsum(expr: Column, alias: str) -> Column:
    """Order-independent money sum: decimal accumulate, round to cents,
    double result. The round keeps the scaled integer under 2^53 so the
    decimal→double cast is exact in BOTH engines (DuckDB converts
    scaled_int/10^s in float arithmetic — a scale-12 sum differs from
    Spark's correctly-rounded BigDecimal cast by 1 ulp).
    SQL twin: CAST(ROUND(SUM(<decimal expr>), 2) AS DOUBLE) AS alias"""
    return F.round(F.sum(expr), 2).cast("double").alias(alias)


# decimal product expressions shared by several queries
def _disc_price() -> Column:
    return decm("l_extendedprice") * (F.lit(1).cast(DECM) - decm("l_discount"))


def _charge() -> Column:
    return _disc_price() * (F.lit(1).cast(DECM) + decm("l_tax"))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"
)
_SQL_CHARGE = (
    f"{_SQL_DISC_PRICE} * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))"
)


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({_SQL_CHARGE}), 2) AS DOUBLE) AS sum_charge,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1. Single scan (pruned to 7 columns, shipdate filter pushed to
    parquet), one shuffle on the 2-col group key, partial aggs map-side."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    cnt = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(dec("l_quantity"), "sum_qty"),
        dsum(dec("l_extendedprice"), "sum_base_price"),
        dsum(_disc_price(), "sum_disc_price"),
        dsum(_charge(), "sum_charge"),
        (F.round(F.sum(dec("l_quantity")), 2).cast("double") / cnt).alias("avg_qty"),
        (F.round(F.sum(dec("l_extendedprice")), 2).cast("double") / cnt).alias("avg_price"),
        (F.round(F.sum(dec("l_discount")), 2).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    WITH rev AS (
      SELECT l.l_orderkey AS orderkey,
             CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
             o.o_orderdate AS orderdate
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        AND l.l_shipdate > TIMESTAMP '1997-01-01'
      GROUP BY l.l_orderkey, o.o_orderdate
    )
    SELECT orderkey, revenue, orderdate
    FROM rev
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10. customer is small per
    segment → broadcast; orders⋈lineitem shuffles once on orderkey. Top-k is
    a TakeOrderedAndProject (no global sort materialization)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    return (
        joined.groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(dsum(_disc_price(), "revenue"))
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All dims broadcast (supplier,
    nation, region are tiny at every SF); the only shuffle is
    orders⋈lineitem + the final agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        dsum(_disc_price(), "revenue")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg; every predicate pushes to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(decm("l_extendedprice") * decm("l_discount"), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_DISC_PRICE}
                         ELSE CAST(0 AS DECIMAL(12,4)) END), 2) AS DOUBLE) AS promo_revenue,
           CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast join to part + conditional agg."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    zero = F.lit(0).cast(DECM)
    return joined.agg(
        dsum(F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero), "promo_revenue"),
        dsum(_disc_price(), "total_revenue"),
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join (no row multiplication),
    then count by priority."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q17_small_quantity",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_price,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part_avg pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average (small-quantity
    orders below half their part's mean). The correlated scalar subquery
    becomes an agg + self-join — the avg side is part-cardinality (small)
    → broadcast; the fact side never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.round(F.sum(dec("l_quantity")), 2).cast("double") / F.count("*")).alias(
            "avg_qty"
        )
    )
    pa = F.broadcast(part_avg.withColumnRenamed("l_partkey", "pa_partkey"))
    return (
        li.join(pa, li.l_partkey == pa.pa_partkey)
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum(dec("l_extendedprice"), "total_price"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q19_disjunctive_join",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size <= 20 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_type = 'PROMO' AND l.l_quantity >= 25)
    """,
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join with a disjunction of cross-table
    predicate branches (the OR can't push below the join; the equi-key
    still drives a hash join — broadcast, since part is a dim)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 10)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size") <= 20)
        & F.col("l_quantity").between(10, 30)
    ) | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 25))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dsum(_disc_price(), "revenue"), F.count("*").alias("n_items"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT custkey, c_name, nation, revenue FROM (
      SELECT c.c_custkey AS custkey, c.c_name, n.n_name AS nation,
             CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
             ROW_NUMBER() OVER (ORDER BY CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) DESC,
                                c.c_custkey) AS rn
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    ) WHERE rn <= 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers.
    Join order: lineitem filtered on returnflag (pushed to scan) drives;
    customer/nation broadcast. Top-k via ``orderBy().limit(20)`` so Catalyst
    plans TakeOrderedAndProject — per-partition heaps + a 20-row driver
    merge — instead of an unpartitioned ``row_number`` window that would
    funnel every per-customer aggregate through ONE task at scale
    (plan pinned in tests/test_plans.py)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name"),
            F.col("n_name").alias("nation"),
        )
        .agg(dsum(_disc_price(), "revenue"))
    )
    return (
        rev.orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
        .select("custkey", "c_name", "nation", "revenue")
    )


@query(
    "market_share",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS yr,
             n.n_name AS nation,
             CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT yr, nation, revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY yr), 9) AS share
    FROM rev
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year national revenue share — aggregation then a
    window over the aggregate (share of yearly total). The window input is
    the already-rounded double revenue; the yearly total's float sum can
    differ in the last ulp across engines, so the share is rounded to 9dp
    on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("n_name").alias("nation"),
        )
        .agg(dsum(_disc_price(), "revenue"))
    )
    w = Window.partitionBy("yr")
    return rev.select(
        "yr",
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 9).alias("share"),
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey AS nationkey, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY c.c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global positive-balance average)
    + NOT EXISTS anti join + aggregate — three subquery flavors composed.
    (The anti-join predicate is 'no jumbo order' rather than 'no orders' —
    at these SFs every customer has orders and the classic form is empty.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (F.round(F.sum(dec("c_acctbal")), 2).cast("double") / F.count("*")).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum(dec("c_acctbal"), "total_bal"),
        )
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS yr,
           CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between a nation pair — the
    same dim (nation) joined twice under different roles, with a disjunctive
    cross-role predicate that only becomes checkable after both joins.
    Both nation joins broadcast; orders⋈lineitem is the one big shuffle."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(dsum(_disc_price(), "revenue"))
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS yr,
           CAST(ROUND(SUM({_SQL_DISC_PRICE}
                 - CAST(0.2 AS DECIMAL(12,4)) * CAST(p.p_retailprice AS DECIMAL(12,4))
                   * CAST(l.l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type IN ('ECONOMY', 'PROMO')
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year. The testdata
    has no partsupp, so unit cost is modeled as 20% of p_retailprice — the
    plan shape (fact ⋈ 3 broadcast dims, arithmetic inside the agg) is the
    point. Decimal money path keeps both engines order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_type").isin("ECONOMY", "PROMO")
    )
    n = load_table(spark, sf_dir, "nation")
    profit = _disc_price() - F.lit(0.2).cast(DECM) * decm("p_retailprice") * decm(
        "l_quantity"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(dsum(profit, "profit"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH sales AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS yr,
             n2.n_name AS supp_nation,
             {_SQL_DISC_PRICE} AS volume
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT yr,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(12,4)) END), 2) AS DOUBLE)
             AS nation_revenue,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_revenue,
           CAST(ROUND(
             CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                 ELSE CAST(0 AS DECIMAL(12,4)) END), 2) AS DOUBLE)
             * 100.0
             / CAST(ROUND(SUM(volume), 2) AS DOUBLE), 4) AS DOUBLE)
             AS mkt_share_pct
    FROM sales GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share) — the last of the 22 TPC-H
    queries without an analog here: one nation's share of PROMO-part
    revenue sold into the AMERICA region per order year. The dim chain
    (customer→nation→region for the market, supplier→nation for the
    share) broadcasts end to end; lineitem⋈orders is the only shuffle;
    the conditional share numerator folds inside the same partial agg as
    the denominator (one pass, no second scan). Money stays decimal
    until the final cents round; the share division happens on the two
    EXACT rounded doubles (one IEEE division, order-independent in both
    engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _disc_price()
    num = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast(DECM)
    )
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(dsum(num, "nation_revenue"), dsum(vol, "total_revenue"))
    )
    return agg.select(
        "yr",
        "nation_revenue",
        "total_revenue",
        F.round(
            F.col("nation_revenue") * 100.0 / F.col("total_revenue"), 4
        ).alias("mkt_share_pct"),
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + dual conditional counts (CASE inside SUM)
    split by order priority. (Testdata has no l_shipmode; l_linestatus
    stands in as the grouping column — the operator under test is the
    conditional aggregation, not the column.)"""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_count",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 2, 3, 4, 5)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute bucket,
    minus an excluded-supplier NOT IN subquery (negative account balance
    standing in for the complaints filter; the testdata has no partsupp, so
    lineitem is the part↔supplier bridge). NOT IN on a non-nullable key →
    left-anti broadcast join; count distinct expands then de-dups map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l.*, o.o_orderdate FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name AS s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 45 DAY
      AND EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l3.o_orderdate + INTERVAL 45 DAY)
    GROUP BY 1
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on multi-supplier finished
    orders — EXISTS (another supplier touched the order) composed with NOT
    EXISTS (no OTHER supplier was late). Late = shipped >45 days after the
    order date (testdata has no commit/receipt dates). Both subqueries are
    self-semi/anti joins on the same filtered fact, shuffled once on
    orderkey and reused; supplier is broadcast."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
        )
    )
    l1 = late.where(F.col("is_late")).select("l_orderkey", "l_suppkey")
    other = late.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = late.where(F.col("is_late")).select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = (
        l1.join(
            other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        ).join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("s_name"))
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey AS suppkey,
             CAST(ROUND(SUM({_SQL_DISC_PRICE}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN srev r ON s.s_suppkey = r.suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM srev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + scalar MAX subquery + equality join back
    (returns ALL suppliers tied at the max — deliberately not top-1-by-
    row_number; the tie semantics are part of the operator)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    srev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        dsum(_disc_price(), "total_revenue")
    )
    mx = srev.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(srev, s.s_suppkey == srev.suppkey)
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH value AS (
      SELECT l.l_partkey AS partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY 1
    )
    SELECT partkey, CAST(ROUND(v, 2) AS DOUBLE) AS value
    FROM value
    WHERE v * 2000 > (SELECT SUM(v) FROM value)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's
    suppliers, kept only where it exceeds a fraction (1/2000) of the
    nation-wide total — a HAVING against a scalar subquery over the SAME
    aggregate. (Testdata has no partsupp; lineitem extendedprice is the
    value proxy.) The threshold compare is v*2000 > total in exact
    decimals, so both engines decide borderline parts identically.
    Plan: supplier⋈nation broadcast onto lineitem, one shuffle on
    partkey; the global total is a broadcast scalar, not a second pass
    over lineitem at the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    value = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec("l_extendedprice")).alias("v"))
    )
    total = value.agg(F.sum("v").alias("total"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("v") * 2000 > F.col("total"))
        .select("partkey", F.round("v", 2).cast("double").alias("value"))
    )


@query(
    "q20_promotion_supplier",
    oracle="""
    SELECT s.s_name AS s_name, s.s_acctbal AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING 2 * SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                             AND l.l_shipdate <  TIMESTAMP '1998-01-01'
                            THEN CAST(l.l_quantity AS DECIMAL(18,4))
                            ELSE CAST(0 AS DECIMAL(18,4)) END)
             > SUM(CAST(l.l_quantity AS DECIMAL(18,4)))
      )
    """,
)
def q20_promotion_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers (in one nation)
    having some '%bolt%' part whose 1997 shipments exceed half that
    (supplier, part) pair's all-time quantity. (Testdata has no
    partsupp.ps_availqty; the classic availqty>½·year-demand correlated
    subquery becomes a dual-aggregate HAVING over the same group.) The
    compare is 2·q97 > total in exact decimals — borderline pairs decide
    identically in both engines.
    Plan: part filter broadcasts onto lineitem (one shuffle on the
    (suppkey, partkey) group key, both sums in one partial agg), then the
    qualifying-supplier set broadcasts as a left-semi onto the small
    supplier⋈nation side — lineitem is scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    zero = F.lit(0).cast(DEC)
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in97, dec("l_quantity")).otherwise(zero)).alias("q97"),
            F.sum(dec("l_quantity")).alias("qtotal"),
        )
        .where(F.col("q97") * 2 > F.col("qtotal"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(pairs, s.s_suppkey == pairs.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )
