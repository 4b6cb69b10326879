"""General analytics operators (Tier B extensions): window functions,
top-k per group, set operations, rollup/grouping-sets, pivot,
sessionization, as-of join, range join, exact percentiles, JSON access,
datetime + string scalar functions.

The reference has none of these (SURVEY.md §2c) — they are the scale-ready
operator surface the driver's north star mandates. Each has a DuckDB oracle
twin; determinism is engineered in (decimal money sums, total orderings for
window/ntile/top-k, integer-sum-then-divide for averages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query
from .tpch import DEC, dec, dsum


@query(
    "top_k_per_group",
    oracle="""
    SELECT * FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 5
    """,
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 line items per return flag. Window + row_number with a TOTAL
    ordering (price desc, orderkey, linenumber) so ties are deterministic.
    At scale: single shuffle on the partition key; AQE coalesces."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend. Decimal accumulation → order-independent
    values; (orderdate, orderkey) is a total order within customer."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "lag_lead_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(EXTRACT(EPOCH FROM o_orderdate
                 - LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey))
                AS BIGINT) AS secs_since_prev
    FROM orders
    """,
)
def lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — seconds between a customer's consecutive orders."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.unix_timestamp("o_orderdate") - F.unix_timestamp(prev))
        .cast("bigint")
        .alias("secs_since_prev"),
    )


@query(
    "ntile_quartiles",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
    FROM customer
    """,
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) over a total order, WITHOUT the single-partition sort a bare
    ``Window.orderBy`` implies. Global rank is computed range-binned exactly
    as `equidepth_histogram` (distributions.py) does: 1000 coarse acctbal
    bins (bounds from one min/max agg), tiny per-bin counts give broadcast
    exclusive prefix offsets, and the intra-bin row_number window shuffles
    only on bin id — every corpus-sized exchange is parallel. The NTILE
    bucket is then closed-form from (rank, n): with q = n div 4, r = n mod 4
    the first r buckets get q+1 rows (SQL NTILE semantics, larger buckets
    first):  bucket = ceil(rank/(q+1)) while rank ≤ r·(q+1), else
    r + ceil((rank − r·(q+1))/q). Ranks are total (c_custkey tie-break), so
    this matches the oracle's NTILE bit-for-bit; equality against the exact
    window form is pinned in tests/test_insights.py."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("v")
    )
    nbins = 1000
    bounds = c.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("n")
    )
    binned = c.crossJoin(F.broadcast(bounds)).withColumn(
        "bin",
        F.when(
            F.col("hi") == F.col("lo"), F.lit(0)
        ).otherwise(
            F.least(
                F.lit(nbins - 1),
                F.floor(
                    (F.col("v") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / nbins)
                ),
            )
        ).cast("bigint"),
    )
    off_w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        binned.groupBy("bin")
        .agg(F.count("*").alias("c"))
        .select("bin", F.coalesce(F.sum("c").over(off_w), F.lit(0)).alias("off"))
    )
    intra_w = Window.partitionBy("bin").orderBy("v", "c_custkey")
    ranked = binned.join(F.broadcast(offsets), "bin").withColumn(
        "rnk", F.col("off") + F.row_number().over(intra_w)
    )
    q = (F.col("n") / 4).cast("bigint")  # floor-div bucket base size
    r = F.col("n") % 4
    big_span = r * (q + 1)  # rows covered by the r larger buckets
    bucket = F.when(
        F.col("rnk") <= big_span, F.ceil(F.col("rnk") / (q + 1))
    ).otherwise(r + F.ceil((F.col("rnk") - big_span) / q))
    return ranked.select("c_custkey", bucket.cast("int").alias("quartile"))


@query(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi countDistinct — Catalyst expands to expand+two-phase agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@query(
    "set_ops",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT: customers with both finished and open orders but
    no jumbo order. (SQL set ops bind left-assoc; mirrored exactly.)"""
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    big = o.where(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("custkey"))
    return f_cust.intersect(o_cust).exceptAll(big.distinct()).distinct()


@query(
    "anti_semi_join",
    oracle="""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_customers_no_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def anti_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join; counts customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_customers_no_orders"))
    )


@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers (distinguish rollup-null from data-null)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count("*").alias("n"),
        dsum(dec("l_quantity"), "sum_qty"),
    )


@query(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two order dimensions."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_st"),
        F.grouping("o_orderpriority").cast("int").alias("g_pr"),
        F.count("*").alias("n"),
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'view')     AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS signup,
           COUNT(*) FILTER (event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts. Values list is pinned so the
    output schema is static (required for a plannable query at scale —
    dynamic pivot needs a driver-side distinct first)."""
    ev = load_table(spark, sf_dir, "events")
    piv = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    # pivot yields NULL for absent combos; FILTER yields 0 — align on 0.
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


@query(
    "sessionization",
    oracle="""
    WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize events with a 30-min inactivity gap: lag + flag + count.
    One shuffle on user_id; the classic gaps-and-islands plan."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_us = F.unix_micros("ts") - F.unix_micros(prev)  # exact µs, no truncation
    flagged = ev.select(
        "user_id",
        F.when(prev.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0).alias("is_new"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("is_new").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "asof_join",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         purchases AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
         clicks    AS (SELECT user_id, ts AS click_ts FROM ev WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, MAX(c.click_ts) AS last_click_ts
    FROM purchases p LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.click_ts <= p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each purchase, the most
    recent click by the same user at/before its timestamp.

    Implemented scale-first as union + carry-forward window (ONE shuffle on
    user_id, no range join): tag both streams, sort (user, ts, clicks-first),
    propagate last click ts, keep purchases. Equivalent to the oracle's
    MAX(click_ts <= ts) formulation."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("is_click"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_click")
    )
    unioned = clicks.unionByName(purchases)
    # clicks sort before purchases at equal ts → '<=' semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("is_click") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.where(F.col("is_click") == 0).select(
        "event_id", "user_id", "ts", "last_click_ts"
    )


@query(
    "range_join",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT e.event_id, COUNT(c.event_id) AS clicks_prev_hour
    FROM ev e
    LEFT JOIN ev c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts < e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: clicks by the same user in the hour before each
    error. Equi-join on user_id carries the plan (hash join), the time range
    is a post-join filter — at 100 TB add a coarse time-bucket key to both
    sides to keep the per-key fan-in bounded."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = errors.join(
        clicks,
        (errors.user_id == clicks.c_user_id)
        & (clicks.c_ts >= errors.ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts < errors.ts),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("c_event_id").alias("clicks_prev_hour")
    )


@query(
    "exact_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(MIN(value), 6) AS vmin,
           ROUND(MAX(value), 6) AS vmax
    FROM events GROUP BY event_type
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear interpolation at
    p*(n-1)). Rounded to 6dp — interpolation arithmetic is the one place
    float op order can differ. At 100 TB swap in percentile_approx."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS DOUBLE) / COUNT(*) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access on a string column. Integer sum + explicit divide →
    deterministic average (no float accumulation order)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.count("*").alias("n"),
        (F.sum(k).cast("double") / F.count("*")).alias("avg_k"),
    )


@query(
    "events_per_day",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def events_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime bucketing: daily event rollup (date_trunc both sides)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(dec("value"), "total_value"),
    )


@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 5) AS name_pfx,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           REVERSE(p_type) AS type_rev,
           CONCAT(p_brand, '-', p_type) AS brand_type,
           REPLACE(p_name, 'a', '@') AS name_rep,
           CAST(STRPOS(p_name, 'e') AS BIGINT) AS first_e
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function battery (upper/substr/length/reverse/concat/
    replace/locate) — all JVM built-ins, whole-stage codegen'd."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.reverse("p_type").alias("type_rev"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_rep"),
        F.locate("e", F.col("p_name")).cast("bigint").alias("first_e"),
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL (two disjoint grouping columns)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("mrspark_customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_bal
        FROM mrspark_customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@query(
    "event_funnel",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
    v AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT ev.user_id, MIN(ev.ts) AS t2
          FROM ev JOIN v ON ev.user_id = v.user_id
          WHERE ev.event_type = 'click' AND ev.ts > v.t1 GROUP BY ev.user_id),
    p AS (SELECT ev.user_id, MIN(ev.ts) AS t3
          FROM ev JOIN c ON ev.user_id = c.user_id
          WHERE ev.event_type = 'purchase' AND ev.ts > c.t2 GROUP BY ev.user_id)
    SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase, strict
    timestamp order per user): each step's user count requires the
    earliest qualifying event AFTER the previous step's — the sequential
    min-chain that plain per-type aggregation gets wrong (a click before
    the first view must not count).

    Plan: three filtered aggregations chained by equi-joins on user_id —
    every join keys on the user shuffle, each stage's output is
    user-cardinality (shrinking), and all aggs combine map-side. The
    standard product-analytics funnel at any scale."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def _cnt(df, step):
        return df.agg(
            F.lit(step).alias("step"), F.count("*").cast("bigint").alias("n_users")
        )
    return _cnt(v, "1_view").unionAll(_cnt(c, "2_click")).unionAll(
        _cnt(p, "3_purchase")
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    first AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM ev GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
            FROM ev)
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM act JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each subsequent activity week — the (cohort_week, week_offset)
    triangle every growth dashboard draws. Week offsets are exact integer
    day-diffs of week-truncated timestamps divided by 7.

    Plan: one user-level min agg, one distinct (user, week) projection,
    an equi-join on user_id, and a (cohort, offset) agg — two
    user-keyed shuffles plus one metadata-sized one."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        act.join(first, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
