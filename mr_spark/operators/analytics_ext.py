"""Second wave of analytics operators: subquery shapes (scalar, IN,
correlated-min via window), HAVING, count-distribution (Q13), global sort
with LIMIT/OFFSET, array & map functions, unpivot/stack, date arithmetic,
CASE bucketing, and an approx-distinct sketch entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query
from .tpch import dec, dsum


@query(
    "min_cost_supplier",
    oracle="""
    SELECT l_partkey, s_suppkey, s_acctbal FROM (
      SELECT l.l_partkey, s.s_suppkey, s.s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY l.l_partkey
                                ORDER BY s.s_acctbal, s.s_suppkey) AS rn
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ) WHERE rn = 1
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-min shape: per part, the cheapest supplier
    that ships it — distinct part-supplier pairs, broadcast supplier join,
    per-part argmin via window (total order: acctbal, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("l_partkey", "s_suppkey", "s_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "q13_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation over a LEFT join (customers with
    zero orders count at n_orders=0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@query(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4))) > 120
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg + HAVING on the aggregate (post-agg filter).
    The HAVING compares the DECIMAL sum (exact) — the rounded double is
    only the output column."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(
            dsum(dec("l_quantity"), "total_qty"),
            F.sum(dec("l_quantity")).alias("_exact_qty"),
        )
        .where(F.col("_exact_qty") > 120)
        .drop("_exact_qty")
    )


@query(
    "scalar_subquery",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_above_avg
    FROM lineitem
    WHERE l_extendedprice >
          (SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                  / COUNT(*)
           FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: rows above the global average price. The average is
    computed deterministically (decimal sum / count) and broadcast as a
    one-row cross join — exactly what Catalyst rewrites a scalar subquery
    into."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_df = li.agg(
        (F.round(F.sum(dec("l_extendedprice")), 2).cast("double") / F.count("*")).alias(
            "avg_price"
        )
    )
    return (
        li.crossJoin(F.broadcast(avg_df))
        .where(F.col("l_extendedprice") > F.col("avg_price"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_above_avg"))
    )


@query(
    "in_subquery",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY o_orderpriority
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join against the filtered build side."""
    o = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    return (
        o.join(F.broadcast(rich), o.o_custkey == rich.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 5
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + LIMIT/OFFSET pagination (total order → deterministic
    page). Catalyst plans limit+offset as TakeOrdered — no full sort
    materialization."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(5)
        .limit(15)
    )


@query(
    "array_funcs",
    oracle="""
    SELECT l_returnflag,
           list_aggregate(list_sort(list(DISTINCT l_linestatus)), 'string_agg', ',')
             AS statuses,
           CAST(len(list(DISTINCT l_linestatus)) AS INT) AS n_statuses,
           list_contains(list(DISTINCT l_linestatus), 'O') AS has_open,
           list_sort(list(DISTINCT l_linestatus))[1] AS first_status
    FROM lineitem GROUP BY l_returnflag
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery: collect_set → sort_array, size,
    array_contains, element access. The array itself is emitted joined to a
    string — comparator-friendly output, array ops still exercised."""
    li = load_table(spark, sf_dir, "lineitem")
    statuses = F.sort_array(F.collect_set("l_linestatus"))
    return li.groupBy("l_returnflag").agg(
        F.array_join(statuses, ",").alias("statuses"),
        F.size(F.collect_set("l_linestatus")).cast("int").alias("n_statuses"),
        F.array_contains(statuses, "O").alias("has_open"),
        F.element_at(statuses, 1).alias("first_status"),
    )


@query(
    "map_funcs",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(cardinality(map_from_entries(
                  list({'key': event_type, 'value': n} ORDER BY event_type))) AS INT)
             AS n_types,
           map_extract(map_from_entries(
                  list({'key': event_type, 'value': n} ORDER BY event_type)),
                       'click')[1] AS clicks
    FROM per_type GROUP BY user_id
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + lookup: per-user event_type→count map
    (map_from_entries over a sorted entry list), size + key access."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    entries = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("event_type", "n")))
    )
    return per_type.groupBy("user_id").agg(
        F.size(entries).cast("int").alias("n_types"),
        F.element_at(entries, "click").alias("clicks"),
    )


@query(
    "unpivot_metrics",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack() — the inverse of pivot."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "val"),
    )


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
           CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS dow_sun0,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT)
             AS days_to_y2k
    FROM orders
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function battery. Cross-engine parity notes: Spark
    dayofweek is 1=Sunday vs DuckDB dow 0=Sunday (offset by 1);
    datediff(end, start) ↔ date_diff('day', start, end)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow_sun0"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_y2k"),
    )


@query(
    "case_bucketing",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS bucket,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + two-column group."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
    )
    return ev.groupBy(bucket.alias("bucket"), F.col("event_type")).agg(
        F.count("*").alias("n")
    )


@query("approx_distinct_sketch", oracle=None)  # HLL sketches are
# engine-specific (Spark HLL++ vs DuckDB HLL) → rows-only; exact twin is
# covered by distinct_agg.
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB cardinality path —
    constant memory vs countDistinct's expand+shuffle. Output includes the
    exact count so the error is visible."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count("*").alias("n_rows"),
    )


@query(
    "stream_sessionize_stateful",
    oracle="""
    WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM islands GROUP BY user_id, sid
    """,
)
def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-sessionization as a CUSTOM STATEFUL STREAMING OPERATOR
    (applyInPandasWithState, event-time timeout) run over the events file
    stream and drained synchronously — the applyInPandasWithState
    counterpart of the `sessionization` batch query.

    A sentinel event far past the data (user_id −1, fed as the LAST
    micro-batch from a temp copy of the stream) advances the global
    watermark so every open session times out and emits — making the
    COMPLETE session set comparable to the batch gaps-and-islands oracle,
    timeout path included.

    The sentinel file and max(ts) come from pyarrow (footer statistics +
    a direct one-row parquet write) — the previous Spark-side
    createDataFrame→write of the single row cost ~5 s of the query's
    runtime in driver-side jobs."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from ..streaming import events_file_stream, run_to_completion, sessionize_stateful

    from ._demo import mkdtemp_scratch

    src = _os.path.join(sf_dir, "events.parquet")
    stream_dir = mkdtemp_scratch("mrspark_sessionize_")
    _shutil.copy(src, _os.path.join(stream_dir, "batch_0.parquet"))

    pf = _pq.ParquetFile(src)
    ts_idx = pf.schema_arrow.get_field_index("ts")
    max_ts = max(
        pf.metadata.row_group(i).column(ts_idx).statistics.max
        for i in range(pf.metadata.num_row_groups)
    )
    if isinstance(max_ts, (int, float)):
        # int64 column (TIMESTAMP(NANOS) read as epoch-ns long)
        sentinel_ts = int(max_ts) + 90 * 24 * 3600 * 1_000_000_000
    else:  # timestamp-typed stats (datetime): keep the logical type so
        # pyarrow converts to the column's own unit (us vs ns)
        import pandas as _pd

        sentinel_ts = _pd.Timestamp(max_ts) + _pd.Timedelta(days=90)
    row = {
        "event_id": -1,
        "ts": sentinel_ts,
        "user_id": -1,
        "event_type": "sentinel",
        "value": 0.0,
        "props": "{}",
    }
    sent = _pa.table(
        {f.name: _pa.array([row[f.name]], type=f.type) for f in pf.schema_arrow}
    )
    _pq.write_table(sent, _os.path.join(stream_dir, "z_sentinel.parquet"))
    # file source orders by mtime: data first, sentinel last
    _os.utime(_os.path.join(stream_dir, "batch_0.parquet"), (1_700_000_000, 1_700_000_000))
    _os.utime(_os.path.join(stream_dir, "z_sentinel.parquet"), (1_700_000_001, 1_700_000_001))

    stream = events_file_stream(spark, stream_dir, max_files_per_trigger=1)
    try:
        out = run_to_completion(
            sessionize_stateful(stream, watermark="1 minute"),
            name="mrspark_stream_sessions",
            output_mode="append",
            state_partitions=8,
        )
    finally:
        # the memory sink is fully materialized after the drain — the temp
        # source files are no longer referenced
        _shutil.rmtree(stream_dir, ignore_errors=True)
    return out.where(F.col("user_id") >= 0)


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
           SQRT(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           ROUND(LN(l_extendedprice), 6) AS ln_price,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math battery (abs/ceil/floor/sqrt/sign/mod/ln/greatest/least).
    sqrt is IEEE-correctly-rounded (identical everywhere); ln is the one
    libm-dependent op — rounded to 6dp on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "rolling_range_window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2)
             AS DOUBLE) AS spend_30d,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_orders_30d
    FROM orders
    """,
)
def rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per-customer
    trailing-30-day spend. Spark expresses the interval frame as
    rangeBetween over epoch seconds — peer rows (equal timestamps) are
    included either way, so ties don't need a break column."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(dec("o_totalprice")).over(w), 2).cast("double").alias("spend_30d"),
        F.count("*").over(w).cast("bigint").alias("n_orders_30d"),
    )


@query(
    "json_typed_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
    FROM events
    """,
)
def json_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with an explicit schema (struct
    column, not string re-extraction per field) — the 100 TB way to read a
    JSON payload column once instead of get_json_object per field."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_bucket"),
    )


@query(
    "regex_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '(fast|slow) (\\p{L}+)', 2) AS after_speed,
           regexp_matches(text, 'stream.*batch') AS has_stream_then_batch,
           CAST(len(regexp_extract_all(text, 'join')) AS BIGINT) AS n_join,
           regexp_replace(text, '\\p{L}+tion', 'X', 'g') AS replaced
    FROM documents
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery: capture-group extraction, pattern test, match count,
    global replace (Java regex ∩ RE2 syntax only, so both engines agree)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"(fast|slow) (\p{L}+)", 2).alias("after_speed"),
        F.col("text").rlike("stream.*batch").alias("has_stream_then_batch"),
        F.size(F.regexp_extract_all("text", F.lit("join"), 0))
        .cast("bigint")
        .alias("n_join"),
        F.regexp_replace("text", r"\p{L}+tion", "X").alias("replaced"),
    )


@query(
    "stat_aggregates",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sx,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))
                            * CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sxx,
             CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sy,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))
                            * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
           ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_disc
    FROM s
    """,
)
def stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / covariance via EXPLICIT moment sums in decimal
    (var_samp/covar_samp builtins accumulate floats order-dependently and
    can't match across engines; the two-pass-free moment formula from
    associative decimal sums can). Rounded to 6dp — the final float algebra
    is a handful of ops on identical inputs."""
    li = load_table(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    d = dec("l_discount")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum(q), 2).cast("double").alias("sx"),
        F.round(F.sum(q * q), 2).cast("double").alias("sxx"),
        F.round(F.sum(d), 2).cast("double").alias("sy"),
        F.round(F.sum(q * d), 2).cast("double").alias("sxy"),
    )
    n = F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    covar = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
        F.round(covar, 6).alias("covar_qty_disc"),
    )


@query(
    "window_rank_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 9) AS prnk,
           ROUND(CUME_DIST() OVER w, 9) AS cdist,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist / first_value /
    nth_value over a totally-ordered window (ratios rounded to 9dp — the
    (r-1)/(n-1) division is the only float op)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
    )


@query(
    "bucketed_fact_join",
    oracle="""
    SELECT o_orderstatus, l_returnflag, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
)
def bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join routed through the bucketed-table catalog flow
    (mr_spark.catalog.bucketed_table): the first run materializes
    orders and lineitem bucketed+sorted on the order key; every later
    run — the repeated-hourly-join scenario — reads the co-located
    copies and joins shuffle-free (SortMergeJoin with no pre-join
    exchange; plan pinned in tests/test_bucketing.py). At test scale
    Catalyst may still pick a broadcast join — that is the right plan
    for a dim-sized side and costs nothing; the bucketed route is the
    big-big case insurance AQE cannot provide after the fact."""
    from ..catalog import bucketed_table

    o = bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    li = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(F.count("*").alias("n"), dsum(dec("l_quantity"), "sum_qty"))
    )


@query(
    "time_rollup",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS month,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
             value
      FROM events
    )
    SELECT month, day, hour,
           CASE WHEN GROUPING(hour) = 0 THEN 'hour'
                WHEN GROUPING(day) = 0 THEN 'day'
                WHEN GROUPING(month) = 0 THEN 'month'
                ELSE 'all' END AS grain,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM ev GROUP BY ROLLUP(month, day, hour)
    """,
)
def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy continuous aggregate — the hypertable-rollup shape:
    hour, day, month, and grand-total grains materialized in ONE pass via
    ROLLUP over truncated timestamps (Catalyst expands to a single
    shuffle with partial aggregation; at 100 TB this replaces three
    separate scans of the fact table). Decimal-summed, so every grain is
    bit-exact against the oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    grain = (
        F.when(F.grouping("hour") == 0, F.lit("hour"))
        .when(F.grouping("day") == 0, F.lit("day"))
        .when(F.grouping("month") == 0, F.lit("month"))
        .otherwise(F.lit("all"))
    )
    return ev.rollup("month", "day", "hour").agg(
        grain.alias("grain"),
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_value"),
    )


@query(
    "lateral_topn",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-2 orders per BUILDING customer,
    written as the per-row subquery a SQL user reaches for (the
    procedural twin of `top_k_per_group`'s window form). Catalyst
    decorrelates the LIMIT subquery into a ranked join (DomainJoin →
    window), so the executed plan is the scalable one — the point of
    registering both forms is pinning that the rewrite exists and agrees
    with the window answer. Ties break on o_orderkey; the segment filter
    pushes into the customer scan.

    The temp views are per-call-unique and dropped before returning
    (spark.sql analyzes the LATERAL eagerly, so the returned plan no
    longer references them) — fixed names would silently rebind across
    invocations with different sf_dir and outlive the call."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    cv, ov = f"lat_customer_{tag}", f"lat_orders_{tag}"
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(cv)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(ov)
    try:
        return spark.sql(
            f"""
            SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
            FROM {cv} c,
            LATERAL (SELECT o_orderkey, o_totalprice FROM {ov} o
                     WHERE o.o_custkey = c.c_custkey
                     ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
            WHERE c.c_mktsegment = 'BUILDING'
            """
        )
    finally:
        spark.catalog.dropTempView(cv)
        spark.catalog.dropTempView(ov)


_COPURCHASE_TOP = 50


@query(
    "copurchase_pairs",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT p1, p2, COUNT(*) AS support
    FROM pairs GROUP BY p1, p2
    ORDER BY support DESC, p1, p2 LIMIT {_COPURCHASE_TOP}
    """,
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-purchase mining on the FACT table: part pairs that
    appear in the same order, top-{50} by support — the
    collaborative-filtering / recommendation primitive. Pair generation
    is ROW-SIDE over each order's sorted distinct-part array (orders
    hold ≤7 parts, so ≤21 pairs per order — bounded by basket size, not
    corpus size; the oracle's self-join is the semantics, not the plan).
    One (orderkey) shuffle to build baskets, one (p1,p2) count shuffle,
    TakeOrdered top-k with full (support, p1, p2) tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("a"))
        .where(F.size("a") >= 2)
    )
    a = F.col("a")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(a) - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size(a) - 1),
                lambda j: F.struct(
                    F.element_at(a, i + 1).alias("p1"),
                    F.element_at(a, j + 1).alias("p2"),
                ),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .select("p.p1", "p.p2")
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), F.asc("p1"), F.asc("p2"))
        .limit(_COPURCHASE_TOP)
    )
