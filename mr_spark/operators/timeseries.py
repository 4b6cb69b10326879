"""Time-series + behavioral analytics over ``events`` / ``orders``:
linear trend regression, z-score anomaly flagging, calendar gap-fill with
forward-fill, event-type co-occurrence (market-basket support/lift), and
session path mining (top n-gram journeys).

Determinism strategy (shared with stat_aggregates): every aggregate is an
exact integer/decimal moment sum; floats appear only in a final handful of
ops (one division, one sqrt/ln) applied to identical integers on both
engines, then rounded. No float accumulation order anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query

# Daily event counts per type: the shared base relation for trend/anomaly.
_DAILY_SQL = """
  daily AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
  )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))


@query(
    "regression_trend",
    oracle=f"""
    WITH {_DAILY_SQL},
    m AS (
      SELECT event_type,
             COUNT(*) AS n_days,
             SUM(CAST(date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) AS BIGINT)) AS sx,
             SUM(n) AS sy,
             SUM(CAST(date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) AS BIGINT)
                 * CAST(date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) AS BIGINT)) AS sxx,
             SUM(CAST(date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) AS BIGINT) * n) AS sxy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE)
                 / CAST(n_days * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n_days * sxx - sx * sx AS DOUBLE), 6) AS intercept
    FROM m
    """,
)
def regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of daily volume: OLS slope/intercept of
    count-per-day vs day index, via the closed-form moment formula on EXACT
    bigint sums (x = days since a fixed epoch, y = daily count — both
    integers, so sx/sy/sxx/sxy are associative integer sums; the only float
    op is the final division). The in-plan analog of regr_slope/intercept —
    those builtins accumulate floats order-dependently and can't be matched
    across engines. One shuffle (the groupBy); scales as a pure two-level
    aggregation."""
    daily = _daily(spark, sf_dir)
    x = F.datediff(F.col("day").cast("date"), F.lit("2024-01-01").cast("date")).cast(
        "bigint"
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum(x).alias("sx"),
        F.sum("n").alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * F.col("n")).alias("sxy"),
    )
    n, sx, sy = F.col("n_days"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    den = (n * sxx - sx * sx).cast("double")
    return m.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.round((n * sxy - sx * sy).cast("double") / den, 6).alias("slope"),
        F.round((sy * sxx - sx * sxy).cast("double") / den, 6).alias("intercept"),
    )


@query(
    "anomaly_days",
    oracle=f"""
    WITH {_DAILY_SQL},
    st AS (
      SELECT event_type, COUNT(*) AS c, SUM(n) AS s, SUM(n * n) AS ss
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n_events,
           CASE WHEN st.c * st.ss - st.s * st.s = 0 THEN NULL
                ELSE ROUND(CAST(d.n * st.c - st.s AS DOUBLE)
                           / sqrt(CAST(st.c * st.ss - st.s * st.s AS DOUBLE)), 6)
           END AS z,
           CASE WHEN st.c * st.ss - st.s * st.s = 0 THEN NULL
                ELSE abs(CAST(d.n * st.c - st.s AS DOUBLE)
                         / sqrt(CAST(st.c * st.ss - st.s * st.s AS DOUBLE))) > 2.0
           END AS is_anomaly
    FROM daily d JOIN st ON d.event_type = st.event_type
    """,
)
def anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly flagging: z-score of each day's event count against
    that type's population mean/stddev. Algebra is rearranged so the sqrt
    argument is a single integer — z = (n·c − s) / sqrt(c·ss − s²) — making
    the float path one sqrt + one division on identical inputs.
    The per-type stats are 5 rows → broadcast joined back (no second
    shuffle of the daily relation)."""
    daily = _daily(spark, sf_dir)
    st = daily.groupBy("event_type").agg(
        F.count("*").alias("c"), F.sum("n").alias("s"), F.sum(F.col("n") * F.col("n")).alias("ss")
    )
    j = daily.join(F.broadcast(st), "event_type")
    var_arg = (F.col("c") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
    z_raw = (F.col("n") * F.col("c") - F.col("s")).cast("double") / F.sqrt(var_arg)
    zero = (F.col("c") * F.col("ss") - F.col("s") * F.col("s")) == 0
    return j.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n_events"),
        F.when(zero, F.lit(None)).otherwise(F.round(z_raw, 6)).alias("z"),
        F.when(zero, F.lit(None).cast("boolean"))
        .otherwise(F.abs(z_raw) > 2.0)
        .alias("is_anomaly"),
    )


@query(
    "gapfill_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(
               (SELECT MIN(day) FROM daily),
               (SELECT MAX(day) FROM daily),
               INTERVAL 1 DAY)) AS DATE) AS day
    )
    SELECT CAST(s.day AS TIMESTAMP) AS day,
           CAST(COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders,
           d.day IS NULL AS is_gap,
           last_value(d.revenue IGNORE NULLS)
             OVER (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS revenue_ffill
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def gapfill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: a generated calendar spine (sequence over the
    observed min..max date) LEFT-joined to daily order revenue, missing
    counts zero-filled and revenue forward-filled (last non-null over the
    ordered spine). The unpartitioned window runs on the POST-AGGREGATION
    spine — bounded by calendar days (a few thousand rows regardless of
    fact-table size), not by the 100 TB fact table; the heavy relation only
    ever sees one groupBy shuffle. For multi-decade × per-key spines,
    partition the window by key (per-key calendars are independent)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue"),
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    j = spine.join(daily.withColumnRenamed("day", "dday"), spine.day == F.col("dday"), "left")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        F.col("day").cast("timestamp").alias("day"),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.col("dday").isNull().alias("is_gap"),
        F.last("revenue", ignorenulls=True).over(w).alias("revenue_ffill"),
    )


@query(
    "event_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2
      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    ),
    sup AS (SELECT t1, t2, COUNT(*) AS support FROM pairs GROUP BY 1, 2),
    tc AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
    nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM ut)
    SELECT sup.t1, sup.t2, CAST(sup.support AS BIGINT) AS support,
           ROUND(CAST(sup.support * nu.n AS DOUBLE)
                 / CAST(c1.c * c2.c AS DOUBLE), 6) AS lift
    FROM sup, nu
    JOIN tc c1 ON sup.t1 = c1.event_type
    JOIN tc c2 ON sup.t2 = c2.event_type
    """,
)
def event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for every unordered event-type pair,
    how many users did both (support) and the independence-normalized lift.
    Pair generation is ROW-SIDE (nested transform over each user's sorted
    distinct-type array, then explode) — one shuffle to build per-user
    sets, no self-join of the user×type relation; the oracle's equivalent
    self-join is the semantics, not the plan. Type marginals (|types| rows)
    broadcast back; lift = support·N / (c1·c2) on exact integers."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", "event_type")
        .distinct()
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("a"))
        .where(F.size("a") >= 2)
    )
    a = F.col("a")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(a) - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size(a) - 1),
                lambda j: F.struct(
                    F.element_at(a, i + 1).alias("t1"), F.element_at(a, j + 1).alias("t2")
                ),
            ),
        )
    )
    sup = (
        per_user.select(F.explode(pairs).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("support"))
    )
    ut = ev.select("user_id", "event_type").distinct()
    tc = ut.groupBy("event_type").agg(F.count("*").alias("c"))
    nu = ut.agg(F.countDistinct("user_id").alias("n"))
    c1 = tc.select(F.col("event_type").alias("t1"), F.col("c").alias("c1"))
    c2 = tc.select(F.col("event_type").alias("t2"), F.col("c").alias("c2"))
    return (
        sup.join(F.broadcast(c1), "t1")
        .join(F.broadcast(c2), "t2")
        .crossJoin(F.broadcast(nu))
        .select(
            "t1",
            "t2",
            F.col("support").cast("bigint").alias("support"),
            F.round(
                (F.col("support") * F.col("n")).cast("double")
                / (F.col("c1") * F.col("c2")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


@query(
    "session_paths",
    oracle="""
    WITH ev AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
    flagged AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, event_id, event_type, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    sess AS (
      SELECT user_id, sid, list(event_type ORDER BY ts, event_id) AS types
      FROM islands GROUP BY user_id, sid
    ),
    paths AS (
      SELECT user_id, sid,
             unnest(list_transform(generate_series(1, len(types) - 2),
                    i -> types[i] || '>' || types[i+1] || '>' || types[i+2])) AS path
      FROM sess WHERE len(types) >= 3
    )
    SELECT path, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT (user_id, sid)) AS n_sessions
    FROM paths GROUP BY path
    """,
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: 30-minute gap sessionization (the same
    gaps-and-islands as `sessionization`), then every length-3 event-type
    path within a session, counted by occurrence and by distinct session.
    Per-session ordering comes from array_sort over (ts, event_id, type)
    structs — a total order, so collect_list's nondeterministic arrival
    order is irrelevant. Path explosion is row-side; the only shuffles are
    the two windows (same key — one exchange) and the final path count."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(gap_us.isNull() | (gap_us > 1800), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sess = (
        islands.groupBy("user_id", "sid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s.event_type,
            ).alias("types")
        )
        .where(F.size("types") >= 3)
    )
    t = F.col("types")
    paths = sess.select(
        "user_id",
        "sid",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 3),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at(t, i + 1),
                    F.element_at(t, i + 2),
                    F.element_at(t, i + 3),
                ),
            )
        ).alias("path"),
    )
    return paths.groupBy("path").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("user_id", "sid").alias("n_sessions"),
    )


_EWMA_ALPHA = 0.3


@query(
    "ewma_daily",
    oracle=f"""
    WITH {_DAILY_SQL},
    j AS (
      SELECT t.event_type, t.day, t.n,
             CAST(date_diff('day', CAST(i.day AS DATE), CAST(t.day AS DATE))
                  AS BIGINT) AS dd,
             i.n AS ni, i.day AS day_i
      FROM daily t JOIN daily i
        ON t.event_type = i.event_type AND i.day <= t.day
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
           ROUND(SUM(pow({1 - _EWMA_ALPHA}, dd) * ni ORDER BY day_i)
                 / SUM(pow({1 - _EWMA_ALPHA}, dd) ORDER BY day_i), 6) AS ewma
    FROM j GROUP BY event_type, day, n
    """,
)
def ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume
    (α=0.3, adjust=True normalization: Σw·x/Σw over the full history) —
    the smoothing baseline `anomaly_days` z-scores against raw counts
    lack. Weights pow(0.7, Δdays) are identical float expressions on
    both engines; numerator and denominator are FIXED-ORDER folds over
    the day-sorted history (Spark array fold == DuckDB ordered SUM, the
    infometrics pattern). The self-join is per-type over the POST-AGG
    daily relation — O(days²) per type on a calendar-bounded input, not
    the fact table; decade-long series would switch to the per-key
    sorted-array recurrence (same fold, one pass)."""
    daily = _daily(spark, sf_dir)
    t, i = daily.alias("t"), daily.alias("i")
    j = t.join(
        i,
        (F.col("t.event_type") == F.col("i.event_type"))
        & (F.col("i.day") <= F.col("t.day")),
    ).select(
        F.col("t.event_type").alias("event_type"),
        F.col("t.day").alias("day"),
        F.col("t.n").alias("n"),
        F.datediff(F.col("t.day").cast("date"), F.col("i.day").cast("date"))
        .cast("bigint")
        .alias("dd"),
        F.col("i.n").alias("ni"),
        F.col("i.day").alias("day_i"),
    )
    a = j.groupBy("event_type", "day", "n").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day_i", "dd", "ni"))),
            F.lit(0.0),
            lambda acc, x: acc + F.pow(F.lit(1 - _EWMA_ALPHA), x["dd"]) * x["ni"],
        ).alias("num"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day_i", "dd", "ni"))),
            F.lit(0.0),
            lambda acc, x: acc + F.pow(F.lit(1 - _EWMA_ALPHA), x["dd"]),
        ).alias("den"),
    )
    return a.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("num") / F.col("den"), 6).alias("ewma"),
    )
