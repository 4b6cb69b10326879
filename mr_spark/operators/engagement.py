"""Product-analytics / experimentation operators over ``events``:
rolling active users (DAU/WAU), CUPED-adjusted A/B readout, and seasonal
decomposition of daily volume.

House determinism rules: metric values quantize to 1e-6 integers, all
moments run exact in DECIMAL(38,0)/HUGEINT, MA/seasonal components are
kept as exact integer numerators with denominators folded into one
final double expression — no float ever accumulates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query
from .text import _md5_lower64


@query(
    "rolling_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT CAST(d.day AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT CASE WHEN du.day = d.day THEN du.user_id END)
                AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN du ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per calendar day — the engagement
    metric pair. Sliding-window COUNT(DISTINCT) has no window-function
    form (distinct isn't decomposable), so the scalable shape EXPLODES
    each distinct (day, user) row into the ≤7 trailing day-buckets it
    contributes to (a Generate, linear in the input) and equi-joins the
    bucket day against the observed-day spine (broadcast hash join —
    bounded rows; this also drops buckets past the horizon). The naive
    alternative — a day BETWEEN d−6 AND d range join — compiles to a
    BroadcastNestedLoopJoin that tests every day-user row against every
    spine day: quadratic in days, ~150× wasted predicate work at a
    3-year horizon. One exact distinct agg per bucket day; all
    integers."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select(F.col("day").alias("d")).distinct()
    exploded = du.select(
        "day",
        "user_id",
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("d"),
    )
    j = exploded.join(F.broadcast(days), "d")
    return j.groupBy("d").agg(
        F.countDistinct(F.when(F.col("day") == F.col("d"), F.col("user_id")))
        .cast("bigint")
        .alias("dau"),
        F.countDistinct("user_id").cast("bigint").alias("wau"),
    ).select(F.col("d").cast("timestamp").alias("day"), "dau", "wau")


_CUPED_SPLIT_DAY = 16  # pre-period: days 1-15; post: 16+


def _ab_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared A/B prep for cuped_adjusted_ab and welch_ttest_ab: per-user
    pre/post quantized metric sums (x, y) and the content-hash variant.
    One definition keeps the two readouts describing the SAME experiment
    split — a drifted copy would silently desynchronize the t-test from
    the CUPED estimate it pairs with."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.dayofmonth("ts").alias("dom"),
        F.round(F.col("value") * 1000000, 0).cast("bigint").alias("qv"),
    )
    pre = F.when(F.col("dom") < _CUPED_SPLIT_DAY, F.col("qv")).otherwise(F.lit(0))
    post = F.when(F.col("dom") >= _CUPED_SPLIT_DAY, F.col("qv")).otherwise(F.lit(0))
    return (
        ev.groupBy("user_id")
        .agg(F.sum(pre).alias("x"), F.sum(post).alias("y"))
        .withColumn(
            "variant",
            _md5_lower64(F.concat(F.lit("ab_"), F.col("user_id").cast("string"))) % 2,
        )
    )


@query(
    "cuped_adjusted_ab",
    oracle=f"""
    WITH ev AS (
      SELECT user_id,
             CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INT) AS dom,
             CAST(ROUND(value * 1000000) AS BIGINT) AS qv
      FROM events
    ),
    u AS (
      SELECT user_id,
             CAST(md5_number_lower('ab_' || CAST(user_id AS VARCHAR))
                  % 9223372036854775808 AS BIGINT) % 2 AS variant,
             SUM(CASE WHEN dom < {_CUPED_SPLIT_DAY} THEN qv ELSE 0 END) AS x,
             SUM(CASE WHEN dom >= {_CUPED_SPLIT_DAY} THEN qv ELSE 0 END) AS y
      FROM ev GROUP BY user_id
    ),
    g AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM u
    ),
    v AS (
      SELECT variant, COUNT(*) AS nv, SUM(x) AS sxv, SUM(y) AS syv
      FROM u GROUP BY variant
    )
    SELECT v.variant, CAST(v.nv AS BIGINT) AS n_users,
           ROUND(CAST(v.syv AS DOUBLE) / (CAST(v.nv AS DOUBLE) * 1e6), 6)
             AS mean_post,
           ROUND(CAST(v.syv AS DOUBLE) / (CAST(v.nv AS DOUBLE) * 1e6)
                 - (CAST(g.n AS DOUBLE) * CAST(g.sxy AS DOUBLE)
                    - CAST(g.sx AS DOUBLE) * CAST(g.sy AS DOUBLE))
                   / (CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
                      - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE))
                   * (CAST(v.sxv AS DOUBLE) / (CAST(v.nv AS DOUBLE) * 1e6)
                      - CAST(g.sx AS DOUBLE) / (CAST(g.n AS DOUBLE) * 1e6)), 6)
             AS mean_adjusted
    FROM v CROSS JOIN g
    """,
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al. 2013): users split
    into two variants by content hash, per-user pre-period (days 1–15)
    covariate X and post-period metric Y, pooled θ = cov(X,Y)/var(X),
    and each variant's adjusted mean Ȳ_v − θ(X̄_v − X̄) — the
    experimentation-platform primitive that cuts weeks off A/B runtime.
    Values quantize to 1e-6 ints; all moments (ΣX, ΣY, ΣXY, ΣX²) are
    exact DECIMAL(38,0)/HUGEINT; θ and the adjustment are one float
    expression on identical integers. Two shuffles (per-user agg, 2-row
    variant agg); the pooled moments broadcast back."""
    u = _ab_user_metrics(spark, sf_dir)
    big = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = u.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(big("x") * F.col("y")).alias("sxy"),
        F.sum(big("x") * F.col("x")).alias("sxx"),
    )
    v = u.groupBy("variant").agg(
        F.count("*").alias("nv"), F.sum("x").alias("sxv"), F.sum("y").alias("syv")
    )
    j = v.crossJoin(F.broadcast(g))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_post = d("syv") / (d("nv") * F.lit(1e6))
    theta = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    adj = mean_post - theta * (
        d("sxv") / (d("nv") * F.lit(1e6)) - d("sx") / (d("n") * F.lit(1e6))
    )
    return j.select(
        F.col("variant").cast("bigint").alias("variant"),
        F.col("nv").cast("bigint").alias("n_users"),
        F.round(mean_post, 6).alias("mean_post"),
        F.round(adj, 6).alias("mean_adjusted"),
    )


@query(
    "seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    spine AS (
      SELECT CAST(unnest(generate_series((SELECT MIN(day) FROM daily),
                                         (SELECT MAX(day) FROM daily),
                                         INTERVAL 1 DAY)) AS DATE) AS day
    ),
    dense AS (
      SELECT s.day, COALESCE(d.n, 0) AS n FROM spine s
      LEFT JOIN daily d ON s.day = d.day
    ),
    ma AS (
      SELECT day, n,
             SUM(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS wsum,
             COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS wcnt
      FROM dense
    ),
    full_w AS (SELECT day, n, wsum, 7 * n - wsum AS r7 FROM ma WHERE wcnt = 7),
    season AS (
      SELECT CAST(dayofweek(day) AS BIGINT) AS dow,
             SUM(r7) AS s_num, COUNT(*) AS s_cnt
      FROM full_w GROUP BY 1
    )
    SELECT CAST(f.day AS TIMESTAMP) AS day, CAST(f.n AS BIGINT) AS n_events,
           ROUND(CAST(f.wsum AS DOUBLE) / 7, 6) AS trend,
           ROUND(CAST(s.s_num AS DOUBLE) / (7 * CAST(s.s_cnt AS DOUBLE)), 6)
             AS seasonal,
           ROUND(CAST(f.n AS DOUBLE) - CAST(f.wsum AS DOUBLE) / 7
                 - CAST(s.s_num AS DOUBLE) / (7 * CAST(s.s_cnt AS DOUBLE)), 6)
             AS residual
    FROM full_w f JOIN season s ON CAST(dayofweek(f.day) AS BIGINT) = s.dow
    """,
)
def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily event volume: trend =
    centered 7-day moving average, seasonal = day-of-week mean of the
    detrended series, residual = the rest. Everything stays an EXACT
    integer numerator (window sum wsum, detrended 7n−wsum, per-dow sums)
    until three final divisions — the float-mean-of-floats a naive
    decomposition would take is summation-order-dependent and can't be
    replayed cross-engine. Windows run on the POST-AGG calendar spine
    (gapfill argument: bounded by days, not events); edge days without a
    full 7-day window are excluded rather than padded."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    dense = (
        spine.join(daily, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = dense.select(
        "day", "n", F.sum("n").over(w).alias("wsum"), F.count("*").over(w).alias("wcnt")
    )
    full_w = ma.where(F.col("wcnt") == 7).withColumn(
        "r7", 7 * F.col("n") - F.col("wsum")
    )
    season = full_w.groupBy(
        F.dayofweek("day").cast("bigint").alias("dow")
    ).agg(F.sum("r7").alias("s_num"), F.count("*").alias("s_cnt"))
    j = full_w.join(
        F.broadcast(season),
        F.dayofweek(full_w.day).cast("bigint") == season.dow,
    )
    trend = F.col("wsum").cast("double") / 7
    seasonal = F.col("s_num").cast("double") / (7 * F.col("s_cnt").cast("double"))
    return j.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        F.round(trend, 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(F.col("n").cast("double") - trend - seasonal, 6).alias("residual"),
    )


@query(
    "welch_ttest_ab",
    oracle=f"""
    WITH ev AS (
      SELECT user_id,
             CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INT) AS dom,
             CAST(ROUND(value * 1000000) AS BIGINT) AS qv
      FROM events
    ),
    u AS (
      SELECT user_id,
             CAST(md5_number_lower('ab_' || CAST(user_id AS VARCHAR))
                  % 9223372036854775808 AS BIGINT) % 2 AS variant,
             SUM(CASE WHEN dom >= {_CUPED_SPLIT_DAY} THEN qv ELSE 0 END) AS y
      FROM ev GROUP BY user_id
    ),
    v AS (
      SELECT variant, COUNT(*) AS n, SUM(y) AS s,
             SUM(CAST(y AS HUGEINT) * y) AS ss
      FROM u GROUP BY variant
    ),
    wide AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
             MAX(CASE WHEN variant = 0 THEN s END) AS s0,
             MAX(CASE WHEN variant = 0 THEN ss END) AS ss0,
             MAX(CASE WHEN variant = 1 THEN n END) AS n1,
             MAX(CASE WHEN variant = 1 THEN s END) AS s1,
             MAX(CASE WHEN variant = 1 THEN ss END) AS ss1
      FROM v
    ),
    m AS (
      SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             CAST(s0 AS DOUBLE) / (CAST(n0 AS DOUBLE) * 1e6) AS m0,
             CAST(s1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * 1e6) AS m1,
             GREATEST(CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
              - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE), 0)
               / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1) * 1e12)
               / CAST(n0 AS DOUBLE) AS vn0,
             GREATEST(CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE), 0)
               / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1) * 1e12)
               / CAST(n1 AS DOUBLE) AS vn1
      FROM wide
    )
    SELECT n0, n1, ROUND(m0 - m1, 6) AS mean_diff,
           ROUND((m0 - m1) / sqrt(vn0 + vn1), 6) AS t_stat,
           ROUND((vn0 + vn1) * (vn0 + vn1)
                 / (vn0 * vn0 / (CAST(n0 AS DOUBLE) - 1)
                    + vn1 * vn1 / (CAST(n1 AS DOUBLE) - 1)), 6) AS welch_df
    FROM m
    """,
)
def welch_ttest_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on the A/B split — the
    significance readout that pairs with `cuped_adjusted_ab`'s point
    estimate. Per-variant moments (n, Σy, Σy²) are exact quantized
    integers; the two variants PIVOT into one wide row (fixed arity —
    the bm25 pattern), so every float op (means, variance-over-n terms,
    t, Welch–Satterthwaite df) is a single literal expression identical
    on both engines. One per-user shuffle + a 2-row agg."""
    u = _ab_user_metrics(spark, sf_dir).select("user_id", "variant", "y")
    big = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    v = u.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("s"),
        F.sum(big("y") * F.col("y")).alias("ss"),
    )
    wide = v.agg(
        *[
            F.max(F.when(F.col("variant") == k, F.col(c))).alias(f"{c}{k}")
            for k in (0, 1)
            for c in ("n", "s", "ss")
        ]
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    m0 = d("s0") / (d("n0") * F.lit(1e6))
    m1 = d("s1") / (d("n1") * F.lit(1e6))
    # n·Σy² − (Σy)² is ≥ 0 exactly, but the double cast can round it
    # slightly negative when a variant's variance is ~0 — and DuckDB's
    # sqrt(negative) is a hard error while Spark's is NaN. Clamp the
    # numerator on BOTH engines (GREATEST(..., 0) in the oracle above).
    vn0 = F.greatest(d("n0") * d("ss0") - d("s0") * d("s0"), F.lit(0.0)) / (
        d("n0") * (d("n0") - 1) * F.lit(1e12)
    ) / d("n0")
    vn1 = F.greatest(d("n1") * d("ss1") - d("s1") * d("s1"), F.lit(0.0)) / (
        d("n1") * (d("n1") - 1) * F.lit(1e12)
    ) / d("n1")
    return wide.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(m0 - m1, 6).alias("mean_diff"),
        F.round((m0 - m1) / F.sqrt(vn0 + vn1), 6).alias("t_stat"),
        F.round(
            (vn0 + vn1)
            * (vn0 + vn1)
            / (vn0 * vn0 / (d("n0") - 1) + vn1 * vn1 / (d("n1") - 1)),
            6,
        ).alias("welch_df"),
    )


@query(
    "chi2_association",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (SELECT seg, prio, COUNT(*) AS o FROM j GROUP BY 1, 2),
    grid AS (
      SELECT s.seg, p.prio, COALESCE(c.o, 0) AS o
      FROM (SELECT DISTINCT seg FROM j) s
      CROSS JOIN (SELECT DISTINCT prio FROM j) p
      LEFT JOIN cells c ON c.seg = s.seg AND c.prio = p.prio
    ),
    rm AS (SELECT seg, SUM(o) AS r FROM grid GROUP BY seg),
    cm AS (SELECT prio, SUM(o) AS c FROM grid GROUP BY prio),
    nn AS (SELECT SUM(o) AS n, COUNT(DISTINCT seg) AS nr,
                  COUNT(DISTINCT prio) AS nc FROM grid),
    chi AS (
      SELECT SUM(
        CAST((CAST(g.o AS HUGEINT) * nn.n - CAST(rm.r AS HUGEINT) * cm.c)
             AS DOUBLE)
        * CAST((CAST(g.o AS HUGEINT) * nn.n - CAST(rm.r AS HUGEINT) * cm.c)
               AS DOUBLE)
        / (CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE) * CAST(nn.n AS DOUBLE))
        ORDER BY g.seg, g.prio) AS chi2,
        MAX(nn.n) AS n, MAX(nn.nr) AS nr, MAX(nn.nc) AS nc
      FROM grid g JOIN rm ON g.seg = rm.seg JOIN cm ON g.prio = cm.prio
      CROSS JOIN nn
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           ROUND(chi2, 6) AS chi2,
           ROUND(sqrt(chi2 / (CAST(n AS DOUBLE)
                              * LEAST(nr - 1, nc - 1))), 6) AS cramers_v
    FROM chi
    """,
)
def chi2_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between market segment and order
    priority (+ Cramér's V effect size) — the categorical-association
    profiler. Each cell's (o−e)²/e term is rearranged to
    (o·N − r·c)²/(r·c·N) so
    the numerator (o·N − r·c) is an EXACT integer (HUGEINT /
    DECIMAL(38,0) — o·N reaches 1e19 at 1e5-order scale) before the one
    float division; the Σ over the R×C grid (zero cells included via the
    margin spine) is a fixed-order fold sorted by (seg, prio). The fact
    join shuffles once; the grid is R×C rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("prio")
    )
    cells = j.groupBy("seg", "prio").agg(F.count("*").alias("o"))
    segs = j.select("seg").distinct()
    prios = j.select("prio").distinct()
    grid = (
        segs.crossJoin(prios)
        .join(cells, ["seg", "prio"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
    )
    rm = grid.groupBy("seg").agg(F.sum("o").alias("r"))
    cm = grid.groupBy("prio").agg(F.sum("o").alias("c"))
    nn = grid.agg(
        F.sum("o").alias("n"),
        F.countDistinct("seg").alias("nr"),
        F.countDistinct("prio").alias("nc"),
    )
    g = (
        grid.join(F.broadcast(rm), "seg")
        .join(F.broadcast(cm), "prio")
        .crossJoin(F.broadcast(nn))
    )
    agg = g.groupBy().agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("seg", "prio", "o", "r", "c", "n"))
            ),
            F.lit(0.0),
            lambda acc, x: acc
            + (
                (x["o"].cast("decimal(38,0)") * x["n"]
                 - x["r"].cast("decimal(38,0)") * x["c"]).cast("double")
                * (x["o"].cast("decimal(38,0)") * x["n"]
                   - x["r"].cast("decimal(38,0)") * x["c"]).cast("double")
                / (
                    x["r"].cast("double")
                    * x["c"].cast("double")
                    * x["n"].cast("double")
                )
            ),
        ).alias("chi2"),
        F.max("n").alias("n"),
        F.max("nr").alias("nr"),
        F.max("nc").alias("nc"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n").cast("double")
                    * F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )
