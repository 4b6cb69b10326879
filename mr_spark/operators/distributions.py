"""Distributional / robust-statistics analytics: revenue concentration
(HHI + Gini), lexical diversity (TTR + Simpson), median/MAD robust
outliers, a distributed-rank equi-depth histogram, linear interpolation
over a gapped series, and Markov event transitions.

Determinism strategy (house rules, see timeseries.py): every aggregate
is an exact integer/decimal sum — money is held in cents (BIGINT) and
squares/products in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both
exact below 1e38 — floats appear only in a final division/sqrt applied
to identical integers on both engines, then rounded. Medians are exact
selection (sort-based percentile), not approximation, and are rounded
BEFORE being used in comparisons so threshold tests can never diverge
on a last-ulp interpolation difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens
from ..sources import load_table
from . import query

_TOKS_SQL = "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')"

# money in cents: exact BIGINT from the 2-decimal price domain
_CENTS_SQL = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _cents(col: str = "o_totalprice") -> F.Column:
    return (F.col(col).cast("decimal(18,2)") * 100).cast("bigint")


@query(
    "market_concentration",
    oracle=f"""
    WITH rev AS (
      SELECT c.c_mktsegment, o.o_custkey, SUM({_CENTS_SQL}) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT c_mktsegment, cents,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY cents, o_custkey) AS rnk
      FROM rev
    ),
    agg AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             SUM(cents) AS s,
             SUM(CAST(cents AS HUGEINT) * cents) AS sq,
             SUM(CAST(rnk AS HUGEINT) * cents) AS srx
      FROM ranked GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n_customers,
           ROUND(CAST(sq AS DOUBLE) / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 6)
             AS hhi,
           ROUND(CAST(2 * srx - (n + 1) * CAST(s AS HUGEINT) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
    FROM agg
    """,
)
def market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration indices per market segment: Herfindahl
    (Σ share²) and Gini ((2Σ i·x_i − (n+1)Σx)/(nΣx) over ascending-sorted
    per-customer revenue). Both are scale-invariant, so revenue stays in
    exact cents; squares and rank-products run in DECIMAL(38,0) (HUGEINT
    in the oracle) — no float accumulates anywhere, the two final
    divisions see identical integers on both engines.

    Plan: one groupBy to per-customer revenue, a PER-SEGMENT window for
    the Gini rank (5 segment partitions; at 100 TB swap in the same
    range-binned distributed rank `equidepth_histogram` uses — per-key
    rank machinery, not a new idea), then a 5-row final agg."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(_cents()).alias("cents"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "o_custkey")
    ranked = rev.withColumn("rnk", F.row_number().over(w))
    big = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(big("cents") * F.col("cents")).alias("sq"),
        F.sum(big("rnk") * F.col("cents")).alias("srx"),
    )
    n, s = F.col("n"), F.col("s")
    return agg.select(
        "c_mktsegment",
        n.cast("bigint").alias("n_customers"),
        F.round(
            F.col("sq").cast("double") / (s.cast("double") * s.cast("double")), 6
        ).alias("hhi"),
        F.round(
            (2 * F.col("srx") - (n + 1) * s.cast("decimal(38,0)")).cast("double")
            / (n.cast("double") * s.cast("double")),
            6,
        ).alias("gini"),
    )


@query(
    "lexical_diversity",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS_SQL}) AS word FROM documents
    ),
    wc AS (SELECT source, word, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    agg AS (
      SELECT source, COUNT(*) AS d, SUM(c) AS n,
             SUM(CAST(c AS HUGEINT) * (c - 1)) AS s2
      FROM wc GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_tokens, CAST(d AS BIGINT) AS n_distinct,
           ROUND(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ttr,
           ROUND(CAST(s2 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6) AS simpson
    FROM agg
    """,
)
def lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity: type-token ratio and Simpson's
    repeat-probability λ = Σc(c−1)/(N(N−1)) — the chance two tokens drawn
    without replacement are the same word. A corpus-health signal for
    training-data curation (template spam ⇒ λ spikes, TTR collapses).
    c(c−1) runs in DECIMAL(38,0)/HUGEINT (a 100 TB source can repeat one
    token ~1e11 times; its square overflows BIGINT). Two shuffles, both
    partial-aggregated map-side: (source, word) counts, then per-source
    moments."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select("source", F.explode(tokens("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
    )
    agg = wc.groupBy("source").agg(
        F.count("*").alias("d"),
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * (F.col("c") - 1)).alias("s2"),
    )
    n, d = F.col("n"), F.col("d")
    return agg.select(
        "source",
        n.cast("bigint").alias("n_tokens"),
        d.cast("bigint").alias("n_distinct"),
        F.round(d.cast("double") / n.cast("double"), 6).alias("ttr"),
        F.round(
            F.col("s2").cast("double") / (n.cast("double") * (n - 1).cast("double")),
            6,
        ).alias("simpson"),
    )


@query(
    "mad_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, ROUND(MEDIAN(o_totalprice), 6) AS med
      FROM orders GROUP BY o_orderpriority
    ),
    mad AS (
      SELECT o.o_orderpriority,
             ROUND(MEDIAN(ABS(o.o_totalprice - m.med)), 6) AS mad
      FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
      GROUP BY o.o_orderpriority
    )
    SELECT o.o_orderpriority, COUNT(*) AS n_orders, m.med, d.mad,
           CAST(SUM(CASE WHEN ABS(o.o_totalprice - m.med) > 3 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM orders o
    JOIN med m ON o.o_orderpriority = m.o_orderpriority
    JOIN mad d ON o.o_orderpriority = d.o_orderpriority
    GROUP BY o.o_orderpriority, m.med, d.mad
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per order priority: median + median absolute
    deviation (the estimator that survives the very outliers a mean/stddev
    z-score is distorted by — the robust twin of `anomaly_days`). Medians
    are EXACT sort-based selection (Spark `percentile(0.5)` ≡ DuckDB
    MEDIAN, same linear interpolation on the same doubles) and are rounded
    to 6 decimals BEFORE the |x−med| > 3·mad comparison, so the threshold
    is bit-identical on both engines. Plan: two grouped exact-percentile
    passes (5-row results, broadcast back) + one counting agg — the fact
    table is scanned, never sorted globally."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("med")
    )
    j1 = o.join(F.broadcast(med), "o_orderpriority")
    mad = j1.groupBy("o_orderpriority").agg(
        F.round(
            F.percentile(F.abs(F.col("o_totalprice") - F.col("med")), F.lit(0.5)), 6
        ).alias("mad")
    )
    j2 = j1.join(F.broadcast(mad), "o_orderpriority")
    return j2.groupBy("o_orderpriority", "med", "mad").agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.when(
                F.abs(F.col("o_totalprice") - F.col("med")) > 3 * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
    ).select("o_orderpriority", "n_orders", "med", "mad", "n_outliers")


_NBINS = 1000  # coarse range bins for the distributed rank
_NDECILES = 10


@query(
    "equidepth_histogram",
    oracle=f"""
    WITH r AS (
      SELECT o_totalprice AS p,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
             COUNT(*) OVER () AS n
      FROM orders
    )
    SELECT CAST(FLOOR(CAST({_NDECILES} * (rnk - 1) AS DOUBLE) / CAST(n AS DOUBLE))
                AS BIGINT) AS decile,
           COUNT(*) AS n_orders,
           MIN(p) AS lo_price, MAX(p) AS hi_price,
           CAST(ROUND(SUM(CAST(p AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM r GROUP BY 1
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order prices WITHOUT a global
    single-partition sort: the complement of `histogram_prices`
    (equi-width). Global rank is computed range-binned — 1000 coarse
    price bins (bounds from one min/max agg), per-bin counts (tiny) give
    broadcast exclusive prefix offsets, and the intra-bin row_number
    window shuffles only on bin id. rank = offset(bin) + intra_rank; the
    decile is ⌊10·(rank−1)/n⌋. Same two-level idea as
    `pack_context_windows`, but range- rather than id-blocked, which is
    what an ORDER BY rank needs. The oracle's flat ROW_NUMBER is the
    semantics; the binning never changes a rank (ties broken by
    orderkey). Deciles differ in size by ≤1 row by construction."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
    )
    bounds = o.agg(
        F.min("p").alias("lo"), F.max("p").alias("hi"), F.count("*").alias("n")
    )
    binned = o.crossJoin(F.broadcast(bounds)).withColumn(
        "bin",
        F.least(
            F.lit(_NBINS - 1),
            F.floor((F.col("p") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / _NBINS)),
        ).cast("bigint"),
    )
    off_w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        binned.groupBy("bin")
        .agg(F.count("*").alias("c"))
        .select("bin", F.coalesce(F.sum("c").over(off_w), F.lit(0)).alias("off"))
    )
    intra_w = Window.partitionBy("bin").orderBy("p", "k")
    ranked = binned.join(F.broadcast(offsets), "bin").withColumn(
        "rnk", F.col("off") + F.row_number().over(intra_w)
    )
    decile = F.floor(
        (_NDECILES * (F.col("rnk") - 1)).cast("double") / F.col("n").cast("double")
    ).cast("bigint")
    return ranked.groupBy(decile.alias("decile")).agg(
        F.count("*").alias("n_orders"),
        F.min("p").alias("lo_price"),
        F.max("p").alias("hi_price"),
        F.round(F.sum(F.col("p").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue"),
    )


@query(
    "interpolate_missing",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1
    ),
    obs AS (SELECT * FROM daily WHERE date_part('day', day) % 3 = 0),
    spine AS (
      SELECT CAST(unnest(generate_series((SELECT MIN(day) FROM obs),
                                         (SELECT MAX(day) FROM obs),
                                         INTERVAL 1 DAY)) AS DATE) AS day
    ),
    j AS (
      SELECT s.day, o.revenue,
             last_value(o.revenue IGNORE NULLS)
               OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS pv,
             last_value(CASE WHEN o.revenue IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS pd,
             first_value(o.revenue IGNORE NULLS)
               OVER (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND
                     UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN o.revenue IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND
                     UNBOUNDED FOLLOWING) AS nd
      FROM spine s LEFT JOIN obs o ON s.day = o.day
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           revenue IS NULL AS is_interpolated,
           ROUND(CASE
             WHEN revenue IS NOT NULL THEN revenue
             ELSE pv + (nv - pv)
                  * (CAST(date_diff('day', pd, day) AS DOUBLE)
                     / CAST(date_diff('day', pd, nd) AS DOUBLE))
           END, 6) AS revenue_interp
    FROM j
    """,
)
def interpolate_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a gapped daily series — the
    reconstruction twin of `gapfill_daily_revenue`'s forward-fill. The
    series is deterministically downsampled (days-of-month divisible by 3
    are 'observed', the rest are gaps at every SF) and missing days get
    prev + (next−prev)·Δt/Δtotal from the bracketing observations (exact
    day-diff integers; the lerp is the only float expression, written
    identically in both engines, rounded). The unpartitioned window runs
    on the POST-AGGREGATION calendar spine — bounded by days, not by the
    fact table (same argument as gapfill); per-key series would partition
    the window by key."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue")
    )
    obs = daily.where(F.dayofmonth("day") % 3 == 0)
    bounds = obs.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    j = spine.join(obs.withColumnRenamed("day", "oday"), spine.day == F.col("oday"), "left")
    back = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("revenue").isNotNull(), F.col("day"))
    j = j.select(
        "day",
        "revenue",
        F.last("revenue", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(back).alias("pd"),
        F.first("revenue", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("nd"),
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff("day", "pd").cast("double") / F.datediff("nd", "pd").cast("double")
    )
    return j.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("revenue").isNull().alias("is_interpolated"),
        F.round(
            F.when(F.col("revenue").isNotNull(), F.col("revenue")).otherwise(lerp), 6
        ).alias("revenue_interp"),
    )


@query(
    "markov_transitions",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events
    ),
    pairs AS (
      SELECT event_type AS t1,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t2
      FROM ev
    ),
    c AS (SELECT t1, t2, COUNT(*) AS n FROM pairs WHERE t2 IS NOT NULL
          GROUP BY 1, 2),
    tot AS (SELECT t1, SUM(n) AS tot FROM c GROUP BY t1),
    v AS (SELECT COUNT(DISTINCT event_type) AS v FROM ev)
    SELECT c.t1, c.t2, CAST(c.n AS BIGINT) AS n_transitions,
           ROUND(CAST(c.n + 1 AS DOUBLE) / CAST(tot.tot + v.v AS DOUBLE), 6)
             AS p_laplace
    FROM c JOIN tot ON c.t1 = tot.t1 CROSS JOIN v
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    next-event counts by (t1 → t2) with Laplace-smoothed conditional
    probabilities (c+1)/(tot+V) — the behavioral-model primitive under
    next-action prediction and anomaly scoring (`session_paths` counts
    raw 3-grams; this is the normalized 1-step model). One per-user
    window (LEAD over (ts, event_id) — a total order, so ties can't flip
    pairs), one (t1,t2) count shuffle; marginals and the V scalar
    broadcast back. Exact integers into one division."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("t1"), F.lead("event_type").over(w).alias("t2")
    ).where(F.col("t2").isNotNull())
    c = pairs.groupBy("t1", "t2").agg(F.count("*").alias("n"))
    tot = c.groupBy("t1").agg(F.sum("n").alias("tot"))
    v = ev.agg(F.countDistinct("event_type").alias("v"))
    return (
        c.join(F.broadcast(tot), "t1")
        .crossJoin(F.broadcast(v))
        .select(
            "t1",
            "t2",
            F.col("n").cast("bigint").alias("n_transitions"),
            F.round(
                (F.col("n") + 1).cast("double") / (F.col("tot") + F.col("v")).cast("double"),
                6,
            ).alias("p_laplace"),
        )
    )
