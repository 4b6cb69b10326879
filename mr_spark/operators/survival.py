"""Survival analysis + privacy audit: Kaplan–Meier time-to-event curve
(signup → first purchase, right-censored at observation end) and a
k-anonymity / l-diversity audit over quasi-identifiers.

KM determinism: risk sets and event counts are exact integers; each
survival value is a FIXED-ORDER product fold over the duration-sorted
factors (Spark's array fold starting at 1.0 equals DuckDB's ordered
``product()`` — 1.0·x₁ is exact, then both multiply left-to-right)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


@query(
    "kaplan_meier",
    oracle="""
    WITH ev AS (SELECT user_id, event_type,
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
                FROM events),
    horizon AS (SELECT MAX(day) AS h FROM ev),
    signup AS (SELECT user_id, MIN(day) AS s FROM ev
               WHERE event_type = 'signup' GROUP BY user_id),
    purch AS (
      SELECT e.user_id, MIN(e.day) AS p
      FROM ev e JOIN signup g ON e.user_id = g.user_id
      WHERE e.event_type = 'purchase' AND e.day >= g.s
      GROUP BY e.user_id
    ),
    dur AS (
      SELECT g.user_id,
             CAST(date_diff('day', g.s, COALESCE(p.p, horizon.h)) AS BIGINT) AS t,
             p.p IS NOT NULL AS observed
      FROM signup g LEFT JOIN purch p ON g.user_id = p.user_id
      CROSS JOIN horizon
    ),
    fac AS (
      SELECT t, COUNT(*) FILTER (observed) AS d,
             (SELECT COUNT(*) FROM dur d2 WHERE d2.t >= f.t) AS n
      FROM dur f GROUP BY t
      HAVING COUNT(*) FILTER (observed) > 0
    )
    SELECT a.t, CAST(a.n AS BIGINT) AS n_risk, CAST(a.d AS BIGINT) AS n_events,
           ROUND(product(1.0 - CAST(b.d AS DOUBLE) / CAST(b.n AS DOUBLE)
                         ORDER BY b.t), 6) AS survival
    FROM fac a JOIN fac b ON b.t <= a.t
    GROUP BY a.t, a.n, a.d
    """,
)
def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for signup → first purchase, censored
    at the observation horizon: at each event time t, the risk set n_t
    (users whose duration ≥ t), event count d_t, and
    S(t) = Π_{u≤t}(1 − d_u/n_u). The survival primitive behind churn /
    activation analyses — and the canonical 'running product' operator a
    SUM-only engine can't fake. Risk sets come from one cumulative count
    over duration-sorted event times; S(t) is a per-row fold over the
    ≤|distinct durations| factor table (the ewma self-join pattern —
    bounded by the time grid, not by users). All-integer inputs, one
    division per factor inside the fixed-order product."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    horizon = ev.agg(F.max("day").alias("h"))
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("day").alias("s"))
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .where(F.col("day") >= F.col("s"))
        .groupBy("user_id")
        .agg(F.min("day").alias("p"))
    )
    dur = (
        signup.join(purch, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.datediff(F.coalesce("p", "h"), F.col("s")).cast("bigint").alias("t"),
            F.col("p").isNotNull().alias("observed"),
        )
    )
    counts = dur.groupBy("t").agg(
        F.count("*").alias("c"),
        F.sum(F.col("observed").cast("bigint")).alias("d"),
    )
    # risk set: n(t) = Σ_{t' >= t} c(t') — cumulative from the top of the
    # duration-sorted (tiny) counts relation
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    fac = (
        counts.withColumn("n", F.sum("c").over(w))
        .where(F.col("d") > 0)
        .select("t", "d", "n")
    )
    a, b = fac.alias("a"), fac.alias("b")
    j = a.join(b, F.col("b.t") <= F.col("a.t")).select(
        F.col("a.t").alias("t"),
        F.col("a.n").alias("n_risk"),
        F.col("a.d").alias("n_events"),
        F.col("b.t").alias("bt"),
        F.col("b.d").alias("bd"),
        F.col("b.n").alias("bn"),
    )
    s = j.groupBy("t", "n_risk", "n_events").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bt", "bd", "bn"))),
            F.lit(1.0),
            lambda acc, x: acc
            * (F.lit(1.0) - x["bd"].cast("double") / x["bn"].cast("double")),
        ).alias("surv")
    )
    return s.select(
        "t",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("surv", 6).alias("survival"),
    )


_K_ANON = 10
_L_BUCKET = 1000.0  # acctbal generalization width for l-diversity


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz,
             COUNT(DISTINCT FLOOR(c_acctbal / {_L_BUCKET})) AS l
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(sz) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN sz < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END) AS BIGINT)
             AS n_exposed_rows,
           CAST(MIN(l) AS BIGINT) AS min_l_diversity
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit over the quasi-identifier (nation, market segment):
    k-anonymity (every QI group ≥ k rows — smaller groups re-identify
    individuals) and l-diversity of the generalized account balance (a
    QI group whose members all share one sensitive value leaks it even
    at k). Returns group count, the worst group size, violating-group /
    exposed-row counts at k=10, and the minimum l. The audit to
    run AFTER pii_pseudonymize: hashing direct identifiers does nothing
    about QI-group re-identification. One groupBy + one 5-column
    summary agg, all exact integers."""
    cu = load_table(spark, sf_dir, "customer")
    g = cu.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("sz"),
        F.countDistinct(F.floor(F.col("c_acctbal") / _L_BUCKET)).alias("l"),
    )
    return g.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.min("sz").cast("bigint").alias("min_group_size"),
        F.sum(F.when(F.col("sz") < _K_ANON, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("sz") < _K_ANON, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_exposed_rows"),
        F.min("l").cast("bigint").alias("min_l_diversity"),
    )
