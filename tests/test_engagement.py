"""Independent semantic checks for the engagement/experimentation
operators — brute-force recomputation and algebraic invariants."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from mr_spark import operators as ops
from mr_spark.sources import load_table

from conftest import SF_DIR


def test_rolling_active_users_matches_bruteforce(spark):
    rows = {r["day"].date(): r for r in ops.queries()["rolling_active_users"](spark, SF_DIR).collect()}
    du = (
        load_table(spark, SF_DIR, "events")
        .select(F.date_trunc("day", "ts").cast("date").alias("day"), "user_id")
        .distinct()
        .collect()
    )
    by_day = defaultdict(set)
    for r in du:
        by_day[r["day"]].add(r["user_id"])
    for d, row in rows.items():
        assert row["dau"] == len(by_day[d])
        wau = set()
        for k in range(7):
            wau |= by_day.get(d - __import__("datetime").timedelta(days=k), set())
        assert row["wau"] == len(wau)
        assert row["wau"] >= row["dau"]
    assert set(rows) == set(by_day)


def test_cuped_preserves_pooled_mean_and_splits_everyone(spark):
    """CUPED's adjustment is mean-zero over the pooled population:
    Σ n_v·adjusted == Σ n_v·raw; the hash split covers every user."""
    rows = ops.queries()["cuped_adjusted_ab"](spark, SF_DIR).collect()
    assert {r["variant"] for r in rows} == {0, 1}
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    pooled_raw = sum(r["n_users"] * r["mean_post"] for r in rows)
    pooled_adj = sum(r["n_users"] * r["mean_adjusted"] for r in rows)
    assert math.isclose(pooled_raw, pooled_adj, rel_tol=1e-4)


def test_seasonal_identity_and_trend_band(spark):
    """Additive identity trend+seasonal+residual == n on every row, and
    the trend stays inside the min/max of its 7-day window."""
    rows = sorted(
        ops.queries()["seasonal_decompose"](spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    ns = [r["n_events"] for r in rows]
    for i, r in enumerate(rows):
        assert math.isclose(
            r["trend"] + r["seasonal"] + r["residual"], r["n_events"], abs_tol=1e-4
        )
        lo = max(0, i - 3)
        window = ns[lo : i + 4]
        # the Spark-side window saw the dense spine; interior rows here
        # reconstruct it exactly since excluded edge days are contiguous
        assert min(window) - 1e-6 <= r["trend"] <= max(window) + 1e-6


def test_welch_ttest_matches_numpy(spark):
    """t, df recomputed with numpy from the same per-user quantized sums."""
    import numpy as np

    from mr_spark.operators.engagement import _CUPED_SPLIT_DAY  # noqa: F401

    row = ops.queries()["welch_ttest_ab"](spark, SF_DIR).collect()[0]
    assert row["n0"] + row["n1"] == (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    # recompute per-user post sums + hash split on the driver
    from mr_spark.operators.text import _md5_lower64

    u = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.dayofmonth("ts").alias("dom"),
            F.round(F.col("value") * 1000000, 0).cast("bigint").alias("qv"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("dom") >= 16, F.col("qv")).otherwise(0)).alias("y")
        )
        .withColumn(
            "variant",
            _md5_lower64(F.concat(F.lit("ab_"), F.col("user_id").cast("string"))) % 2,
        )
        .collect()
    )
    a = np.array([r["y"] for r in u if r["variant"] == 0], dtype=np.float64) / 1e6
    b = np.array([r["y"] for r in u if r["variant"] == 1], dtype=np.float64) / 1e6
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(va + vb)
    df = (va + vb) ** 2 / (va**2 / (len(a) - 1) + vb**2 / (len(b) - 1))
    assert abs(row["t_stat"] - t) < 1e-4
    assert abs(row["welch_df"] - df) < 1e-2
    assert (row["mean_diff"] > 0) == (row["t_stat"] > 0)


def test_chi2_matches_numpy_crosstab(spark):
    import numpy as np

    row = ops.queries()["chi2_association"](spark, SF_DIR).collect()[0]
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    pairs = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .count()
        .collect()
    )
    segs = sorted({r["c_mktsegment"] for r in pairs})
    prios = sorted({r["o_orderpriority"] for r in pairs})
    m = np.zeros((len(segs), len(prios)))
    for r in pairs:
        m[segs.index(r["c_mktsegment"]), prios.index(r["o_orderpriority"])] = r["count"]
    n = m.sum()
    exp = np.outer(m.sum(1), m.sum(0)) / n
    chi2 = ((m - exp) ** 2 / exp).sum()
    assert row["dof"] == (len(segs) - 1) * (len(prios) - 1)
    assert abs(row["chi2"] - chi2) < 1e-3
    assert 0 <= row["cramers_v"] <= 1
    assert abs(
        row["cramers_v"] - (chi2 / (n * min(len(segs) - 1, len(prios) - 1))) ** 0.5
    ) < 1e-6
