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
