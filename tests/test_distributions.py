"""Independent semantic checks for the distributions operators —
algorithm properties verified brute-force or by invariant, not oracle
agreement (the oracle shares the algorithm; these don't)."""

from __future__ import annotations

import math

from mr_spark import operators as ops

from conftest import SF_DIR


def test_concentration_indices_match_bruteforce(spark):
    """HHI and Gini recomputed naively from per-customer revenue on the
    driver must match the distributed exact-integer formulas."""
    rows = ops.queries()["market_concentration"](spark, SF_DIR).collect()
    assert rows

    from pyspark.sql import functions as F

    from mr_spark.sources import load_table

    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
            .alias("cents")
        )
        .collect()
    )
    by_seg: dict[str, list[int]] = {}
    for r in rev:
        by_seg.setdefault(r["c_mktsegment"], []).append(r["cents"])
    for row in rows:
        xs = sorted(by_seg[row["c_mktsegment"]])
        n, s = len(xs), sum(xs)
        hhi = sum(x * x for x in xs) / (s * s)
        gini = (2 * sum(i * x for i, x in enumerate(xs, 1)) - (n + 1) * s) / (n * s)
        assert row["n_customers"] == n
        assert math.isclose(row["hhi"], hhi, abs_tol=1e-6)
        assert math.isclose(row["gini"], gini, abs_tol=1e-6)
        assert 0 < row["hhi"] <= 1 and 0 <= row["gini"] < 1


def test_equidepth_buckets_are_balanced_and_ordered(spark):
    """Deciles from the range-binned distributed rank: sizes differ by at
    most 1, cover every row, and price ranges are non-overlapping and
    ascending — i.e. the two-level rank really is a global rank."""
    rows = sorted(
        ops.queries()["equidepth_histogram"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    sizes = [r["n_orders"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    from mr_spark.sources import load_table

    assert sum(sizes) == load_table(spark, SF_DIR, "orders").count()
    for a, b in zip(rows, rows[1:]):
        assert a["hi_price"] <= b["lo_price"]
        assert a["lo_price"] <= a["hi_price"]


def test_mad_outliers_bounds(spark):
    """MAD is non-negative and ≤ the range; outliers are a minority by
    Chebyshev-like robustness (≥ half the points sit within 3 MAD unless
    MAD is 0)."""
    for r in ops.queries()["mad_outliers"](spark, SF_DIR).collect():
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] <= r["n_orders"]
        if r["mad"] > 0:
            assert r["n_outliers"] < r["n_orders"] / 2


def test_interpolation_brackets_and_passthrough(spark):
    """Observed days pass through unchanged; interpolated days lie within
    [min, max] of the two bracketing observations (a lerp can't
    overshoot)."""
    rows = sorted(
        ops.queries()["interpolate_missing"](spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows and not rows[0]["is_interpolated"] and not rows[-1]["is_interpolated"]
    obs_idx = [i for i, r in enumerate(rows) if not r["is_interpolated"]]
    for lo, hi in zip(obs_idx, obs_idx[1:]):
        a, b = rows[lo]["revenue_interp"], rows[hi]["revenue_interp"]
        for i in range(lo + 1, hi):
            v = rows[i]["revenue_interp"]
            assert min(a, b) - 1e-6 <= v <= max(a, b) + 1e-6


def test_markov_rows_sum_to_one_over_full_support(spark):
    """Laplace rows: over the FULL alphabet (observed pairs + implied
    unseen 1/(tot+V) mass) each t1 row sums to exactly 1."""
    rows = ops.queries()["markov_transitions"](spark, SF_DIR).collect()
    assert rows
    types = {r["t1"] for r in rows} | {r["t2"] for r in rows}
    v = len(types)
    by_t1: dict[str, list] = {}
    for r in rows:
        by_t1.setdefault(r["t1"], []).append(r)
    for t1, rs in by_t1.items():
        tot = sum(r["n_transitions"] for r in rs)
        seen = sum(r["p_laplace"] for r in rs)
        unseen = (v - len(rs)) * (1.0 / (tot + v))
        assert math.isclose(seen + unseen, 1.0, abs_tol=1e-4)
        assert all(0 < r["p_laplace"] < 1 for r in rs)


def test_lexical_diversity_bounds_and_extremes(spark, tmp_path):
    """TTR/Simpson on constructed corpora: an all-distinct source has
    TTR 1 / Simpson 0; an all-same source has Simpson 1."""
    from mr_spark.operators.distributions import lexical_diversity

    df = spark.createDataFrame(
        [(1, "a b c d", "en", "uniq", 7), (2, "x x x x", "en", "same", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path + "/documents.parquet")
    out = {r["source"]: r for r in lexical_diversity(spark, path).collect()}
    assert out["uniq"]["ttr"] == 1.0 and out["uniq"]["simpson"] == 0.0
    assert out["same"]["simpson"] == 1.0
