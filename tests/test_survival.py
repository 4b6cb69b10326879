"""Independent checks for the survival/privacy operators: a pure-Python
Kaplan–Meier recompute and a constructed k-anonymity violation."""

from __future__ import annotations

from mr_spark import operators as ops
from mr_spark.sources import load_table

from conftest import SF_DIR


def test_kaplan_meier_matches_python_km(spark):
    """Replay the estimator in plain Python from (duration, observed)
    pairs; curve must match value-for-value and be monotone
    non-increasing in (0, 1]."""
    from pyspark.sql import functions as F

    rows = sorted(
        ops.queries()["kaplan_meier"](spark, SF_DIR).collect(), key=lambda r: r["t"]
    )
    assert rows

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    data = ev.collect()
    horizon = max(r["day"] for r in data)
    signup: dict[int, object] = {}
    for r in data:
        if r["event_type"] == "signup":
            if r["user_id"] not in signup or r["day"] < signup[r["user_id"]]:
                signup[r["user_id"]] = r["day"]
    purch: dict[int, object] = {}
    for r in data:
        if r["event_type"] == "purchase" and r["user_id"] in signup:
            if r["day"] >= signup[r["user_id"]]:
                if r["user_id"] not in purch or r["day"] < purch[r["user_id"]]:
                    purch[r["user_id"]] = r["day"]
    durs = [
        (
            ((purch[u] if u in purch else horizon) - s).days,
            u in purch,
        )
        for u, s in signup.items()
    ]
    fac = {}
    for t, obs in durs:
        if obs:
            fac.setdefault(t, [0, 0])[0] += 1
    for t in fac:
        fac[t][1] = sum(1 for d, _ in durs if d >= t)
    s, expect = 1.0, {}
    for t in sorted(fac):
        d, n = fac[t]
        s *= 1.0 - d / n
        expect[t] = (n, d, round(s, 6))
    got = {r["t"]: (r["n_risk"], r["n_events"], r["survival"]) for r in rows}
    assert got == expect
    surv = [r["survival"] for r in rows]
    assert surv == sorted(surv, reverse=True)
    # S hits exactly 0 when the final risk set fully converts (d == n)
    assert all(0 <= x <= 1 for x in surv)


def test_k_anonymity_flags_constructed_violation(spark, tmp_path):
    """A QI group of size 1 (< k=10) must show up in violating-group,
    exposed-row, and min-size counts; a uniform sensitive value drives
    min_l to 1."""
    from mr_spark.operators.survival import k_anonymity_audit

    rows = [(i, f"c{i}", 1, 100.0, "BUILDING") for i in range(20)]
    rows.append((99, "c99", 2, 100.0, "MACHINERY"))  # lone QI combo
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    )
    path = str(tmp_path / "ka")
    df.write.parquet(path + "/customer.parquet")
    out = k_anonymity_audit(spark, path).collect()[0]
    assert out["n_groups"] == 2
    assert out["min_group_size"] == 1
    assert out["n_violating_groups"] == 1
    assert out["n_exposed_rows"] == 1
    assert out["min_l_diversity"] == 1
