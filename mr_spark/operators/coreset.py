"""Coreset construction over embeddings: greedy k-center (Gonzalez
farthest-point traversal) — the diversity-sampling primitive of
training-data curation (pick the k most mutually-distant exemplars; a
2-approximation of the optimal k-center cover).

Everything is EXACT integer arithmetic: vectors quantize to 1e-6-unit
bigints (|q| ≤ ~5·10⁵ here; 64-dim squared distances ≤ ~10¹⁴, far
inside int64), squared L2 distances and running minima are pure bigint,
and ties break on vec_id — so the greedy trajectory is bit-identical on
any engine and any partitioning. The oracle is generated SQL replaying
every iteration (the textrank_keywords pattern), selection by the same
(distance DESC, vec_id ASC) rule."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query

_K = 5  # coreset size; oracle SQL grows one CTE pair per step
_Q = 1000000  # quantization: 1e-6 units

_QV_SQL = (
    "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
)
_DIST_SQL = (
    "CAST(list_sum(list_transform(range(1, len(p.qv) + 1),"
    " i -> (p.qv[i] - s.qv[i]) * (p.qv[i] - s.qv[i]))) AS BIGINT)"
)


def _kcenter_oracle() -> str:
    """Generated SQL: seed = min vec_id, then k−1 rounds of
    d_i(p) = min(d_{i−1}(p), ‖p − s_i‖²) and s_{i+1} = argmax d_i
    (ties to the smallest vec_id)."""
    parts = [
        f"""
    WITH q AS (SELECT vec_id, {_QV_SQL} AS qv FROM embeddings),
    s1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
    d1 AS (SELECT p.vec_id, p.qv, {_DIST_SQL} AS mind
           FROM q p CROSS JOIN s1 s)"""
    ]
    for i in range(2, _K + 1):
        parts.append(f""",
    s{i} AS (SELECT vec_id, qv, mind FROM d{i - 1}
             ORDER BY mind DESC, vec_id LIMIT 1)""")
        if i < _K:
            parts.append(f""",
    d{i} AS (SELECT p.vec_id, p.qv, LEAST(p.mind, {_DIST_SQL}) AS mind
             FROM d{i - 1} p CROSS JOIN s{i} s)""")
    selects = ["SELECT 1 AS step, vec_id, CAST(0 AS BIGINT) AS radius_sq FROM s1"]
    for i in range(2, _K + 1):
        selects.append(f"SELECT {i} AS step, vec_id, mind AS radius_sq FROM s{i}")
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


@query("kcenter_coreset", oracle=_kcenter_oracle())
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset: start from the lowest vec_id, then k−1
    times add the point farthest (exact squared L2 on quantized ints)
    from everything chosen so far. radius_sq of each selection is the
    covering radius² the pool had BEFORE that point joined — the
    monotone-decreasing coverage curve (pinned in test_coreset).

    Scale shape: the chosen set is k·d integers on the driver (the same
    tiny-state loop as ann_ivf_topk's Lloyd iterations) broadcast into a
    zip_with fold; each round is ONE narrow pass updating a running
    bigint min — no shuffle at all in the loop body (argmax is a
    TakeOrdered). k passes over 100 TB beat any single-pass heuristic
    only if k is small — which is exactly the k-center regime; for
    k ≫ 10² switch to k-means++ oversampling (k-means‖, the ann_ivf
    init) instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * _Q, 0).cast("bigint")
        ).alias("qv"),
    )

    def dist_to(center: list[int]) -> F.Column:
        carr = F.array(*[F.lit(int(v)) for v in center])
        return F.aggregate(
            F.zip_with(F.col("qv"), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    seed = q.orderBy("vec_id").limit(1).collect()[0]
    picked = [(1, seed["vec_id"], 0)]
    d = q.select("vec_id", "qv", dist_to(seed["qv"]).alias("mind")).persist()
    try:
        for step in range(2, _K + 1):
            top = d.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1).collect()[0]
            picked.append((step, top["vec_id"], top["mind"]))
            if step < _K:
                nxt = d.select(
                    "vec_id",
                    "qv",
                    F.least("mind", dist_to(top["qv"])).alias("mind"),
                ).persist()
                try:
                    nxt.count()  # materialize before dropping the parent
                except Exception:
                    nxt.unpersist()  # don't leak the child if it never built
                    raise
                d.unpersist()
                d = nxt
    finally:
        d.unpersist()
    return spark.createDataFrame(
        picked, "step long, vec_id long, radius_sq long"
    )
