"""Similarity search over the ``embeddings`` table (array<float> column).

* brute-force cosine top-k  — the exact baseline (oracle-checked)
* sign-LSH bucketed top-k   — the scale path: candidates restricted to the
                              query's sign bucket (oracle-checked: the
                              bucketing is deterministic arithmetic)
* embedding near-dup pairs  — all pairs above a cosine threshold
                              (oracle-checked)

All vector math is JVM-side (zip_with + aggregate higher-order functions) —
no Python in the hot path. Cosines are rounded to 6dp on both sides: the
fold order is fixed (left-to-right over the array) but cross-engine SIMD
reassociation is the one nondeterminism risk.

100 TB design notes: brute force is O(Q·N) — fine for small query sets via
broadcast; the sign-LSH variant cuts N to a bucket; a real deployment would
add IVF (k-means centroids) with nprobe>1, same join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cosine
from ..sources import load_table
from . import query

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5

# DuckDB twin of the cosine expression (explicit double math, fixed fold)
_COS_SQL = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)
_EMB_D = "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH e AS ({_EMB_D}),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_COS_SQL}, 6) AS sim
      FROM e a JOIN e b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against the corpus,
    score JVM-side, per-query top-k via window (deterministic tie-break on
    neighbor_id)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "sim")
    )


def _sign_bucket_expr():
    """8-bit sign bucket over the first 8 dims — deterministic coarse
    quantizer usable identically in Spark and DuckDB."""
    bits = [
        F.when(F.element_at(F.col("v"), i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(8)
    ]
    return sum(bits, F.lit(0)).cast("int")


_BUCKET_SQL = (
    "CAST(" + " + ".join(
        f"CASE WHEN v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END" for i in range(8)
    ) + " AS INT)"
)


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    eb AS (SELECT vec_id, v, {_BUCKET_SQL} AS bucket FROM e),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND({_COS_SQL}, 6) AS sim
      FROM eb a JOIN eb b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's 8-bit sign bucket →
    the scoring join is an equi-join on bucket (hash join, shuffles only the
    bucket key), then per-query top-k. ~256× less scoring than brute force
    at uniform bucket occupancy; recall traded accordingly."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    eb = emb.withColumn("bucket", _sign_bucket_expr())
    q = eb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        eb.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "sim")
    )


@query(
    "embedding_neardup",
    oracle=f"""
    WITH e AS ({_EMB_D})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_COS_SQL}, 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND({_COS_SQL}, 6) >= 0.35
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (sim ≥ 0.35). Exact all-pairs at test
    scale; the threshold comparison happens on the ROUNDED value on both
    sides so the pair set is engine-independent. At 100 TB this becomes
    LSH-bucketed (ann_lsh_topk's join shape) — never a raw cross join."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .where(F.col("sim") >= 0.35)
    )
