"""Both embedding-neardup strategies (collect-broadcast matmul vs
distributed block-pair matmul) must produce the identical pair set — the
blocked path evaluates every unordered pair in exactly one block-pair
group, with the same quantized-integer dot product; this pins it."""

from __future__ import annotations

from mr_spark.operators.similarity import (
    _neardup_blocked,
    _neardup_broadcast,
    _quantized,
)

from conftest import SF_DIR


def _canon(rows):
    return sorted((r["vec_a"], r["vec_b"], round(r["sim"], 12)) for r in rows)


def test_blocked_equals_broadcast(spark):
    emb = _quantized(spark, SF_DIR)
    broadcast = _canon(_neardup_broadcast(emb).collect())
    blocked = _canon(_neardup_blocked(spark, emb).collect())
    assert broadcast == blocked
    assert broadcast, "no near-dup pairs found"


def test_blocked_covers_all_block_pairs(spark):
    # a degenerate block count still covers the diagonal
    emb = _quantized(spark, SF_DIR)
    blocked1 = _canon(_neardup_blocked(spark, emb, n_blocks=1).collect())
    blocked5 = _canon(_neardup_blocked(spark, emb, n_blocks=5).collect())
    assert blocked1 == blocked5


def test_semantic_dedup_bucket_width_scales_with_corpus(spark):
    """k ∝ n: the sign-bucket width follows the exact-count tiers, and the
    bucket value really uses that many bits (all-positive vector → 2^b−1)."""
    from pyspark.sql import functions as F

    from mr_spark.operators.similarity import (
        _adaptive_bits_col,
        _adaptive_sign_bucket,
    )

    df = spark.createDataFrame([([1.0] * 32,)], "q array<double>")
    for n, bits in [
        (1, 8),
        (100_000, 8),
        (100_001, 14),
        (10_000_001, 20),
        (2_000_000_000, 26),
    ]:
        got = (
            df.withColumn("n_corpus", F.lit(n))
            .select(
                _adaptive_sign_bucket(_adaptive_bits_col(F.col("n_corpus"))).alias("b")
            )
            .collect()[0]["b"]
        )
        assert got == (1 << bits) - 1, (n, bits, got)
