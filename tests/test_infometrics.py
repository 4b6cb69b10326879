"""Independent semantic checks for the infometrics operators — algorithm
properties verified brute-force or on constructed corpora, not oracle
agreement."""

from __future__ import annotations

import math

from mr_spark import operators as ops

from conftest import SF_DIR, round_half_away


def _mini_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path + "/documents.parquet")
    return path


def test_entropy_extremes_and_bounds(spark, tmp_path):
    """H = 0 for a single repeated trigram; H = ln(d) when every trigram
    is distinct; always 0 ≤ H ≤ ln(n_distinct)."""
    from mr_spark.operators.infometrics import char_ngram_entropy

    path = _mini_docs(
        spark,
        tmp_path,
        [
            (1, "aaaaaaaaaa", "en", "s", 10),  # one distinct trigram
            (2, "abcdefghij", "en", "s", 10),  # all trigrams distinct
        ],
    )
    out = {r["doc_id"]: r for r in char_ngram_entropy(spark, path).collect()}
    assert out[1]["entropy"] == 0.0
    assert math.isclose(out[2]["entropy"], math.log(out[2]["n_grams"]), abs_tol=1e-6)
    for r in ops.queries()["char_ngram_entropy"](spark, SF_DIR).collect():
        assert -1e-9 <= r["entropy"] <= math.log(max(r["n_distinct"], 1)) + 1e-6


def test_kl_nonnegative_and_zero_for_identical_sources(spark, tmp_path):
    """Gibbs: KL ≥ 0 everywhere; two sources with identical token
    distributions score identically (and near-zero when they ARE the
    corpus)."""
    from mr_spark.operators.infometrics import kl_source_drift

    rows = [
        (1, "alpha beta gamma alpha", "en", "s1", 22),
        (2, "alpha beta gamma alpha", "en", "s2", 22),
    ]
    out = {r["source"]: r for r in kl_source_drift(spark, _mini_docs(spark, tmp_path, rows)).collect()}
    assert out["s1"]["kl"] == out["s2"]["kl"]
    assert out["s1"]["kl"] < 0.01
    for r in ops.queries()["kl_source_drift"](spark, SF_DIR).collect():
        assert r["kl"] >= 0


def test_embedding_moments_match_numpy(spark):
    """Distributed quantized moments equal a driver-side numpy
    recomputation on the same quantized integers."""
    import numpy as np

    from mr_spark.sources import load_table

    rows = ops.queries()["embedding_dim_stats"](spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    m = np.array([r["embedding"] for r in emb], dtype=np.float64)
    q = round_half_away(m * 1e6)
    for r in rows:
        col = q[:, r["dim"]]
        assert r["n_vecs"] == len(col)
        assert math.isclose(r["mean"], col.mean() / 1e6, abs_tol=1e-6)
        assert math.isclose(
            r["variance"], col.var() / 1e12, abs_tol=1e-5
        )
        assert r["variance"] >= 0


def test_weighted_sample_is_deterministic_topk(spark):
    """Exactly K rows, keys non-increasing, and a re-run returns the
    identical sample (content-hash keys, no RNG state)."""
    q = ops.queries()["weighted_sample"]
    a = q(spark, SF_DIR).collect()
    b = q(spark, SF_DIR).collect()
    assert a == b
    assert len(a) == 64
    keys = [r["es_key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    assert all(r["o_totalprice"] > 0 for r in a)


def test_weighted_sample_prefers_heavy_weights(spark, tmp_path):
    """A row with overwhelming weight is (near-)always selected: give one
    key weight 1e9 vs 1e-3 for 200 others at k=64 — the heavy row must be
    in the sample."""
    from pyspark.sql import functions as F

    from mr_spark.operators.infometrics import weighted_sample

    rows = [(i, 0.001 if i else 1e9) for i in range(200)]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    path = str(tmp_path / "ws")
    df.write.parquet(path + "/orders.parquet")
    out = weighted_sample(spark, path).collect()
    assert 0 in {r["o_orderkey"] for r in out}
