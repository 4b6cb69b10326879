"""Invariants of the training-pipeline operators — properties the oracle
comparison can't see (it checks equality, not meaning): chunk coverage,
packing conservation, decontamination bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_spark import operators as ops
from mr_spark.functions import tokens
from mr_spark.sources import load_table

from conftest import SF_DIR

QUERIES = ops.queries()


def test_chunks_cover_every_token(spark):
    """Chunk [start, start+size) ranges must tile each document: starts
    step by the stride from 0, and the last chunk reaches the final
    token — so every token lands in ≥1 chunk."""
    chunks = QUERIES["doc_chunking"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_start") + F.col("n_chunk_tokens")).alias("covered"),
            F.count("*").alias("n_chunks"),
            F.max("chunk_start").alias("last_start"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r["covered"] == r["n_tokens"]  # last chunk ends at the last token
        assert r["last_start"] == 24 * (r["n_chunks"] - 1)  # stride tiling


def test_packing_conserves_tokens_and_is_contiguous(spark):
    """Concat-and-split packing: window ranges are non-decreasing in
    doc_id order and adjacent docs share or abut windows (the stream has
    no gaps); total windows spanned ≈ total tokens / window size."""
    rows = sorted(
        QUERIES["pack_context_windows"](spark, SF_DIR).collect(),
        key=lambda r: r["doc_id"],
    )
    total = sum(r["n_tokens"] for r in rows)
    assert rows[-1]["last_window"] == (total - 1) // 256
    prev_last = 0
    for r in rows:
        assert 0 <= r["first_window"] <= r["last_window"]
        assert r["n_windows"] == r["last_window"] - r["first_window"] + 1
        # the stream is gapless: this doc starts in (or right after) the
        # window the previous doc ended in
        assert r["first_window"] in (prev_last, prev_last + 1)
        prev_last = r["last_window"]


def test_contamination_bounds_and_benchmark_excluded(spark):
    rows = QUERIES["contamination_ngrams"](spark, SF_DIR).collect()
    assert rows
    bench_ids = {
        r["doc_id"]
        for r in load_table(spark, SF_DIR, "documents")
        .where(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    for r in rows:
        assert r["doc_id"] not in bench_ids
        assert 0 <= r["n_contaminated"] <= r["n_grams"]
        assert abs(r["contamination"] - r["n_contaminated"] / r["n_grams"]) < 1e-12


def test_curation_counts_are_a_partition(spark):
    """kept + dropped(quality) + dropped(dup) must account for every doc."""
    rows = QUERIES["corpus_curation"](spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_kept"] + r["n_drop_quality"] + r["n_drop_dup"] == r["n_docs"]


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        QUERIES["vocab_coverage"](spark, SF_DIR).collect(), key=lambda r: r["rank"]
    )
    assert rows[0]["rank"] == 1
    shares = [r["cum_share"] for r in rows]
    assert all(a < b for a, b in zip(shares, shares[1:]))  # strictly increasing
    counts = [r["cnt"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # ranked by count
    assert shares[-1] <= 1.0


def test_url_domain_stats_extraction_and_blocklist(spark, tmp_path):
    """Hand-computed extraction on a constructed corpus: URLs already in
    the text are extracted, the deterministic augmentation slices add
    their domains, the blocklist flag marks the tracker."""
    from mr_spark.operators.pipeline import url_domain_stats

    docs = {
        1: "see https://a.example/x and http://b.example trailing",
        7: "no urls here at all",
        15: "slice doc",  # 15%3==0 -> site1.example; 15%5==0 -> tracker
    }
    rows = [(i, t, "en", "src1", len(t)) for i, t in docs.items()]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "c" / "documents.parquet"))
    got = {
        r["domain"]: (r["n_urls"], r["n_docs"], r["blocked"], r["url_share"])
        for r in url_domain_stats(spark, str(tmp_path / "c")).collect()
    }
    assert got["a.example"] == ("a.example" in got and (1, 1, 0, 0.25))
    assert got["b.example"][:3] == (1, 1, 0)
    assert got["site1.example"][:3] == (1, 1, 0)
    assert got["tracker.adnet.example"][:3] == (1, 1, 1)
    assert abs(sum(v[3] for v in got.values()) - 1.0) < 1e-9
