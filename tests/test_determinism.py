"""Determinism: query results must be independent of parallelism and of
replay — the Tier B analog of the reference's 'output independent of worker
count/timing' property (SURVEY.md §5). Exercises the queries whose naive
implementations would be order-sensitive (float aggs, windows, top-k,
pair generation)."""

from __future__ import annotations

import pytest

from mr_spark import operators as ops

from conftest import SF_DIR

SENSITIVE = [
    "q1_pricing_summary",
    "embedding_neardup",
    "winnow_fingerprint",
    "sessionization",
    "top_k_per_group",
    "ngram_jaccard_pairs",
    "pack_context_windows",
    "label_outlier_scores",
    # round-2 additions whose naive forms are order-sensitive: quantized
    # ln-sum, fixed-order BM25 sum + top-k ties, hash-bucketed pair gen
    "lm_surprisal",
    "bm25_topk",
    "semantic_dedup",
    "exact_substring_pairs",
    # round-2 late additions: iterative float ranks, partition-local
    # skyline pruning, collect_list path ordering
    "textrank_keywords",
    "pareto_frontier",
    "session_paths",
    # third-session additions whose naive forms are order-sensitive:
    # fixed-order entropy/KL/PSI/lnp folds, per-segment rank products,
    # two-level distributed rank, greedy trajectory, per-partition
    # sketch candidates, weighted top-k ties, basket pair gen
    "char_ngram_entropy",
    "kl_source_drift",
    "psi_drift",
    "bigram_perplexity",
    "market_concentration",
    "equidepth_histogram",
    "kcenter_coreset",
    "heavy_hitters",
    "weighted_sample",
    "copurchase_pairs",
    "ewma_daily",
    # product folds, grid folds, last-touch windows, decorrelated top-n
    "kaplan_meier",
    "chi2_association",
    "seasonal_decompose",
    "attribution_last_touch",
    "lateral_topn",
    # round-3 additions: hash-join df counting, gaps-and-islands runs over
    # a shuffled position stream, fixed-order DSIR bucket fold, pair set ∩
    # hash split, distributed NTILE rank, LSH∩exact agreement, bucketed
    # copy-on-write merge through real file writes
    "ngram_novelty",
    "dup_span_stats",
    "dsir_importance_weights",
    "split_leakage_audit",
    "ntile_quartiles",
    "ann_recall_at_k",
    "acid_merge_upsert",
    # round-4: manifest-stats file pruning through real commits — the
    # pruned file SET depends on how rows landed in bucket files, but the
    # read result must not — plus the multiset-diff change feed and the
    # schema-evolved reader over real file writes
    "acid_data_skipping",
    "snapshot_change_feed",
    "snapshot_schema_evolution",
    # the CDF-maintained view and the partitioned-write DPP join both
    # rebuild real file layouts per call — results must not depend on
    # how rows landed in files
    "matview_incremental",
    "dpp_partition_pruned_join",
]


def _rows(spark, name):
    df = ops.queries()[name](spark, SF_DIR)
    # null-safe sort: NULLs first within their column (Python can't
    # compare None with values — snapshot_schema_evolution's NULL group)
    return sorted(
        map(tuple, df.collect()),
        key=lambda row: tuple((v is not None, 0 if v is None else v) for v in row),
    )


@pytest.mark.parametrize("name", SENSITIVE)
def test_partition_count_invariance(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_replay_stability(spark):
    a = _rows(spark, "q1_pricing_summary")
    b = _rows(spark, "q1_pricing_summary")
    assert a == b


def test_winnow_params_shape(spark):
    """Parameterized winnowing: a larger window selects minima over more
    shingles, so the distinct fingerprint set can only shrink; shingle
    width changes the hash universe entirely."""
    from mr_spark.operators.text import winnow_fingerprints
    from mr_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    per_doc = {
        w: dict(
            winnow_fingerprints(docs, w=w)
            .groupBy("doc_id")
            .count()
            .collect()
        )
        for w in (2, 4, 8)
    }
    for doc_id in per_doc[4]:
        assert per_doc[8].get(doc_id, 0) <= per_doc[4][doc_id] <= per_doc[2][doc_id]

    k2 = {tuple(r) for r in winnow_fingerprints(docs, k=2).collect()}
    k3 = {tuple(r) for r in winnow_fingerprints(docs, k=3).collect()}
    assert k2 and k3 and k2 != k3
