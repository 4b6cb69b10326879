"""Tracked-persist release (ADVICE r3): operators that persist relations
referenced by their lazily-returned plan register them via
session.persist_tracked; the @query wrapper frees the PREVIOUS top-level
query's caches when the next one starts, so cached blocks never accumulate
across invocations in a long-lived session (bench / driver harness).
Composed queries (split_leakage_audit → ngram_jaccard_pairs) must NOT
flush their outer query's caches mid-build — pinned here too."""

from __future__ import annotations

from mr_spark import operators as ops
from mr_spark import session as S

from conftest import SF_DIR


def test_caches_flushed_on_next_top_level_query(spark):
    qs = ops.queries()
    qs["ngram_jaccard_pairs"](spark, SF_DIR).count()
    assert S._TRACKED, "jaccard registered no tracked persist"
    tracked_before = list(S._TRACKED)
    qs["dedup_exact"](spark, SF_DIR).count()
    # previous query's caches were released and deregistered
    assert not any(df is t for t in S._TRACKED for df in tracked_before)
    assert all(t.storageLevel.useMemory is False for t in tracked_before)


def test_composed_query_keeps_outer_caches(spark):
    """split_leakage_audit invokes the registered ngram_jaccard_pairs
    while building its own plan; the inner wrapper call must not flush
    (depth guard) — the composed result must still be computable and the
    tracked registry non-empty afterwards."""
    qs = ops.queries()
    row = qs["split_leakage_audit"](spark, SF_DIR).collect()[0]
    assert row["n_neardup_pairs"] > 0
    assert S._TRACKED  # inner + outer persists survived until the NEXT query
    S.release_tracked_caches()
    assert not S._TRACKED
