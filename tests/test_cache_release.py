"""Tracked-persist release (ADVICE r3): operators that persist relations
referenced by their lazily-returned plan register them via
session.persist_tracked; the @query wrapper frees the PREVIOUS top-level
query's caches when the next one starts, so cached blocks never accumulate
across invocations in a long-lived session (bench / driver harness).
Composed queries (split_leakage_audit → ngram_jaccard_pairs) must NOT
flush their outer query's caches mid-build — pinned here too."""

from __future__ import annotations

import pytest

from mr_spark import operators as ops
from mr_spark import session as S

from conftest import SF_DIR


@pytest.mark.slow  # cache-lifecycle stress; run with -m ""
def test_caches_flushed_on_next_top_level_query(spark):
    qs = ops.queries()
    qs["ngram_jaccard_pairs"](spark, SF_DIR).count()
    assert S._TRACKED, "jaccard registered no tracked persist"
    tracked_before = list(S._TRACKED)
    qs["dedup_exact"](spark, SF_DIR).count()
    # previous query's caches were released and deregistered
    assert not any(df is t for t in S._TRACKED for df in tracked_before)
    assert all(t.storageLevel.useMemory is False for t in tracked_before)


def test_graph_query_leaves_no_untracked_cache(spark):
    """r4 verdict: neardup_components cached edges/labels OUTSIDE the
    tracked registry — invisible to release_tracked_caches. Now both
    routes go through persist_tracked: after the query and a release,
    the storage tab must be empty (local JVM check via the SparkContext's
    persistent RDD map)."""
    qs = ops.queries()
    S.release_tracked_caches()

    def persistent_ids():
        jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, ids = jmap.keysIterator(), set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = persistent_ids()
    qs["neardup_components"](spark, SF_DIR).count()
    S.release_tracked_caches()
    leaked = persistent_ids() - before
    assert not leaked, f"cached RDDs leaked past release: {leaked}"


def test_no_bare_persist_in_operator_modules():
    """Grep-style enforcement (r4 verdict #2): every .persist()/.cache()
    in an operator module must either go through session.persist_tracked
    or be one of the audited scoped sites (materialize + unpersist inside
    the operator, try/finally). Any NEW bare site fails here until it is
    audited and added — or, preferably, routed through persist_tracked."""
    import re
    from pathlib import Path

    ops_dir = Path(ops.__file__).parent
    # file -> max allowed bare .persist() sites (each verified scoped:
    # coreset kcenter rounds, pipeline vocab_coverage counts, quality
    # heavy_hitters MG sketch, text_graph broadcast-path e2)
    allowed = {"coreset.py": 2, "pipeline.py": 1, "quality.py": 1,
               "text_graph.py": 1}
    for path in sorted(ops_dir.glob("*.py")):
        src = path.read_text()
        n_cache = len(re.findall(r"\.cache\(\)", src))
        assert n_cache == 0, f"{path.name}: use persist_tracked, not .cache()"
        n_persist = len(re.findall(r"\.persist\(", src))
        assert n_persist <= allowed.get(path.name, 0), (
            f"{path.name}: {n_persist} bare .persist() sites "
            f"(allowed {allowed.get(path.name, 0)}) — route new persists "
            "through session.persist_tracked or audit+allowlist the scoped site"
        )


def test_sink_views_dropped_on_next_top_level_query(spark):
    """VERDICT r5 #1/#2: run_to_completion's memory-sink temp views were
    never dropped — ~15 views accumulated per full registry session and a
    leaked view broke test_bucketing's catalog diff in full-suite order.
    Now every sink view registers via session.register_sink_view and the
    same depth-0 release that frees caches drops it: after a streaming
    query's result is consumed and the NEXT top-level query runs, no temp
    view from the streaming query may survive."""
    qs = ops.queries()
    temp_views = lambda: {
        t.name for t in spark.catalog.listTables() if t.tableType == "TEMPORARY"
    }
    S.release_tracked_caches()
    before = temp_views()
    rows = qs["stream_hourly_agg"](spark, SF_DIR).collect()
    assert rows  # result consumable while the view is still registered
    made = temp_views() - before
    assert made, "streaming query registered no memory-sink view"
    assert S._TRACKED_VIEWS, "sink view not tracked for deferred release"
    qs["dedup_exact"](spark, SF_DIR).count()  # next top-level query → release
    leaked = temp_views() - before
    assert not leaked, f"memory-sink temp views leaked past release: {leaked}"
    assert not S._TRACKED_VIEWS


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
