"""Connected components: the driver-side union-find fast path and the
distributed label-propagation loop must produce identical labels."""

from __future__ import annotations

import mr_spark.operators.graph as graph
from mr_spark import operators as ops

from conftest import SF_DIR


def test_both_strategies_agree(spark, monkeypatch):
    fast = sorted(map(tuple, ops.queries()["neardup_components"](spark, SF_DIR).collect()))
    monkeypatch.setattr(graph, "_DRIVER_EDGE_THRESHOLD", -1)  # force the loop
    slow = sorted(map(tuple, ops.queries()["neardup_components"](spark, SF_DIR).collect()))
    assert fast == slow
    assert fast, "no components found"
    # component id is the min doc_id of its members
    comp_members: dict[int, list[int]] = {}
    for doc_id, comp in fast:
        comp_members.setdefault(comp, []).append(doc_id)
    for comp, members in comp_members.items():
        assert comp == min(members + [comp])


def test_dedup_neardup_docs_keep_rule(spark, tmp_path):
    """Constructed corpus with hand-computed expectations: the two
    near-identical docs cluster (Jaccard >= 0.5 on word trigrams), the
    LONGEST survives; the unrelated doc passes through as a singleton."""
    from mr_spark.operators.graph import dedup_neardup_docs

    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a + " with one extra tail"  # near-dup of a, longer -> kept
    c = "completely different content about distributed query engines"
    rows = [
        (1, a, "en", "s", len(a)),
        (2, b, "en", "s", len(b)),
        (3, c, "en", "s", len(c)),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "c" / "documents.parquet"))
    row = dedup_neardup_docs(spark, str(tmp_path / "c")).collect()[0]
    assert row["n_docs_in"] == 3
    assert row["n_docs_kept"] == 2     # b (longest of {a,b}) + c
    assert row["docs_dropped"] == 1    # a
    assert row["chars_dropped"] == len(a)
    assert row["n_clusters"] == 1
