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
