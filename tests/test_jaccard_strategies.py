"""Both Jaccard-pair strategies (naive inverted index vs PPJoin prefix
filtering) must produce the identical pair set — prefix filtering is exact
by theorem; this pins the implementation."""

from __future__ import annotations

from mr_spark.operators.dedup import _jaccard_naive, _jaccard_ppjoin
from mr_spark.sources import load_table

from conftest import SF_DIR


def test_ppjoin_equals_naive(spark):
    docs = load_table(spark, SF_DIR, "documents")
    naive = sorted(map(tuple, _jaccard_naive(docs).collect()))
    ppjoin = sorted(map(tuple, _jaccard_ppjoin(docs).collect()))
    assert naive == ppjoin
    assert naive, "no near-dup pairs found"
