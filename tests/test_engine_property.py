"""Property-based differential testing (hypothesis): for ARBITRARY small
corpora, the Spark Tier A engine must equal the sequential executor for
every app — the golden-diff strategy generalized beyond the fixture corpus.

Keys/values respect the engine's wire-format constraint (no whitespace in
tokens — SURVEY.md §1); document contents are unconstrained printable text.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mr_spark.engine import get_app, run_mapreduce, run_sequential
from mr_spark.engine.sequential import to_text_lines

doc_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=8
)
contents = st.text(max_size=200)
corpora = st.lists(
    st.tuples(doc_names, contents), min_size=1, max_size=6, unique_by=lambda kv: kv[0]
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora)
def test_wc_spark_equals_sequential(spark, corpus):
    app = get_app("wc")
    got = sorted(f"{k} {v}" for k, v in run_mapreduce(spark, corpus, app, n_reduce=3).collect())
    assert got == to_text_lines(run_sequential(corpus, app))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora)
def test_indexer_spark_equals_sequential(spark, corpus):
    app = get_app("indexer")
    got = sorted(f"{k} {v}" for k, v in run_mapreduce(spark, corpus, app, n_reduce=3).collect())
    assert got == to_text_lines(run_sequential(corpus, app))
