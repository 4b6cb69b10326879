"""Tier B correctness gate rehearsal: every registered query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01 —
tools/check_correctness.py runs it there on demand)."""

from __future__ import annotations

import pytest

from mr_spark import operators as ops
from mr_spark.oracle import diff

from conftest import SF_DIR

QUERIES = ops.queries()
ORACLES = ops.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only contract (approximate / engine-hash-dependent ops)
        assert len(spark_pdf) > 0
        return
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = diff(spark_pdf, duck_pdf)
    assert not problems, "\n".join(problems)


def test_every_query_has_result_columns(spark):
    for name, fn in QUERIES.items():
        assert QUERIES[name].__doc__, f"{name} lacks a docstring"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
