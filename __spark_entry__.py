"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (word count over documents — the
reference's headline app, app-wc/src/lib.rs) at sf0.001. ``queries()`` /
``oracle_sql()`` re-export the central registry in
``mr_spark.operators`` — one entry per implemented operator from
SURVEY.md §2 plus the north-star extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mr_spark import operators as _ops  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ops.queries()["wc"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return _ops.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; the only rows-only
    entry is approx_distinct_sketch (HLL++ internals are engine-specific
    by design — everything else, including the MinHash/SimHash/winnowing
    pipelines, replays exactly in generated SQL)."""
    return _ops.oracle_sql()
