"""Tier B query library — the central registry.

Each module registers queries with the ``@query`` decorator; the driver
contract (``__spark_entry__.py``) re-exports :func:`queries` and
:func:`oracle_sql` from here.

A registered query is ``(spark, sf_dir) -> DataFrame`` plus an optional
ANSI-SQL oracle string DuckDB runs on the same parquet views. Column
names/aliases MUST match between the two — the driver sorts columns by
name before hashing values.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import tune_session

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a Tier B query. ``oracle=None`` → rows-only check
    (genuinely non-SQL-expressible ops only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver hands us ITS session — make it able to read the
            # testdata (nanos timestamps) and compare in UTC
            tune_session(spark)
            return fn(spark, sf_dir)

        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every operator module exactly once (each registers itself)."""
    global _LOADED
    if _LOADED:
        return
    from . import mapreduce_queries  # noqa: F401
    from . import tpch  # noqa: F401
    from . import analytics  # noqa: F401
    from . import analytics_ext  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import text  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import tier_a  # noqa: F401
    from . import graph  # noqa: F401
    from . import sampling  # noqa: F401
    from . import skew  # noqa: F401
    from . import udtf_queries  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import layout  # noqa: F401
    from . import cdc  # noqa: F401
    _LOADED = True
