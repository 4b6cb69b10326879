"""Session-cached bucketed-table catalog.

Bucketing is the 100 TB answer to "this fact-fact join runs every hour on
the same key": pay the shuffle ONCE at write time (`bucketBy(n, key)` +
`sortBy`), and every later join or aggregation on that key reads both
sides co-located — SortMergeJoin with zero exchanges before the join
(pinned in tests/test_bucketing.py).

`bucketed_table` is the routing flow: the first call for a (table, key,
source snapshot) materializes the bucketed copy under the warehouse; every
later call resolves to it. Sessions on this machine share the data but NOT
the default in-memory catalog, so a fresh session re-REGISTERS the
existing files with a `CREATE TABLE … CLUSTERED BY … LOCATION` DDL (the
bucket spec lives in catalog metadata, not the files) instead of
re-writing them. On a cluster with a shared metastore the re-register
branch simply never fires.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from .session import default_parallelism
from .sources import load_table

_BUCKET_DB = "mrspark_buckets"


def _warehouse_dir(spark: SparkSession) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    return wh.removeprefix("file:")


def _location(spark: SparkSession, table_name: str) -> str:
    return os.path.join(_warehouse_dir(spark), f"{_BUCKET_DB}.db", table_name)


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """The bucketed copy of base table ``name``, bucketed+sorted on
    ``key``; materialized on first use, catalog- or disk-resolved
    afterwards.

    The table identifier carries a digest of the source path AND the
    source file's (size, mtime), so different scale factors never collide
    and regenerated testdata never serves a stale bucketed copy;
    n_buckets defaults to the session's parallelism (buckets should match
    or evenly divide cores — each bucket is one task in a bucket-aligned
    join)."""
    n = n_buckets or default_parallelism()
    path_tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(src)
        content = f"{st.st_size}|{int(st.st_mtime)}"
    except OSError:  # directory-style table or remote path: path-only tag
        content = "na"
    content_tag = hashlib.md5(content.encode()).hexdigest()[:8]
    # path tag scopes the stale-snapshot cleanup (different sf_dirs never
    # evict each other); content tag invalidates on source regeneration
    prefix = f"{name}_{key}_{n}b_p{path_tag}_"
    table_name = f"{prefix}{content_tag}"
    tbl = f"{_BUCKET_DB}.{table_name}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_BUCKET_DB}")
    if not spark.catalog.tableExists(tbl):
        for t in spark.catalog.listTables(_BUCKET_DB):
            if t.name.startswith(prefix):  # superseded snapshot of this source
                spark.sql(f"DROP TABLE IF EXISTS {_BUCKET_DB}.{t.name}")
                shutil.rmtree(_location(spark, t.name), ignore_errors=True)
        loc = _location(spark, table_name)
        base = load_table(spark, sf_dir, name)
        if os.path.isdir(loc):
            # data written by an earlier session whose in-memory catalog is
            # gone: re-register, don't re-write (bucket files sort by the
            # bucket id in their names; the spec below must match the
            # original write exactly)
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields
            )
            spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
                f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) INTO {n} BUCKETS "
                f"LOCATION '{loc}'"
            )
        else:
            # stale same-name leftovers from other sessions' GC races are
            # impossible (content tag), but a partial write isn't — the
            # option("path") external write overwrites atomically per file
            (
                base.write.mode("overwrite")
                .option("path", loc)
                .bucketBy(n, key)
                .sortBy(key)
                .saveAsTable(tbl)
            )
    return spark.table(tbl)
