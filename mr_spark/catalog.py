"""Session-cached bucketed-table catalog.

Bucketing is the 100 TB answer to "this fact-fact join runs every hour on
the same key": pay the shuffle ONCE at write time (`bucketBy(n, key)` +
`sortBy`), and every later join or aggregation on that key reads both
sides co-located — SortMergeJoin with zero exchanges before the join
(pinned in tests/test_bucketing.py).

`bucketed_table` is the routing flow: the first call for a (table, key,
sf_dir) materializes the bucketed copy into the warehouse under a
deterministic name; every later call — in this session or a later one on
the same machine — resolves straight to the catalog table. On a cluster
the same code writes to the shared metastore/warehouse, so ETL jobs and
ad-hoc queries share one bucketed copy.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from .session import default_parallelism
from .sources import load_table

_BUCKET_DB = "mrspark_buckets"


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """The bucketed copy of base table ``name``, bucketed+sorted on
    ``key``; created on first use, catalog-resolved afterwards.

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
    tbl = f"{_BUCKET_DB}.{prefix}{content_tag}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_BUCKET_DB}")
    if not spark.catalog.tableExists(tbl):
        for t in spark.catalog.listTables(_BUCKET_DB):
            if t.name.startswith(prefix):  # superseded snapshot of this source
                spark.sql(f"DROP TABLE IF EXISTS {_BUCKET_DB}.{t.name}")
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(n, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    return spark.table(tbl)
