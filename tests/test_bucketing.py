"""Bucketing: pre-shuffle co-location so repeated joins/aggs on the bucket
key skip the exchange entirely — the 100 TB answer to 'this join runs
every hour on the same key'."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mr_spark import plans
from mr_spark.sources import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf — put the test database under an
    # explicit LOCATION instead
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}'")
    for name, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        (
            load_table(spark, SF_DIR, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"bkt.{name}")
        )
    yield
    spark.sql("DROP DATABASE bkt CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    o = spark.table("bkt.orders")
    li = spark.table("bkt.lineitem")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )
    # disable auto-broadcast: at test scale Catalyst would broadcast these
    # tiny tables; the property under test is the big-big case, where
    # bucketing means SortMergeJoin with ZERO exchanges before the join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plans.formatted(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # exactly ONE exchange in the whole plan — the final aggregation's;
    # the join itself reads both bucketed tables shuffle-free
    n_exchanges = plan.count(") Exchange")  # one numbered node per exchange
    assert n_exchanges == 1, plan
    # and it computes the same thing as the unbucketed join
    o2 = load_table(spark, SF_DIR, "orders")
    li2 = load_table(spark, SF_DIR, "lineitem")
    golden = sorted(
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(joined.collect()) == golden


def test_bucketed_catalog_reuse_and_invalidation(spark, tmp_path):
    """bucketed_table materializes once, catalog-resolves afterwards, and
    re-materializes when the source file changes (content tag)."""
    import shutil

    from mr_spark.catalog import _BUCKET_DB, bucketed_table

    sf_copy = tmp_path / "sf"
    sf_copy.mkdir()
    shutil.copy(f"{SF_DIR}/orders.parquet", sf_copy / "orders.parquet")
    sf_dir = str(sf_copy)

    def _tables():
        # listTables(db) also returns session temp views regardless of
        # database — filter them so a temp view leaked by an unrelated
        # test earlier in the suite can't pollute the catalog diff
        return {
            t.name
            for t in spark.catalog.listTables(_BUCKET_DB)
            if t.tableType != "TEMPORARY"
        }

    n0 = _tables() if any(
        db.name == _BUCKET_DB for db in spark.catalog.listDatabases()
    ) else set()
    df1 = bucketed_table(spark, sf_dir, "orders", "o_orderkey", n_buckets=4)
    assert df1.count() == load_table(spark, SF_DIR, "orders").count()
    made = _tables() - n0
    assert len(made) == 1
    # second call resolves to the SAME table (no new snapshot)
    bucketed_table(spark, sf_dir, "orders", "o_orderkey", n_buckets=4)
    assert _tables() - n0 == made

    # source regenerated -> old snapshot dropped, new one created
    import os
    os.utime(sf_copy / "orders.parquet", (1_800_000_000, 1_800_000_000))
    bucketed_table(spark, sf_dir, "orders", "o_orderkey", n_buckets=4)
    now = _tables() - n0
    assert len(now) == 1 and now != made

    for t in now:
        spark.sql(f"DROP TABLE IF EXISTS {_BUCKET_DB}.{t}")
