"""Column default values (SnapshotTable.add_column — Iceberg v3's
initial-default + Delta's allowColumnDefaults write-default):

* the ALTER is metadata-only (zero files moved),
* pre-existing rows read the INITIAL default — resolved by pre-alter
  file membership, so a later rewrite that materializes real values
  leaves the fill set and never double-applies,
* writers that OMIT the column get the WRITE default materialized at
  write time; an EXPLICIT NULL stays NULL,
* every read surface agrees: native read, data-skipping reads, DV DML
  scans, CDF feed, the V2 batch/stream sources, clones, fresh readers.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mr_spark.acid import SnapshotTable


def _mk(spark, tmp_path, name="dtbl", n=8, **kw):
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(n)], "k bigint, v string"
    )
    return SnapshotTable.create(
        spark, str(tmp_path / name), df, key="k", n_buckets=2, **kw
    )


def test_add_column_defaults_metadata_only_and_read_fill(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.add_column("tier", "string", initial_default="legacy", write_default="web")
    m0, m1 = t._manifest(v - 1), t._manifest(v)
    assert m0["files"] == m1["files"]  # zero data movement
    got = {r["k"]: r["tier"] for r in t.read().collect()}
    assert set(got.values()) == {"legacy"}  # every pre-alter row filled
    # time travel BEFORE the alter has no column
    assert "tier" not in t.read(version=v - 1).columns
    # an omitting append gets the WRITE default
    t.append(spark.createDataFrame([(100, "new")], "k bigint, v string"))
    got = {r["k"]: r["tier"] for r in t.read().collect()}
    assert got[100] == "web" and got[0] == "legacy"
    # an EXPLICIT NULL stays NULL (distinguishable from omission)
    t.append(
        spark.createDataFrame(
            [(101, "x", None)], "k bigint, v string, tier string"
        )
    )
    got = {r["k"]: r["tier"] for r in t.read().collect()}
    assert got[101] is None
    # fresh reader reconstructs defaults through the delta fold
    fresh = SnapshotTable(spark, t.path)
    got2 = {r["k"]: r["tier"] for r in fresh.read().collect()}
    assert got2 == got


def test_initial_default_rewrite_materializes_and_leaves_pre_set(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("score", "double", initial_default=1.5)
    # a keyed merge rewrites one bucket: its rows materialize 1.5
    t.merge_upsert(
        spark.createDataFrame(
            [(0, "V0", 9.9)], "k bigint, v string, score double"
        )
    )
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got[0] == 9.9
    assert all(s == 1.5 for k, s in got.items() if k != 0)
    # rows carried through the rewrite keep 1.5 PHYSICALLY (not refill):
    # read the rewritten bucket's new file raw — the column is present
    m = t._manifest(t.latest_version())
    new_rels = [
        rel
        for rels in m["files"].values()
        for rel in rels
        if rel not in {
            r for rl in t._manifest(2)["files"].values() for r in rl
        }
    ]
    assert new_rels
    raw = spark.read.parquet(
        *[os.path.join(t.path, r) for r in new_rels]
    )
    assert "score" in raw.columns
    vals = {r["score"] for r in raw.collect()}
    assert 9.9 in vals  # genuine values physically stored


def test_defaults_in_predicate_dml_and_skipping(spark, tmp_path):
    t = _mk(spark, tmp_path, n=12)
    t.add_column("tier", "string", initial_default="legacy")
    t.append(
        spark.createDataFrame(
            [(100, "n", "web"), (101, "n", "web")],
            "k bigint, v string, tier string",
        )
    )
    # predicate DELETE on the defaulted column must hit filled rows —
    # in BOTH modes (the dv path scans raw files and must fill too)
    t2 = _mk(spark, tmp_path, name="dtbl2", n=12)
    t2.add_column("tier", "string", initial_default="legacy")
    t2.append(
        spark.createDataFrame(
            [(100, "n", "web")], "k bigint, v string, tier string"
        )
    )
    t2.delete(where=("=", "tier", "legacy"), mode="dv")
    assert {r["tier"] for r in t2.read().collect()} == {"web"}
    t.delete(where=("=", "tier", "legacy"))
    assert {r["tier"] for r in t.read().collect()} == {"web"}
    # read-side filter + pruning path agrees
    t3 = _mk(spark, tmp_path, name="dtbl3")
    t3.add_column("tier", "string", initial_default="legacy")
    assert t3.read(where=("=", "tier", "legacy")).count() == 8
    assert t3.read(where=("<>", "tier", "legacy")).count() == 0


def test_defaults_update_dv_rewrites_filled_preimages(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("tier", "string", initial_default="legacy")
    t.update({"tier": "'gold'"}, where=("k", 0, 3), mode="dv")
    got = {r["k"]: r["tier"] for r in t.read().collect()}
    for k, tier in got.items():
        assert tier == ("gold" if k <= 3 else "legacy")


def test_defaults_cdf_feed_shows_fill_in_preimages(spark, tmp_path):
    t = _mk(spark, tmp_path, n=4)
    t.add_column("tier", "string", initial_default="legacy")
    v1 = t.latest_version()
    v2 = t.merge_upsert(
        spark.createDataFrame(
            [(1, "V1", "gold")], "k bigint, v string, tier string"
        )
    )
    ch = {
        (r["_change_type"], r["k"]): r["tier"]
        for r in t.changes(v1, v2).collect()
    }
    assert ch[("update_preimage", 1)] == "legacy"  # fill, not NULL
    assert ch[("update_postimage", 1)] == "gold"


@pytest.mark.slow  # cross-source default parity stress; run with -m ""
def test_defaults_v2_sources_agree(spark, tmp_path):
    from mr_spark.sources.snapshot_source import register

    t = _mk(spark, tmp_path)
    t.add_column("tier", "string", initial_default="legacy", write_default="web")
    t.append(spark.createDataFrame([(100, "n")], "k bigint, v string"))
    register(spark)
    df = spark.read.format("snapshot").option("path", t.path).load()
    got = {r["k"]: r["tier"] for r in df.collect()}
    assert got[100] == "web" and all(
        v == "legacy" for k, v in got.items() if k != 100
    )
    # the where option filters on the FILLED value row-level
    hit = (
        spark.read.format("snapshot")
        .option("path", t.path)
        .option("where", "tier = 'legacy'")
        .load()
    )
    assert hit.count() == 8
    # streaming initial snapshot agrees
    stream = (
        spark.readStream.format("snapshot").option("path", t.path).load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("defaults_snap")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_s = {
        r["k"]: r["tier"]
        for r in spark.sql("SELECT * FROM defaults_snap").collect()
    }
    assert got_s == got


def test_defaults_ride_clone_checkpoint_and_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.checkpoint_interval = 2
    t.add_column("tier", "string", initial_default="legacy")
    for i in range(3):  # force a checkpoint past the alter
        t.append(spark.createDataFrame([(200 + i, "a")], "k bigint, v string"))
    fresh = SnapshotTable(spark, t.path)
    got = {r["k"]: r["tier"] for r in fresh.read().collect()}
    assert got[0] == "legacy" and got[200] is None  # no write default here
    # clones pin the pre-set explicitly and keep filling
    c = t.clone(str(tmp_path / "dclone"))
    assert {r["tier"] for r in c.read().where("k < 8").collect()} == {"legacy"}
    deep = t.clone(str(tmp_path / "ddeep"), deep=True)
    import shutil as sh

    sh.rmtree(t.path)
    assert {r["tier"] for r in deep.read().where("k < 8").collect()} == {"legacy"}
    # guards: duplicate column, expression default, rename/drop rebind
    with pytest.raises(ValueError, match="already exists"):
        deep.add_column("tier", "string")
    with pytest.raises(ValueError, match="literal scalar"):
        deep.add_column("x2", "double", initial_default=[1, 2])
    deep.rename_column("tier", "band")
    assert "band" in deep._manifest(deep.latest_version())["defaults"]
    assert {r["band"] for r in deep.read().where("k < 8").collect()} == {"legacy"}
    deep.drop_column("band")
    assert "defaults" not in deep._manifest(deep.latest_version())
