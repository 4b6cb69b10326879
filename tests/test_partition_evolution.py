"""Partition-spec evolution (Iceberg's spec evolution — Iceberg table
spec §Partition Evolution), mapped onto the snapshot layer's composite
bucket ids: ``set_partition_spec`` is a metadata-only commit; evolved
specs embed an "s<i>." marker in the hash part of their bucket ids so a
bucket's spec is derivable from the id alone; readers prune every bucket
under its OWN spec; rewrites migrate rows to the current default spec.

Reference parity note: the reference engine (BugenZhao/6.824-MapReduce)
has no table layer at all — this battery pins the extension surface's
protocol, like tests/test_acid.py does for the commit protocol.
"""

from __future__ import annotations

import os

import pytest

from mr_spark.acid import SnapshotTable, _hash_of, _part_of, _sid_of


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, pr string, x double")


def _mk(spark, tmp_path, name="t", n_buckets=4, partition_by=None):
    rows = [(i, f"p{i % 3}", float(i)) for i in range(60) if i % 3 != 2]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), name),
        _df(spark, rows),
        key="k",
        n_buckets=n_buckets,
        partition_by=partition_by,
    )
    return t, rows


def test_evolution_is_metadata_only_and_appends_use_new_spec(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    v2 = t.set_partition_spec("pr")
    m1, m2 = t._manifest(1), t._manifest(v2)
    assert m2["files"] == m1["files"]  # zero files moved
    assert m2["partition_specs"] == [
        {"id": 0, "column": None},
        {"id": 1, "column": "pr"},
    ]
    assert m2["default_spec_id"] == 1 and m2["partition_by"] == "pr"
    h = {r["version"]: r for r in t.history()}
    assert h[v2]["operation"] == "SET PARTITION SPEC"
    new = [(i, f"p{i % 4}", float(i)) for i in range(100, 140)]
    t.append(_df(spark, new))
    m3 = t._manifest(3)
    fresh = set(m3["files"]) - set(m2["files"])
    assert fresh and all("|" in b and _sid_of(b) == 1 for b in fresh)
    # old buckets untouched by the append
    assert all(m3["files"][b] == m2["files"][b] for b in m2["files"])
    assert t.read().count() == len(rows) + len(new)


def test_mixed_spec_read_prunes_each_bucket_under_its_own_spec(
    spark, tmp_path
):
    t, rows = _mk(spark, tmp_path)
    t.set_partition_spec("pr")
    new = [(i, f"p{i % 4}", float(i)) for i in range(100, 140)]
    t.append(_df(spark, new))
    # p3 exists ONLY under the new spec; partition pruning must keep
    # old-spec buckets (their ids can't answer) and drop the other
    # new-spec partitions
    got = t.read(where=("pr", "p3", "p3"))
    assert got.count() == sum(1 for r in new if r[1] == "p3")
    assert t.last_partition_prune is not None
    m = t._manifest(t.latest_version())
    kept = t.last_partition_prune
    n_old = sum(1 for b in m["files"] if _sid_of(b) == 0)
    n_p3 = sum(
        1 for b in m["files"] if _sid_of(b) == 1 and _part_of(b) == "p3"
    )
    assert kept["kept_buckets"] == n_old + n_p3
    # and per-file string stats then drop the old files (p1 < p3)
    paths = t.data_paths(where=("pr", "p3", "p3"), use_blooms=False)
    live_p3 = {
        rel
        for b, rels in m["files"].items()
        if _sid_of(b) == 1 and _part_of(b) == "p3"
        for rel in rels
    }
    assert {os.path.relpath(p, t.path) for p in paths} == live_p3


def test_cross_spec_merge_and_delete_find_old_spec_rows(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    t.set_partition_spec("pr")
    # k=0 lives in an old-spec bucket; the merge must rewrite it
    t.merge_upsert(_df(spark, [(0, "p0", 999.0)]))
    hit = t.read().where("k = 0").collect()
    assert len(hit) == 1 and hit[0]["x"] == 999.0
    # keyed delete with a keys-only frame crosses specs the same way
    t.delete_keys(spark.createDataFrame([(3,)], "k bigint"))
    assert t.read().where("k = 3").count() == 0
    assert t.read().count() == len(rows) - 1


def test_drop_partition_proof_or_refusal_across_specs(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)  # old rows: pr in {p0, p1}
    t.set_partition_spec("pr")
    new = [(i, f"p{i % 4}", float(i)) for i in range(100, 140)]
    t.append(_df(spark, new))
    # 'p3' > every old file's max ('p1') — stats PROVE disjoint, so the
    # drop stays metadata-only even with mixed specs
    before = {
        rel for rels in t._manifest(3)["files"].values() for rel in rels
    }
    v = t.drop_partition("p3")
    after = {
        rel for rels in t._manifest(v)["files"].values() for rel in rels
    }
    assert after < before  # strictly dropped, nothing added
    assert t.read().where("pr = 'p3'").count() == 0
    # 'p0' lives in old-spec files — no proof, must refuse loudly
    with pytest.raises(ValueError, match="partition spec"):
        t.drop_partition("p0")
    with pytest.raises(ValueError, match="partition spec"):
        t.replace_where("p0", _df(spark, [(900, "p0", 0.0)]))


def test_compact_migrate_specs_unifies_layout(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    t.set_partition_spec("pr")
    new = [(i, f"p{i % 4}", float(i)) for i in range(100, 140)]
    t.append(_df(spark, new))
    n = t.read().count()
    t.compact(migrate_specs=True)
    m = t._manifest(t.latest_version())
    assert all(_sid_of(b) == 1 for b in m["files"])
    assert t.read().count() == n  # migration moved, never changed, rows
    # post-migration the spec-pure paths reopen
    t.generate()
    t.drop_partition("p0")
    assert t.read().where("pr = 'p0'").count() == 0


def test_plain_compact_additive_migration_never_clobbers(spark, tmp_path):
    # an old-spec multi-file bucket's rewrite migrates its rows into
    # buckets that may ALREADY exist under the new spec — the manifest
    # merge must be additive there, not a replace
    t, rows = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1000 + i, f"p{i % 2}", 1.0) for i in range(10)]))
    t.set_partition_spec("pr")
    t.append(_df(spark, [(2000 + i, f"p{i % 3}", 2.0) for i in range(12)]))
    n = t.read().count()
    t.compact()  # old buckets are multi-file -> rewritten -> migrated
    assert t.read().count() == n
    m = t._manifest(t.latest_version())
    assert all(_sid_of(b) == 1 for b in m["files"])


def test_changes_across_evolution_and_migration_are_empty(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    v2 = t.set_partition_spec("pr")
    assert t.changes(v2 - 1, v2).count() == 0
    v3 = t.compact(migrate_specs=True)
    assert t.changes(v3 - 1, v3).count() == 0  # movement, not change


def test_fresh_reader_checkpoint_clone_restore_carry_specs(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    t.set_partition_spec("pr")
    t.append(_df(spark, [(100 + i, f"p{i % 4}", 1.0) for i in range(8)]))
    # fresh reader folds deltas to the identical manifest
    t2 = SnapshotTable(spark, t.path)
    lv = t2.latest_version()
    assert t2._manifest(lv) == t._manifest(lv)
    # checkpoint base reconstruction carries the spec fields
    t.checkpoint_interval = 2
    for i in range(3):
        t.append(_df(spark, [(500 + i, "p9", 0.5)]))
    t3 = SnapshotTable(spark, t.path)
    lv = t3.latest_version()
    m3 = t3._manifest(lv)
    assert t3.last_resolution["base_kind"] in ("checkpoint", "cache", "full")
    assert m3 == t._manifest(lv)
    assert m3["default_spec_id"] == 1
    # clone carries the evolved state
    c = t.clone(os.path.join(str(tmp_path), "c"))
    assert c._manifest(1)["partition_specs"] == m3["partition_specs"]
    assert c.read().count() == t.read().count()
    # restore to v1 rolls the spec state back with the files
    t.restore(1)
    mr = t._manifest(t.latest_version())
    assert "partition_by" not in mr and "default_spec_id" not in mr
    # re-evolving reuses spec ids instead of growing the list
    t.set_partition_spec("pr")
    t.set_partition_spec(None)
    mz = t._manifest(t.latest_version())
    assert len(mz["partition_specs"]) == 2
    assert "default_spec_id" not in mz and "partition_by" not in mz


def test_evolution_refusal_matrix(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="bucket key"):
        t.set_partition_spec("k")
    with pytest.raises(ValueError, match="not in the table schema"):
        t.set_partition_spec("nope")
    t.set_partition_spec("pr")
    # schema changes to ANY spec column (current or historical) refuse
    with pytest.raises(ValueError, match="partition-spec column"):
        t.rename_column("pr", "pr2")
    with pytest.raises(ValueError, match="partition-spec column"):
        t.drop_column("pr")
    t.append(_df(spark, [(100, "p7", 1.0)]))
    # mixed live specs: hive-layout export refuses with the exact path
    with pytest.raises(ValueError, match="migrate"):
        t.generate()
    # evolution commits conflict with concurrently-staged writes via
    # the table identity (spec state is part of it)
    from mr_spark.acid import ConflictError

    t0 = SnapshotTable(spark, t.path)
    m0 = t0._manifest(t0.latest_version())
    t0._pre_commit_hook = lambda: t.set_partition_spec(None)
    with pytest.raises(ConflictError, match="identity"):
        t0.merge_upsert(_df(spark, [(0, "p0", 5.0)]))


def test_evolved_table_partitioned_from_create_keeps_spec0_ids(
    spark, tmp_path
):
    # spec 0 partitioned (legacy composite ids, no marker) -> evolve to
    # a DIFFERENT column: ids from the two specs can never collide even
    # when the two columns share a value string, because evolved ids
    # carry the s1 marker
    rows = [(i, f"v{i % 2}", float(i)) for i in range(20)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "t0"),
        spark.createDataFrame(rows, "k bigint, pr string, x double"),
        key="k",
        n_buckets=2,
        partition_by="pr",
    )
    assert all(_sid_of(b) == 0 and "|" in b for b in t._manifest(1)["files"])
    t.add_column("tag", "string", write_default="v0")
    t.set_partition_spec("tag")
    t.append(
        spark.createDataFrame(
            [(100, "v0", 1.0, "v0")], "k bigint, pr string, x double, tag string"
        )
    )
    m = t._manifest(t.latest_version())
    fresh = [b for b in m["files"] if _sid_of(b) == 1]
    legacy = [b for b in m["files"] if _sid_of(b) == 0]
    assert fresh and legacy
    # same value string "v0" under both columns, distinct bucket ids
    assert {_part_of(b) for b in fresh} == {"v0"}
    assert "v0" in {_part_of(b) for b in legacy}
    assert not set(fresh) & set(legacy)
    # per-bucket spec resolution: pruning on pr keeps tag-spec buckets
    got = t.read(where=("pr", "v1", "v1"))
    assert got.count() == sum(1 for r in rows if r[1] == "v1")


def test_v2_source_prunes_mixed_specs(spark, tmp_path):
    from mr_spark.sources.snapshot_source import register

    register(spark)
    t, rows = _mk(spark, tmp_path)
    t.set_partition_spec("pr")
    new = [(i, f"p{i % 4}", float(i)) for i in range(100, 140)]
    t.append(_df(spark, new))
    df = (
        spark.read.format("snapshot")
        .option("path", t.path)
        .option("where", "pr = 'p3'")
        .load()
    )
    assert df.count() == sum(1 for r in new if r[1] == "p3")
    # full read through the source sees both layouts
    full = spark.read.format("snapshot").option("path", t.path).load()
    assert full.count() == len(rows) + len(new)


def test_sql_partition_field_statements(spark, tmp_path):
    from mr_spark.sources.snapshot_source import register_snapshot_view
    from mr_spark.sql_dml import sql

    t, rows = _mk(spark, tmp_path)
    register_snapshot_view(spark, "pe_sql_view", t.path)
    sql(spark, "ALTER TABLE pe_sql_view ADD PARTITION FIELD pr")
    m = t._manifest(t.latest_version())
    assert m["partition_by"] == "pr" and m["default_spec_id"] == 1
    with pytest.raises(ValueError, match="ONE field"):
        sql(spark, "ALTER TABLE pe_sql_view ADD PARTITION FIELD x")
    sql(spark, "ALTER TABLE pe_sql_view REPLACE PARTITION FIELD pr WITH x")
    assert t._manifest(t.latest_version())["partition_by"] == "x"
    sql(spark, "ALTER TABLE pe_sql_view DROP PARTITION FIELD x")
    m = t._manifest(t.latest_version())
    assert "partition_by" not in m and len(m["partition_specs"]) == 3
    # SHOW PARTITIONS shows only the CURRENT spec's buckets
    sql(spark, "ALTER TABLE pe_sql_view ADD PARTITION FIELD pr")
    t.append(_df(spark, [(200, "p9", 9.0)]))
    got = sql(spark, "SHOW PARTITIONS pe_sql_view")
    assert [r.pr for r in got.collect()] == ["p9"]
    spark.catalog.dropTempView("pe_sql_view")


# ---- hidden-partitioning transforms (Iceberg's days / truncate) ------------


def _ts_df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, ts timestamp, v double")


def _mk_days(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    old = [(i, base + dt.timedelta(hours=6 * i), float(i)) for i in range(40)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "days_t"),
        _ts_df(spark, old),
        key="k",
        n_buckets=4,
    )
    t.set_partition_spec(("days", "ts"))
    new = [
        (100 + i, base + dt.timedelta(days=20 + i // 4, hours=i % 4), 1.0)
        for i in range(12)
    ]
    t.append(_ts_df(spark, new))
    return t, old, new


def test_days_transform_layout_and_range_prune(spark, tmp_path):
    t, old, new = _mk_days(spark, tmp_path)
    m = t._manifest(t.latest_version())
    fresh = [b for b in m["files"] if _sid_of(b) == 1]
    assert fresh and all(
        len(_part_of(b)) == 10 and _part_of(b).startswith("2024-01-2")
        for b in fresh
    )
    # RAW-ts range predicate: day buckets prune via the monotonic
    # transform mapping, old files via their ISO-string ts stats —
    # the planned file set is exactly the day's
    lo, hi = "2024-01-21 00:00:00", "2024-01-21 23:59:59.999999"
    exp_rows = [r for r in new if r[1].date().isoformat() == "2024-01-21"]
    assert t.read(where=("ts", lo, hi)).count() == len(exp_rows)
    planned = {
        os.path.relpath(p, t.path)
        for p in t.data_paths(where=("ts", lo, hi), use_blooms=False)
    }
    day = {
        rel
        for b, rels in m["files"].items()
        if _part_of(b) == "2024-01-21"
        for rel in rels
    }
    assert planned == day
    # datetime-typed constants canonicalize identically
    import datetime as dt

    got = t.read(
        where=("ts", dt.datetime(2024, 1, 21), dt.datetime(2024, 1, 21, 23, 59, 59))
    )
    assert got.count() == len(exp_rows)


def test_days_drop_partition_proof_and_refusal(spark, tmp_path):
    t, old, new = _mk_days(spark, tmp_path)
    n = t.read().count()
    gone = sum(1 for r in new if r[1].date().isoformat() == "2024-01-21")
    f_before = {
        rel
        for rels in t._manifest(t.latest_version())["files"].values()
        for rel in rels
    }
    v = t.drop_partition("2024-01-21")
    f_after = {
        rel for rels in t._manifest(v)["files"].values() for rel in rels
    }
    assert f_after < f_before  # pure metadata removal across mixed specs
    assert t.read().count() == n - gone
    # a day overlapping the OLD unpartitioned files cannot be proven
    with pytest.raises(ValueError, match="different partition spec"):
        t.drop_partition("2024-01-01")


def test_truncate_transform_prune_and_guards(spark, tmp_path):
    rows = [(i, f"user{i % 7}", 1.0) for i in range(30)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "tr_t"),
        spark.createDataFrame(rows, "k bigint, name string, v double"),
        key="k",
        n_buckets=2,
    )
    t.set_partition_spec(("truncate", 5, "name"))
    t.append(
        spark.createDataFrame(
            [
                (100 + i, ("admin" if i % 2 else "guest") + str(i), 2.0)
                for i in range(8)
            ],
            "k bigint, name string, v double",
        )
    )
    got = t.read(where=("=", "name", "admin3"))
    assert got.count() == 1
    pr = t.last_partition_prune
    assert pr and pr["kept_buckets"] < pr["total_buckets"]
    # transform type guards
    with pytest.raises(ValueError, match="timestamp/date"):
        t.set_partition_spec(("days", "name"))
    with pytest.raises(ValueError, match="string column"):
        t.set_partition_spec(("truncate", 3, "v"))
    with pytest.raises(ValueError, match="width"):
        t.set_partition_spec(("truncate", 0, "name"))


def test_transform_sql_spellings_and_show_partitions(spark, tmp_path):
    from mr_spark.sources.snapshot_source import register_snapshot_view
    from mr_spark.sql_dml import sql

    t, old, new = _mk_days(spark, tmp_path)
    register_snapshot_view(spark, "hp_sql_view", t.path)
    sp = sql(spark, "SHOW PARTITIONS hp_sql_view")
    assert sp.columns == ["ts_day"]  # Iceberg's field naming
    assert all(len(r.ts_day) == 10 for r in sp.collect())
    sql(spark, "ALTER TABLE hp_sql_view DROP PARTITION FIELD days(ts)")
    assert "partition_by" not in t._manifest(t.latest_version())
    sql(spark, "ALTER TABLE hp_sql_view ADD PARTITION FIELD days(ts)")
    m = t._manifest(t.latest_version())
    assert m["default_spec_id"] == 1  # spec reuse, not a new spec
    spark.catalog.dropTempView("hp_sql_view")


def test_transform_generate_dirs_and_sink_refusal(spark, tmp_path):
    t, old, new = _mk_days(spark, tmp_path)
    t.compact(migrate_specs=True)
    mf = t.generate()
    dirs = {p.split(os.sep)[-2] for p in mf}
    assert all(d.startswith("ts_day=") for d in dirs)
    # the V2 sink cannot compute transformed values executor-side —
    # honest refusal pointing at append
    from mr_spark.sources.snapshot_sink import SnapshotWriter

    with pytest.raises(NotImplementedError, match="transformed partition"):
        SnapshotWriter({"path": t.path}, t.read().schema, overwrite=False)
