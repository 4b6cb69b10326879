"""Predicate DML protocol tests — SnapshotTable.delete(where=...) and
.update(set=..., where=...) (mr_spark/acid.py), Delta's DELETE/UPDATE:

* the stats trichotomy (disjoint untouched / fully-covered dropped
  metadata-only / straddling rewritten or DV'd),
* copy-on-write vs merge-on-read modes and their manifest shapes,
* SET semantics (pre-image RHS, type cast, generated recompute,
  identity refusal, constraint enforcement, partition moves),
* interaction with time travel, CDF, DVs, compaction and conflicts.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mr_spark.acid import ConstraintViolation, SnapshotTable


def _mk(spark, tmp_path, rows, name="tbl", **kw):
    df = spark.createDataFrame(rows, "k bigint, grp string, x double")
    return SnapshotTable.create(
        spark, str(tmp_path / name), df, key="k", n_buckets=4, **kw
    )


ROWS = [(k, "even" if k % 2 == 0 else "odd", float(k)) for k in range(40)]


def _vals(t, version=None):
    return sorted(
        (r["k"], r["grp"], r["x"]) for r in t.read(version=version).collect()
    )


# ---- DELETE ---------------------------------------------------------------


def test_delete_cow_rows_and_null_semantics(spark, tmp_path):
    rows = ROWS + [(100, None, None)]  # NULL x: predicate is NULL -> kept
    t = _mk(spark, tmp_path, rows)
    t.delete(where=("x", 10.0, 19.0))
    got = _vals(t)
    exp = sorted(
        (k, g, x) for k, g, x in rows if x is None or not (10.0 <= x <= 19.0)
    )
    assert got == exp


def test_delete_full_table_is_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    files_v1 = {
        rel for rels in t._manifest(1)["files"].values() for rel in rels
    }
    v = t.delete()
    assert t.read().count() == 0
    assert t.last_dml["files_rewritten"] == 0
    assert t.last_dml["files_fully_removed"] == len(files_v1)
    # zero data movement: no new data files exist beyond v1's
    assert t._manifest(v)["files"] == {}
    for rel in files_v1:  # old files intact for time travel
        assert os.path.exists(os.path.join(t.path, rel))
    assert t.read(version=1).count() == len(ROWS)


def test_delete_covering_range_drops_files_without_read(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    v = t.delete(where=("x", -1.0, 1000.0))  # covers every file's [min,max]
    assert t.read().count() == 0
    assert t.last_dml["files_rewritten"] == 0
    assert t.last_dml["files_fully_removed"] > 0
    assert t._manifest(v)["files"] == {}


def test_delete_null_rows_block_full_coverage(spark, tmp_path):
    # a file holding NULL x rows must NOT be dropped whole by a covering
    # range — NULLs never match, so the drop would over-delete
    rows = ROWS + [(200, "none", None)]
    t = _mk(spark, tmp_path, rows)
    t.delete(where=("x", -1.0, 1000.0))
    assert t.last_dml["files_rewritten"] > 0  # NULL-carrying files rewrote
    got = _vals(t)
    assert got == [(200, "none", None)]


def test_delete_partition_equality_is_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS, partition_by="grp")
    t.delete(where=("grp", "even", "even"))
    assert t.last_dml["files_rewritten"] == 0
    assert t.last_dml["files_fully_removed"] > 0
    assert t.last_dml["files_untouched"] > 0  # the other partition
    assert {r["grp"] for r in t.read().collect()} == {"odd"}


def test_delete_disjoint_predicate_commits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    v0 = t.latest_version()
    assert t.delete(where=("x", 500.0, 600.0)) == v0
    assert t.latest_version() == v0
    assert t.last_dml["files_fully_removed"] == 0
    assert t.last_dml["files_rewritten"] == 0


def test_delete_unknown_column_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    with pytest.raises(ValueError, match="not in the table schema"):
        t.delete(where=("nope", 1, 2))
    with pytest.raises(ValueError, match="mode"):
        t.delete(where=("x", 1.0, 2.0), mode="zap")


def test_delete_dv_is_merge_on_read_and_compact_purges(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    v = t.delete(where=("x", 10.0, 19.0), mode="dv")
    m1, m2 = t._manifest(v - 1), t._manifest(v)
    assert m1["files"] == m2["files"]  # zero data files touched
    assert m2.get("dvs")
    assert t.last_dml["rows_deleted_by_dv"] == 10
    exp = sorted((k, g, x) for k, g, x in ROWS if not (10.0 <= x <= 19.0))
    assert _vals(t) == exp
    # re-deleting the same range is a no-op: victims already dead
    v0 = t.latest_version()
    assert t.delete(where=("x", 10.0, 19.0), mode="dv") == v0
    # compaction applies and drops the DVs
    t.compact(files_per_bucket=1)
    assert not t._manifest(t.latest_version()).get("dvs")
    assert _vals(t) == exp


def test_delete_mixed_full_and_straddle(spark, tmp_path):
    # partition equality (full drop) AND a range that straddles within it
    t = _mk(spark, tmp_path, ROWS, partition_by="grp")
    t.delete([("grp", "odd", "odd"), ("x", 0.0, 20.0)])
    exp = sorted(
        (k, g, x)
        for k, g, x in ROWS
        if not (g == "odd" and 0.0 <= x <= 20.0)
    )
    assert _vals(t) == exp
    # only the odd partition's files were candidates
    assert t.last_dml["files_untouched"] > 0


def test_delete_operation_metrics_in_history(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    t.delete(where=("x", 10.0, 19.0))
    h = t.history(limit=1)[0]
    assert h["operation"] == "DELETE"
    assert h["params"]["predicate"] == [[["between", "x", 10.0, 19.0]]]
    assert "metrics" in h["params"]


# ---- UPDATE ---------------------------------------------------------------


def test_update_preimage_semantics_and_cast(spark, tmp_path):
    # both RHS see PRE-image values: swapping via x = k, k = x is exact;
    # the k expression (double) casts back to the column's bigint type
    t = _mk(spark, tmp_path, ROWS)
    t.update({"x": "CAST(k AS DOUBLE) * 10", "k": "k + 1000"},
             where=("x", 0.0, 9.0))
    got = _vals(t)
    exp = sorted(
        (k + 1000, g, float(k) * 10) if 0.0 <= x <= 9.0 else (k, g, x)
        for k, g, x in ROWS
    )
    assert got == exp


def test_update_all_rows_without_where(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    t.update({"x": "x + 0.5"})
    assert _vals(t) == sorted((k, g, x + 0.5) for k, g, x in ROWS)


def test_update_null_predicate_rows_not_updated(spark, tmp_path):
    rows = ROWS + [(100, None, None)]
    t = _mk(spark, tmp_path, rows)
    t.update({"grp": "'hit'"}, where=("x", 0.0, 1000.0))
    got = dict((r["k"], r["grp"]) for r in t.read().collect())
    assert got[100] is None  # NULL never matches
    assert got[0] == "hit"


def test_update_only_affected_files_rewritten(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS, partition_by="grp")
    before = t._manifest(t.latest_version())["files"]
    t.update({"x": "x + 100"}, where=("grp", "even", "even"))
    after = t._manifest(t.latest_version())["files"]
    # odd partition's buckets byte-identical (carried by reference)
    for b, rels in before.items():
        if b.startswith("odd|"):
            assert after[b] == rels
    assert t.last_dml["files_untouched"] > 0


def test_update_moves_rows_across_partitions(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS, partition_by="grp")
    t.update({"grp": "'third'"}, where=("x", 0.0, 9.0))
    pruned = t.read(where=("grp", "third", "third"))
    assert pruned.count() == 10
    assert t.last_partition_prune is not None  # pruning engaged
    assert os.path.isdir(os.path.join(t.path, "data", "grp=third"))
    assert t.read().where(F.col("grp") == "even").count() == 15


def test_update_rebuckets_key_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    t.update({"k": "k + 1000"}, where=("x", 0.0, 3.0))
    # merge on a MOVED key must find the row in its new bucket
    src = spark.createDataFrame([(1001, "merged", -1.0)],
                                "k bigint, grp string, x double")
    t.merge_upsert(src)
    got = {r["k"]: r["grp"] for r in t.read().collect()}
    assert got[1001] == "merged"
    assert 1 not in got


def test_update_identity_and_generated_refusals(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.0)], "k bigint, x double")
    t = SnapshotTable.create(
        spark, str(tmp_path / "ident"), df, key="k", n_buckets=2,
        identity="rid",
    )
    with pytest.raises(ValueError, match="IDENTITY"):
        t.update({"rid": "1"}, where=("k", 1, 1))
    df2 = spark.createDataFrame([(1, 2.0)], "k bigint, x double")
    t2 = SnapshotTable.create(
        spark, str(tmp_path / "gen"), df2, key="k", n_buckets=2,
        generated={"x2": "x * 2"},
    )
    with pytest.raises(ValueError, match="generated"):
        t2.update({"x2": "99"}, where=("k", 1, 1))


def test_update_recomputes_generated_from_new_inputs(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "k bigint, x double")
    t = SnapshotTable.create(
        spark, str(tmp_path / "gen2"), df, key="k", n_buckets=2,
        generated={"x2": "x * 2"},
    )
    t.update({"x": "x + 10"}, where=("k", 1, 1))
    got = {r["k"]: (r["x"], r["x2"]) for r in t.read().collect()}
    assert got[1] == (12.0, 24.0)
    assert got[2] == (3.0, 6.0)


def test_update_constraint_violation_commits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    t.add_constraint("x_nonneg", "x >= 0")
    v0 = t.latest_version()
    with pytest.raises(ConstraintViolation):
        t.update({"x": "-x - 1"}, where=("k", 0, 5))
    assert t.latest_version() == v0
    assert _vals(t) == sorted(ROWS)


def test_update_dv_appends_postimages_without_rewrites(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    before = t._manifest(t.latest_version())["files"]
    v = t.update({"x": "x * 2"}, where=("x", 0.0, 4.0), mode="dv")
    m = t._manifest(v)
    for b, rels in before.items():  # every old file carried
        assert set(rels) <= set(m["files"].get(b, []))
    assert m.get("dvs")
    assert t.last_dml["rows_updated"] == 5
    exp = sorted(
        (k, g, x * 2 if 0.0 <= x <= 4.0 else x) for k, g, x in ROWS
    )
    assert _vals(t) == exp
    # time travel to the pre-update version is exact
    assert _vals(t, version=v - 1) == sorted(ROWS)


def test_dv_sidecar_attaches_only_to_victim_files(spark, tmp_path):
    """The DV reference lands ONLY on files the sidecar actually names
    (ADVICE r7): an advisory straddler that contributed zero victims
    must stay DV-free — otherwise every read of it pays the anti-join
    needlessly and compact() flags its bucket for an unnecessary purge
    rewrite. Point predicate [10,10] straddles every file's wide
    [min,max] but only ONE file holds x=10."""
    t = _mk(spark, tmp_path, ROWS)
    n_files = sum(
        len(rels) for rels in t._manifest(t.latest_version())["files"].values()
    )
    assert n_files >= 2
    v = t.update({"grp": "'hit'"}, where=("x", 10.0, 10.0), mode="dv")
    dvs = t._manifest(v).get("dvs", {})
    assert len(dvs) == 1  # not every advisory-affected file
    (rel,) = dvs
    raw = spark.read.parquet(os.path.join(t.path, rel))
    assert raw.where(F.col("x") == 10.0).count() == 1  # the real victim file
    assert [r["grp"] for r in t.read().where("k = 10").collect()] == ["hit"]
    # predicate dv delete: same rule — exactly one file's DV list grows
    before = t._manifest(t.latest_version()).get("dvs", {})
    v = t.delete(where=("x", 11.0, 11.0), mode="dv")
    after = t._manifest(v).get("dvs", {})
    grew = [r for r in after if len(after[r]) > len(before.get(r, []))]
    assert len(grew) == 1
    assert 11.0 not in {r["x"] for r in t.read().collect()}


def test_update_dv_noop_when_no_rows_match(spark, tmp_path):
    # stats keep a file as straddle candidate, but no row matches
    t = _mk(spark, tmp_path, ROWS)
    v0 = t.latest_version()
    assert t.update({"x": "0.0"}, where=("x", 10.4, 10.6), mode="dv") == v0


def test_dml_changes_feed_sees_delete_and_update(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    v1 = t.latest_version()
    t.delete(where=("x", 0.0, 1.0))
    v_upd = t.update({"grp": "'bumped'"}, where=("x", 2.0, 2.0))
    ch = t.changes(v1, v_upd)
    kinds = {
        (r["k"], r["_change_type"]) for r in ch.select("k", "_change_type").collect()
    }
    assert (0, "delete") in kinds and (1, "delete") in kinds
    assert (2, "update_preimage") in kinds and (2, "update_postimage") in kinds


def test_delete_conflicts_with_overlapping_writer(spark, tmp_path):
    from mr_spark.acid import ConflictError

    t = _mk(spark, tmp_path, ROWS)
    t2 = SnapshotTable(spark, t.path)
    # concurrent merge rewrites a bucket the delete's cow read covers
    t._pre_commit_hook = lambda: t2.merge_upsert(
        spark.createDataFrame([(0, "even", 0.0)], "k bigint, grp string, x double")
    )
    with pytest.raises(ConflictError):
        t.delete(where=("x", 0.0, 5.0))


def test_delete_rebases_over_disjoint_partition_append(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS, partition_by="grp")
    t2 = SnapshotTable(spark, t.path)
    extra = spark.createDataFrame(
        [(1000, "new", 1000.0)], "k bigint, grp string, x double"
    )
    t._pre_commit_hook = lambda: t2.append(extra)
    t.delete(where=("grp", "even", "even"))
    assert t.last_commit_retries == 1
    grps = {r["grp"] for r in t.read().collect()}
    assert grps == {"odd", "new"}


def test_dml_on_renamed_column_table(spark, tmp_path):
    # column mapping: predicate and SET target use LOGICAL names while
    # files store the old physical name — both modes must translate
    t = _mk(spark, tmp_path, ROWS)
    t.rename_column("x", "score")
    t.delete(where=("score", 0.0, 4.0), mode="dv")
    t.update({"score": "score + 1000"}, where=("score", 5.0, 9.0))
    got = sorted((r["k"], r["score"]) for r in t.read().collect())
    exp = sorted(
        (k, x + 1000 if 5.0 <= x <= 9.0 else x)
        for k, _, x in ROWS
        if not (0.0 <= x <= 4.0)
    )
    assert got == exp


def test_update_preserves_identity_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(k, float(k)) for k in range(10)], "k bigint, x double"
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "ident2"), df, key="k", n_buckets=2,
        identity="rid",
    )
    before = {r["k"]: r["rid"] for r in t.read().collect()}
    t.update({"x": "x * 10"}, where=("k", 0, 4))
    after = {r["k"]: r["rid"] for r in t.read().collect()}
    assert after == before  # rewrite carries ids; no re-allocation
    t.append(spark.createDataFrame([(100, 1.0)], "k bigint, x double"))
    rids = [r["rid"] for r in t.read().collect()]
    assert len(set(rids)) == len(rids)  # high-water mark never reused


def test_dv_sidecar_lifecycle_vacuum_reclaims(spark, tmp_path):
    """A DML deletion-vector sidecar is LIVE while any retained version
    references it, and garbage after compact purges the DVs and the
    referencing versions expire — vacuum's sweep covers the full
    lifecycle (the sidecar lives under data/ precisely for this)."""
    t = _mk(spark, tmp_path, ROWS)
    t.delete(where=("x", 10.0, 14.0), mode="dv")
    m = t._manifest(t.latest_version())
    sidecars = sorted({dv for lst in m["dvs"].values() for dv in lst})
    assert sidecars
    for rel in sidecars:
        assert os.path.exists(os.path.join(t.path, rel))
    # still referenced: a zero-retention vacuum must NOT touch it
    t.vacuum(min_age_seconds=0.0)
    for rel in sidecars:
        assert os.path.exists(os.path.join(t.path, rel))
    t.compact(files_per_bucket=1)  # applies and drops the DVs
    assert not t._manifest(t.latest_version()).get("dvs")
    # old versions still reference the sidecar until they expire
    gone = t.vacuum(min_age_seconds=0.0, version_retention_seconds=0.0)
    for rel in sidecars:
        assert rel in gone
        assert not os.path.exists(os.path.join(t.path, rel))
    exp = sorted((k, g, x) for k, g, x in ROWS if not (10.0 <= x <= 14.0))
    assert _vals(t) == exp


def test_analyze_upgrades_legacy_stats_for_metadata_delete(spark, tmp_path):
    """ANALYZE recomputes per-file stats metadata-only: a manifest whose
    stats predate null counts (older writer) cannot prove full coverage
    — a covering DELETE pays a rewrite; after analyze() the same delete
    drops every file without reading data."""
    t = _mk(spark, tmp_path, ROWS)
    m = t._manifest(1)
    legacy = t._next_manifest(
        m,
        {b: list(r) for b, r in m["files"].items()},
        {
            rel: {k: v for k, v in s.items() if k != "__nulls__"}
            for rel, s in m["stats"].items()
        },
    )
    t._commit(legacy, 1, op={"operation": "LEGACY"})
    full, straddle = t._classify_files(t._manifest(2), ("x", -1.0, 1000.0))
    assert not full and straddle  # cannot prove full coverage
    v = t.analyze()
    assert v == 3
    assert t._manifest(3)["files"] == t._manifest(2)["files"]  # no movement
    h = {r["version"]: r for r in t.history()}
    assert h[3]["operation"] == "ANALYZE"
    # a FRESH reader reconstructs the refreshed stats through the
    # delta fold (stats_updates is a new delta field) and proves full
    # coverage the same way
    fresh = SnapshotTable(spark, t.path)
    f_full, f_straddle = fresh._classify_files(
        fresh._manifest(3), ("x", -1.0, 1000.0)
    )
    assert f_full and not f_straddle
    t.delete(where=("x", -1.0, 1000.0))
    assert t.last_dml["files_rewritten"] == 0
    assert t.last_dml["files_fully_removed"] > 0
    assert t.read().count() == 0
    # re-analyzing current stats is a no-op, no empty commit
    t2 = _mk(spark, tmp_path, ROWS, name="tbl2")
    assert t2.analyze() == 1


def test_update_empty_set_refused(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    v0 = t.latest_version()
    with pytest.raises(ValueError, match="at least one SET"):
        t.update({}, where=("x", 0.0, 5.0))
    assert t.latest_version() == v0


# ---- round-8 predicate grammar: IN / OR / <> / IS [NOT] NULL --------------


def test_delete_in_list(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    t.delete(where=("in", "k", [3, 7, 11, 999]))  # 999 matches nothing
    assert sorted(r["k"] for r in t.read().collect()) == [
        k for k, _, _ in ROWS if k not in (3, 7, 11)
    ]


def test_delete_or_of_ranges(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    t.delete(where=[("or", [("x", 0.0, 4.0), ("x", 30.0, 39.0)])])
    exp = sorted(
        (k, g, x) for k, g, x in ROWS if not (x <= 4.0 or 30.0 <= x)
    )
    assert _vals(t) == exp


def test_delete_not_equal_keeps_nulls(spark, tmp_path):
    # SQL: WHERE grp <> 'even' does NOT match NULL grp rows — they stay
    rows = ROWS + [(100, None, 1.5)]
    t = _mk(spark, tmp_path, rows)
    t.delete(where=("<>", "grp", "even"))
    got = _vals(t)
    exp = sorted(
        (k, g, x) for k, g, x in rows if g is None or g == "even"
    )
    assert got == exp


def test_delete_is_null_and_not_null(spark, tmp_path):
    rows = ROWS + [(100, None, 1.5), (101, None, 2.5)]
    t = _mk(spark, tmp_path, rows)
    t.delete(where=("is_null", "grp"))
    assert sorted(r["k"] for r in t.read().collect()) == [
        k for k, g, _ in rows if g is not None
    ]
    t2 = _mk(spark, tmp_path, rows, name="tbl2")
    t2.delete(where=[("not_null", "grp"), ("x", 0.0, 100.0)])
    assert sorted(r["k"] for r in t2.read().collect()) == [100, 101]


def test_update_with_in_and_or_grammar(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    t.update(
        {"grp": "'picked'"},
        where=[("or", [("in", "k", [1, 2]), ("k", 38, 39)])],
        mode="dv",
    )
    got = {r["k"] for r in t.read().where("grp = 'picked'").collect()}
    assert got == {1, 2, 38, 39}


def test_classify_in_list_integer_union_covers(spark, tmp_path):
    """An IN-list enumerating every integer in a file's [min,max] (and
    a zero null count) PROVES full coverage -> the IN-delete drops the
    file metadata-only, like the range path."""
    t = _mk(spark, tmp_path, ROWS)
    m = t._manifest(t.latest_version())
    full, straddle = t._classify_files(m, ("in", "k", list(range(0, 40))))
    n_total = sum(len(r) for r in m["files"].values())
    assert sum(len(r) for r in full.values()) == n_total
    assert not straddle
    t.delete(where=("in", "k", list(range(0, 40))))
    assert t.last_dml["files_rewritten"] == 0
    assert t.last_dml["files_fully_removed"] == n_total
    assert t.read().count() == 0


def test_classify_not_null_disjoint_and_covered(spark, tmp_path):
    """__rows__ + __nulls__ footer stats prove IS NULL / IS NOT NULL
    verdicts both ways without reading data."""
    rows = [(k, None if k < 20 else f"g{k}", float(k)) for k in range(40)]
    t = _mk(spark, tmp_path, rows)
    m = t._manifest(t.latest_version())
    # every file: no grp value is NULL-free or all-NULL necessarily,
    # but the verdicts must at least be sound: deleting IS NULL rows
    # then classifying IS NULL again must find nothing
    t.delete(where=("is_null", "grp"))
    assert t.read().count() == 20
    m2 = t._manifest(t.latest_version())
    full2, straddle2 = t._classify_files(m2, ("is_null", "grp"))
    assert not full2  # rewritten files have zero nulls -> disjoint
    assert not straddle2


def test_partition_prune_exact_under_in_and_ne(spark, tmp_path):
    rows = [(k, "even" if k % 2 == 0 else "odd", float(k)) for k in range(40)]
    df = spark.createDataFrame(rows, "k bigint, grp string, x double")
    t = SnapshotTable.create(
        spark, str(tmp_path / "ptbl"), df, key="k", n_buckets=2,
        partition_by="grp",
    )
    m = t._manifest(t.latest_version())
    # IN on the partition column classifies whole partitions exactly
    full, straddle = t._classify_files(m, ("in", "grp", ["even"]))
    assert not straddle
    assert all(b.startswith("even|") for b in full)
    # <> on the partition column: the other partition is fully covered
    full_ne, straddle_ne = t._classify_files(m, ("<>", "grp", "even"))
    assert not straddle_ne
    assert all(b.startswith("odd|") for b in full_ne)
    # and the IN-delete is metadata-only
    t.delete(where=("in", "grp", ["even"]))
    assert t.last_dml["files_rewritten"] == 0
    assert {r["grp"] for r in t.read().collect()} == {"odd"}


def test_data_paths_prunes_under_new_grammar(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    m = t._manifest(t.latest_version())
    n_total = sum(len(r) for r in m["files"].values())
    # IN-list of values outside every file's range prunes everything
    assert t.data_paths(where=("in", "x", [1000.0, 2000.0])) == []
    # IS NULL on a NULL-free column prunes everything
    assert t.data_paths(where=("is_null", "x")) == []
    # NOT NULL keeps all
    assert len(t.data_paths(where=("not_null", "x"))) == n_total
    # reads agree with the row-level truth
    assert t.read(where=[("or", [("k", 0, 1), ("in", "k", [39])])]).count() == 3


def test_where_grammar_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    with pytest.raises(ValueError, match="empty value list"):
        t.delete(where=("in", "k", []))
    with pytest.raises(ValueError, match="cannot nest"):
        t.delete(where=[("or", [("or", [("k", 1, 2)])])])
    with pytest.raises(ValueError, match="not in the table schema"):
        t.delete(where=("nope", 1, 2))
    with pytest.raises(ValueError, match="atom"):
        t.delete(where=("k",))


# ---- OVERWRITE (INSERT OVERWRITE primitive) --------------------------------


def test_overwrite_replaces_all_rows_in_one_commit(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    v1 = t.latest_version()
    files_v1 = {
        rel for rels in t._manifest(v1)["files"].values() for rel in rels
    }
    new = [(500 + k, "fresh", float(k)) for k in range(5)]
    v2 = t.overwrite(
        spark.createDataFrame(new, "k bigint, grp string, x double")
    )
    assert v2 == v1 + 1  # ONE commit: no delete+insert window
    assert _vals(t) == sorted(new)
    assert _vals(t, version=v1) == sorted(ROWS)  # time travel intact
    # removal side is manifest metadata only
    assert t.last_dml["files_fully_removed"] == len(files_v1)
    assert t.last_dml["files_rewritten"] == 0
    ops = {r["version"]: r["operation"] for r in t.history()}
    assert ops[v2] == "OVERWRITE"


def test_overwrite_txn_replay_commits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    df = spark.createDataFrame([(1, "a", 1.0)], "k bigint, grp string, x double")
    v = t.overwrite(df, batch_id=7, app_id="loader")
    assert t.overwrite(df, batch_id=7, app_id="loader") == v
    assert t.overwrite(df, batch_id=3, app_id="loader") == v  # stale replay
    assert t.read().count() == 1


def test_overwrite_refuses_unknown_columns_allows_omitted(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS)
    with pytest.raises(ValueError, match="not in the table schema"):
        t.overwrite(
            spark.createDataFrame([(1, "a", 1.0, 9)], "k bigint, grp string, x double, z int")
        )
    t.overwrite(spark.createDataFrame([(1,)], "k bigint"))
    row = t.read().collect()[0]
    assert row["grp"] is None and row["x"] is None


def test_overwrite_partitioned_and_identity_allocation(spark, tmp_path):
    t = _mk(spark, tmp_path, ROWS, partition_by="grp")
    t.overwrite(
        spark.createDataFrame(
            [(1, "north", 1.0), (2, "south", 2.0)],
            "k bigint, grp string, x double",
        )
    )
    m = t._manifest(t.latest_version())
    parts = {b.split("|")[0] for b in m["files"]}
    assert parts == {"north", "south"}
    # identity: overwrite rows are inserts — fresh ids above the high water
    t2 = SnapshotTable.create(
        spark,
        str(tmp_path / "ident"),
        spark.createDataFrame([(1, "a")], "k bigint, grp string"),
        key="k",
        n_buckets=2,
        identity="rid",
    )
    old_ids = {r["rid"] for r in t2.read().collect()}
    t2.overwrite(spark.createDataFrame([(5, "b"), (6, "c")], "k bigint, grp string"))
    new_ids = {r["rid"] for r in t2.read().collect()}
    assert len(new_ids) == 2 and min(new_ids) > max(old_ids)


def test_overwrite_conflicts_with_concurrent_data_commit(spark, tmp_path):
    from mr_spark.acid import ConflictError

    t = _mk(spark, tmp_path, ROWS)
    t2 = SnapshotTable(spark, t.path)
    # a concurrent merge rewrites a bucket the overwrite replaces —
    # rebasing would silently clobber its update
    t._pre_commit_hook = lambda: t2.merge_upsert(
        spark.createDataFrame([(0, "even", 99.0)], "k bigint, grp string, x double")
    )
    with pytest.raises(ConflictError):
        t.overwrite(
            spark.createDataFrame([(1, "a", 1.0)], "k bigint, grp string, x double")
        )


def test_overwrite_and_replace_where_align_narrow_key_types(spark, tmp_path):
    """Cast-before-hash: a narrow int-typed key frame must bucket under
    the table's bigint hash (the r7 merge_upsert rule) in overwrite and
    replace_where too — otherwise a later correctly-typed lookup misses
    the rows."""
    t = _mk(spark, tmp_path, ROWS)
    narrow = spark.createDataFrame(
        [(7, "n", 7.0)], "k int, grp string, x double"
    )
    t.overwrite(narrow)
    # the keyed lookup path (bigint-typed delete_keys) must FIND the row
    t.delete_keys(spark.createDataFrame([(7,)], "k bigint"))
    assert t.read().count() == 0
    t2 = _mk(spark, tmp_path, ROWS, name="tbl_rw", partition_by="grp")
    t2.replace_where(
        "even",
        spark.createDataFrame([(8, "even", 8.0)], "k int, grp string, x double"),
    )
    t2.delete_keys(spark.createDataFrame([(8,)], "k bigint"))
    assert {r["grp"] for r in t2.read().collect()} == {"odd"}
    # non-lossless mismatch refuses instead of silently mis-bucketing
    with pytest.raises(ValueError, match="type changes"):
        t2.overwrite(
            spark.createDataFrame([("9", "odd", 1.0)], "k string, grp string, x double")
        )


def test_convert_refuses_source_inside_table_path(spark, tmp_path):
    tbl = tmp_path / "tbl_guard"
    src = tbl / "raw"
    spark.createDataFrame([(1, 1.0)], "k bigint, x double").write.parquet(
        str(src)
    )
    with pytest.raises(ValueError, match="inside the table path"):
        SnapshotTable.convert(spark, str(tbl), str(src), key="k")
    assert os.path.exists(str(src))  # nothing destroyed
