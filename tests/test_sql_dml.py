"""SQL-text DML dispatcher tests (mr_spark/sql_dml.py) — DELETE FROM /
UPDATE SET / MERGE INTO statement text routed to SnapshotTable methods
through registered snapshot views, with the shared predicate grammar
and loud refusals for anything outside it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mr_spark.acid import SnapshotTable
from mr_spark.sql_dml import execute_dml
from mr_spark.sources.snapshot_source import register_snapshot_view


ROWS = [(k, "even" if k % 2 == 0 else "odd", float(k)) for k in range(40)]


def _mk(spark, tmp_path, name, rows=ROWS, **kw):
    df = spark.createDataFrame(rows, "k bigint, grp string, x double")
    t = SnapshotTable.create(
        spark, str(tmp_path / name), df, key="k", n_buckets=4, **kw
    )
    register_snapshot_view(spark, name, t.path)
    return t


def test_sql_delete_where(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqldml_d")
    v = execute_dml(spark, "DELETE FROM sqldml_d WHERE k IN (3, 7) OR k BETWEEN 30 AND 39")
    assert v == 2
    got = sorted(r["k"] for r in t.read().collect())
    assert got == [k for k in range(30) if k not in (3, 7)]
    # the SQL read surface sees the post-DML state (view rebinds)
    assert spark.sql("SELECT COUNT(*) AS n FROM sqldml_d").first()["n"] == 28


def test_sql_delete_full_and_dv_mode(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqldml_dv")
    v = execute_dml(spark, "DELETE FROM sqldml_dv WHERE x <= 4.0", mode="dv")
    m = t._manifest(v)
    assert m.get("dvs")  # merge-on-read
    assert t.read().count() == 35
    execute_dml(spark, "DELETE FROM sqldml_dv")
    assert t.read().count() == 0


def test_sql_update_set(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqldml_u")
    execute_dml(
        spark,
        "UPDATE sqldml_u SET x = x * 2, grp = 'hit' "
        "WHERE grp <> 'odd' AND k <= 10",
    )
    got = {r["k"]: (r["grp"], r["x"]) for r in t.read().collect()}
    for k, g, x in ROWS:
        if g == "even" and k <= 10:
            assert got[k] == ("hit", x * 2)
        else:
            assert got[k] == (g, x)


def test_sql_update_where_keyword_inside_literal(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqldml_lit")
    # a SET literal containing ' WHERE ' must not split the statement
    execute_dml(
        spark,
        "UPDATE sqldml_lit SET grp = 'a WHERE b' WHERE k = 0",
    )
    assert [
        r["grp"] for r in t.read().where("k = 0").collect()
    ] == ["a WHERE b"]


def test_sql_merge_upsert_and_clauses(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqldml_m")
    src = spark.createDataFrame(
        [(0, "upd", 100.0), (1000, "new", 1.0)], "k bigint, grp string, x double"
    )
    src.createOrReplaceTempView("sqldml_m_src")
    v = execute_dml(
        spark,
        """MERGE INTO sqldml_m AS t USING sqldml_m_src AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
    )
    assert v == 2
    got = {r["k"]: r["grp"] for r in t.read().collect()}
    assert got[0] == "upd" and got[1000] == "new" and len(got) == 41
    # conditional clause with expressions over t./s. aliases
    execute_dml(
        spark,
        """MERGE INTO sqldml_m t USING sqldml_m_src s ON t.k = s.k
           WHEN MATCHED AND s.grp = 'upd' THEN UPDATE SET x = t.x + s.x""",
    )
    assert t.read().where("k = 0").first()["x"] == 200.0


def test_sql_dml_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqldml_r")
    register_snapshot_view(spark, "sqldml_r_v1", t.path, version=1)
    with pytest.raises(ValueError, match="not a registered snapshot view"):
        execute_dml(spark, "DELETE FROM nosuch WHERE k = 1")
    with pytest.raises(ValueError, match="read-only history"):
        execute_dml(spark, "DELETE FROM sqldml_r_v1 WHERE k = 1")
    with pytest.raises(ValueError, match="expected a comparison|parse"):
        execute_dml(spark, "DELETE FROM sqldml_r WHERE grp LIKE 'e%'")
    with pytest.raises(ValueError, match="parenthesise"):
        execute_dml(spark, "DELETE FROM sqldml_r WHERE k = 1 OR k = 2 AND k = 3")
    with pytest.raises(ValueError, match="aliases"):
        execute_dml(
            spark,
            "MERGE INTO sqldml_r AS a USING sqldml_r AS b ON a.k = b.k "
            "WHEN MATCHED THEN DELETE",
        )
    # r9 flip: a non-key ON anchor is no longer refused — it takes the
    # documented full-closure path (see test_sql_merge_non_key_on);
    # what still refuses is an ON with no t=s equality at all
    with pytest.raises(ValueError, match="cartesian"):
        src = spark.createDataFrame([(1, "z", 0.0)], "k bigint, grp string, x double")
        src.createOrReplaceTempView("sqldml_r_src")
        execute_dml(
            spark,
            "MERGE INTO sqldml_r t USING sqldml_r_src s ON t.k > s.k "
            "WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="unsupported statement"):
        execute_dml(spark, "CREATE INDEX idx ON sqldml_r (k)")
    with pytest.raises(ValueError, match="must start with VALUES or SELECT"):
        execute_dml(spark, "INSERT INTO sqldml_r SET k = 1")
    # nothing committed by any refusal
    assert t.latest_version() == 1


def test_sql_dml_predicate_planning_is_stats_driven(spark, tmp_path):
    """The SQL path inherits the trichotomy: a partition IN-delete via
    statement text commits metadata-only."""
    rows = [(k, "even" if k % 2 == 0 else "odd", float(k)) for k in range(40)]
    t = _mk(spark, tmp_path, "sqldml_p", rows=rows, partition_by="grp")
    execute_dml(spark, "DELETE FROM sqldml_p WHERE grp IN ('even')")
    mx = {r["version"]: r for r in t.history()}[2]["params"]["metrics"]
    assert mx["files_rewritten"] == 0
    assert mx["files_fully_removed"] > 0
    assert {r["grp"] for r in t.read().collect()} == {"odd"}


def test_sql_optimize_vacuum_restore(spark, tmp_path):
    """The utility statements: OPTIMIZE compacts (optionally scoped to
    a partition / ZORDER BY), VACUUM honors RETAIN and DRY RUN,
    RESTORE rolls back — all as statement text."""
    rows = [(k, "even" if k % 2 == 0 else "odd", float(k)) for k in range(40)]
    t = _mk(spark, tmp_path, "sqldml_util", rows=rows, partition_by="grp")
    # create append debris so OPTIMIZE has work
    t.append(
        spark.createDataFrame(
            [(100 + k, "even", 0.5) for k in range(4)],
            "k bigint, grp string, x double",
        )
    )
    before = dict(t._manifest(t.latest_version())["files"])
    v = execute_dml(spark, "OPTIMIZE sqldml_util WHERE grp = 'even'")
    after = t._manifest(v)["files"]
    for b, rels in before.items():  # the odd partition untouched
        if b.startswith("odd|"):
            assert after[b] == rels
    assert t.read().count() == 44  # data unchanged
    # RESTORE as text FIRST (while the old manifests still exist):
    # roll back to the pre-append version — 40 rows again, and the SQL
    # read surface (rebound view) agrees
    execute_dml(spark, "RESTORE sqldml_util TO VERSION AS OF 1")
    assert t.read().count() == 40
    assert spark.sql("SELECT COUNT(*) AS n FROM sqldml_util").first()["n"] == 40
    # expire superseded manifests so the optimize/append debris becomes
    # unreferenced, then: DRY RUN reports without deleting or
    # committing; the real VACUUM collects exactly that set
    t.expire_versions(min_age_seconds=0)
    v0 = t.latest_version()
    would = execute_dml(spark, "VACUUM sqldml_util RETAIN 0 HOURS DRY RUN")
    assert isinstance(would, list) and would
    assert t.latest_version() == v0
    assert all(os.path.exists(os.path.join(t.path, p)) for p in would)
    got = execute_dml(spark, "VACUUM sqldml_util RETAIN 0 HOURS")
    assert sorted(got) == sorted(would)
    assert t.read().count() == 40  # live data untouched


def test_sql_optimize_zorder_and_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqldml_z")
    t.append(
        spark.createDataFrame(
            [(100, "z", 9.0), (101, "z", 8.0)], "k bigint, grp string, x double"
        )
    )
    v = execute_dml(spark, "OPTIMIZE sqldml_z ZORDER BY (k, x)")
    assert v == 3
    assert t.read().count() == 42
    with pytest.raises(ValueError, match="partition column"):
        execute_dml(spark, "OPTIMIZE sqldml_z WHERE grp = 'even'")
    with pytest.raises(ValueError, match="single equality"):
        _mk(spark, tmp_path, "sqldml_z2", partition_by="grp")
        execute_dml(spark, "OPTIMIZE sqldml_z2 WHERE grp IN ('even')")
    with pytest.raises(ValueError, match="unsupported statement"):
        execute_dml(spark, "REFRESH TABLE sqldml_z")


def test_sql_alter_statements(spark, tmp_path):
    """ALTER TABLE text: ADD COLUMN with both default kinds, RENAME,
    widening, constraints, DROP COLUMN — all metadata-only routes."""
    t = _mk(spark, tmp_path, "sqldml_a")
    execute_dml(
        spark,
        "ALTER TABLE sqldml_a ADD COLUMN tier STRING "
        "INITIAL DEFAULT 'legacy' DEFAULT 'web'",
    )
    assert t._manifest(2)["files"] == t._manifest(1)["files"]
    got = {r["k"]: r["tier"] for r in t.read().collect()}
    assert set(got.values()) == {"legacy"}
    t.append(spark.createDataFrame([(100, "n")], "k bigint, grp string"))
    assert t.read().where("k = 100").first()["tier"] == "web"
    # the SQL read surface sees the new column (view rebinds)
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM sqldml_a WHERE tier = 'legacy'"
    ).first()["n"] == 40
    execute_dml(spark, "ALTER TABLE sqldml_a RENAME COLUMN tier TO band")
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM sqldml_a WHERE band = 'web'"
    ).first()["n"] == 1
    execute_dml(spark, "ALTER TABLE sqldml_a ADD COLUMN n2 INT")
    execute_dml(spark, "ALTER TABLE sqldml_a ALTER COLUMN n2 TYPE BIGINT")
    assert dict(t.read().dtypes)["n2"] == "bigint"
    execute_dml(
        spark, "ALTER TABLE sqldml_a ADD CONSTRAINT x_pos CHECK (x >= 0.0)"
    )
    with pytest.raises(Exception, match="constraint"):
        t.append(
            spark.createDataFrame(
                [(200, "bad", -1.0)], "k bigint, grp string, x double"
            )
        )
    execute_dml(spark, "ALTER TABLE sqldml_a DROP CONSTRAINT x_pos")
    execute_dml(spark, "ALTER TABLE sqldml_a DROP COLUMN n2")
    assert "n2" not in t.read().columns
    with pytest.raises(ValueError, match="unsupported ALTER"):
        execute_dml(spark, "ALTER TABLE sqldml_a SET TBLPROPERTIES (a=1)")
    with pytest.raises(ValueError, match="lossless"):
        execute_dml(spark, "ALTER TABLE sqldml_a ALTER COLUMN x TYPE INT")


def test_sql_describe_statements(spark, tmp_path):
    """DESCRIBE HISTORY / DESCRIBE DETAIL as statement text return
    DataFrames — SQL-only introspection over the snapshot session."""
    t = _mk(spark, tmp_path, "sqldml_desc")
    execute_dml(spark, "DELETE FROM sqldml_desc WHERE k IN (1, 2)")
    h = execute_dml(spark, "DESCRIBE HISTORY sqldml_desc")
    rows = {r["version"]: r for r in h.collect()}
    assert rows[2]["operation"] == "DELETE" and rows[1]["operation"] == "CREATE"
    assert "metrics" in rows[2]["params"]
    assert execute_dml(
        spark, "DESCRIBE HISTORY sqldml_desc LIMIT 1"
    ).count() == 1
    d = execute_dml(spark, "DESCRIBE DETAIL sqldml_desc").first()
    assert d["numFiles"] >= 1 and d["version"] == 2


# ---- INSERT family / table lifecycle statements ----------------------------


def test_sql_insert_values_and_select(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqlins_v")
    v = execute_dml(
        spark,
        "INSERT INTO sqlins_v VALUES (100, 'ins', 1.5), (101, 'ins', 2.5)",
    )
    assert v == 2
    got = {r["k"]: (r["grp"], r["x"]) for r in t.read().collect()}
    assert got[100] == ("ins", 1.5) and got[101] == ("ins", 2.5)
    execute_dml(
        spark,
        "INSERT INTO sqlins_v SELECT k + 200, grp, x FROM sqlins_v "
        "WHERE k IN (100, 101)",
    )
    got = {r["k"] for r in t.read().collect()}
    assert {300, 301} <= got
    # the SQL read surface serves the inserts (view rebinds)
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM sqlins_v").first()["n"]
        == len(ROWS) + 4
    )


def test_sql_insert_column_list_casts_and_defaults(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqlins_c")
    # omitted column (x) reads NULL; int literal casts to bigint k
    execute_dml(spark, "INSERT INTO sqlins_c (k, grp) VALUES (500, 'part')")
    row = t.read().where("k = 500").collect()[0]
    assert row["grp"] == "part" and row["x"] is None
    with pytest.raises(ValueError, match="not in the table schema"):
        execute_dml(spark, "INSERT INTO sqlins_c (nope) VALUES (1)")
    with pytest.raises(ValueError, match="duplicate column"):
        execute_dml(spark, "INSERT INTO sqlins_c (k, k) VALUES (1, 2)")


def test_sql_insert_overwrite_full(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqlins_o")
    v1 = t.latest_version()
    v = execute_dml(
        spark, "INSERT OVERWRITE sqlins_o VALUES (1, 'only', 9.0)"
    )
    assert v == v1 + 1  # ONE atomic commit
    assert [r["k"] for r in t.read().collect()] == [1]
    assert t.read(version=v1).count() == len(ROWS)  # time travel intact
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlins_o").first()["n"] == 1


def test_sql_insert_overwrite_static_partition(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqlins_p", partition_by="grp")
    execute_dml(
        spark,
        "INSERT OVERWRITE sqlins_p PARTITION (grp = 'even') "
        "(k, x) VALUES (2, 2.0), (4, 4.0)",
    )
    got = sorted((r["k"], r["grp"]) for r in t.read().collect())
    exp = sorted(
        [(2, "even"), (4, "even")]
        + [(k, g) for k, g, _ in ROWS if g == "odd"]
    )
    assert got == exp
    # the source must omit the partition column
    with pytest.raises(ValueError, match="must omit"):
        execute_dml(
            spark,
            "INSERT OVERWRITE sqlins_p PARTITION (grp = 'odd') "
            "VALUES (1, 'odd', 1.0)",
        )
    # PARTITION spec on plain INSERT INTO refuses
    with pytest.raises(ValueError, match="only valid on INSERT OVERWRITE"):
        execute_dml(
            spark,
            "INSERT INTO sqlins_p PARTITION (grp = 'odd') (k, x) VALUES (1, 1.0)",
        )


def test_sql_truncate_is_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqltrunc")
    n_files = sum(len(r) for r in t._manifest(1)["files"].values())
    v = execute_dml(spark, "TRUNCATE TABLE sqltrunc")
    assert t.read().count() == 0
    h = {r["version"]: r for r in t.history()}
    mx = h[v]["params"]["metrics"]
    assert mx["files_fully_removed"] == n_files
    assert mx["files_rewritten"] == 0
    assert spark.sql("SELECT COUNT(*) AS n FROM sqltrunc").first()["n"] == 0


def test_sql_copy_into_directory_idempotent(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqlcopy")
    land = tmp_path / "landing"
    spark.createDataFrame(
        [(900, "land", 9.0)], "k bigint, grp string, x double"
    ).coalesce(1).write.parquet(str(land / "batch1"))
    # one data file in a directory; hidden/_SUCCESS files must be skipped
    v, loaded, skipped = execute_dml(
        spark, f"COPY INTO sqlcopy FROM '{land / 'batch1'}'"
    )
    assert loaded >= 1
    assert t.read().where("k = 900").count() == 1
    v2, loaded2, skipped2 = execute_dml(
        spark, f"COPY INTO sqlcopy FROM '{land / 'batch1'}'"
    )
    assert v2 == v and loaded2 == 0  # full replay commits nothing


def test_sql_create_table_as_select_and_lifecycle(spark, tmp_path):
    _mk(spark, tmp_path, "sqlsrc")
    loc = str(tmp_path / "ctas_tbl")
    v = execute_dml(
        spark,
        f"CREATE TABLE sqlctas USING snapshot LOCATION '{loc}' "
        "PARTITIONED BY (bucket(4, k), grp) "
        "AS SELECT k, grp, x FROM sqlsrc WHERE k < 10",
    )
    assert v == 1
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlctas").first()["n"] == 10
    # the created table is a full citizen: SHOW PARTITIONS + DML work
    parts = execute_dml(spark, "SHOW PARTITIONS sqlctas")
    assert sorted(r["grp"] for r in parts.collect()) == ["even", "odd"]
    execute_dml(spark, "DELETE FROM sqlctas WHERE grp = 'odd'")
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlctas").first()["n"] == 5
    with pytest.raises(ValueError, match="already a registered"):
        execute_dml(
            spark,
            f"CREATE TABLE sqlctas USING snapshot LOCATION '{loc}2' "
            "PARTITIONED BY (bucket(2, k)) AS SELECT k FROM sqlsrc",
        )
    execute_dml(spark, "DROP TABLE sqlctas")
    with pytest.raises(ValueError, match="not a registered snapshot view"):
        execute_dml(spark, "DELETE FROM sqlctas")
    # external-location semantics: the data stayed; re-register reads it
    t2 = SnapshotTable(spark, loc)
    assert t2.read().count() == 5


def test_sql_create_table_requires_bucket_transform(spark, tmp_path):
    _mk(spark, tmp_path, "sqlsrc2")
    with pytest.raises(ValueError, match="bucket"):
        execute_dml(
            spark,
            f"CREATE TABLE sqlbad USING snapshot LOCATION "
            f"'{tmp_path / 'bad'}' PARTITIONED BY (grp) "
            "AS SELECT k, grp FROM sqlsrc2",
        )


def test_sql_show_partitions_refuses_unpartitioned(spark, tmp_path):
    _mk(spark, tmp_path, "sqlnopart")
    with pytest.raises(ValueError, match="not value-partitioned"):
        execute_dml(spark, "SHOW PARTITIONS sqlnopart")


def test_sql_insert_identity_columns_never_insertable(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k bigint, grp string")
    t = SnapshotTable.create(
        spark, str(tmp_path / "ident_sql"), df, key="k", n_buckets=2,
        identity="rid",
    )
    register_snapshot_view(spark, "sqlident", t.path)
    # default column list excludes the identity column
    execute_dml(spark, "INSERT INTO sqlident VALUES (2, 'b')")
    ids = {r["rid"] for r in t.read().collect()}
    assert len(ids) == 2
    with pytest.raises(ValueError, match="always generated"):
        execute_dml(spark, "INSERT INTO sqlident (k, grp, rid) VALUES (3, 'c', 99)")


def test_sql_table_changes_tvf(spark, tmp_path):
    """Delta's CDF TVF spelling rewritten in place: the per-commit feed
    serves a plain SELECT, versions slice correctly, and two references
    in one statement bind independently."""
    t = _mk(spark, tmp_path, "sqltc")
    execute_dml(spark, "DELETE FROM sqltc WHERE k BETWEEN 0 AND 4")
    execute_dml(spark, "INSERT INTO sqltc VALUES (1000, 'new', 1.0)")
    out = execute_dml(
        spark,
        "SELECT _change_type, COUNT(*) AS n "
        "FROM table_changes('sqltc', 2, 3) "
        "GROUP BY _change_type ORDER BY _change_type",
    )
    got = {r["_change_type"]: r["n"] for r in out.collect()}
    assert got == {"delete": 5, "insert": 1}
    # v1 slice = create-as-inserts; bounded range excludes later commits
    n1 = execute_dml(
        spark, "SELECT COUNT(*) AS n FROM table_changes('sqltc', 1, 1)"
    ).first()["n"]
    assert n1 == len(ROWS)
    # two references in one SELECT bind to distinct temp views
    both = execute_dml(
        spark,
        "SELECT (SELECT COUNT(*) FROM table_changes('sqltc', 1, 1)) AS a, "
        "(SELECT COUNT(*) FROM table_changes('sqltc', 2, 2)) AS b",
    ).first()
    assert (both["a"], both["b"]) == (len(ROWS), 5)
    with pytest.raises(ValueError, match="not a registered"):
        execute_dml(spark, "SELECT * FROM table_changes('nope', 1)")
    with pytest.raises(ValueError, match="only rewrites"):
        execute_dml(spark, "SELECT 1 AS one")


def test_sql_time_travel_rewrites(spark, tmp_path):
    """VERSION AS OF / TIMESTAMP AS OF in a SELECT bind pinned
    snapshot-source views in place — Delta's time-travel SQL."""
    t = _mk(spark, tmp_path, "sqltt")
    execute_dml(spark, "DELETE FROM sqltt WHERE k < 20")
    n1 = execute_dml(
        spark, "SELECT COUNT(*) AS n FROM sqltt VERSION AS OF 1"
    ).first()["n"]
    assert n1 == len(ROWS)
    # mixed: current view and a pinned version in ONE statement
    row = execute_dml(
        spark,
        "SELECT (SELECT COUNT(*) FROM sqltt VERSION AS OF 1) AS was, "
        "(SELECT COUNT(*) FROM sqltt) AS now",
    ).first()
    assert (row["was"], row["now"]) == (len(ROWS), 20)
    # timestamp form: any time at/after v1's commit but before v2 reads v1
    v1_path = os.path.join(
        t._versions_dir(), sorted(os.listdir(t._versions_dir()))[0]
    )
    ts1 = t._commit_ts(1, v1_path)
    n_ts = execute_dml(
        spark, f"SELECT COUNT(*) AS n FROM sqltt TIMESTAMP AS OF {ts1}"
    ).first()["n"]
    assert n_ts == len(ROWS)


def test_sql_facade_routes_everything(spark, tmp_path):
    """mr_spark.sql_dml.sql: one entrypoint — DML text commits, plain
    SELECT and non-snapshot statements fall through to spark.sql."""
    from mr_spark.sql_dml import sql as mr_sql

    t = _mk(spark, tmp_path, "sqlfacade")
    v = mr_sql(spark, "DELETE FROM sqlfacade WHERE k >= 30")
    assert v == 2 and t.read().count() == 30
    assert mr_sql(spark, "SELECT 1 + 1 AS two").first()["two"] == 2
    # engine-owned statement falls through (WITH is not a dispatcher verb)
    n = mr_sql(
        spark, "WITH c AS (SELECT 1 AS x) SELECT COUNT(*) AS n FROM c"
    ).first()["n"]
    assert n == 1
    # rewritten SELECT still routes through the dispatcher
    was = mr_sql(
        spark, "SELECT COUNT(*) AS n FROM sqlfacade VERSION AS OF 1"
    ).first()["n"]
    assert was == len(ROWS)


def test_sql_clone_statement(spark, tmp_path):
    """CREATE TABLE ... SHALLOW|DEEP CLONE as statement text: the
    shallow clone serves the source state (optionally a pinned
    version), the deep clone survives source deletion."""
    import shutil

    t = _mk(spark, tmp_path, "sqlcl_src")
    execute_dml(spark, "DELETE FROM sqlcl_src WHERE k >= 20")
    execute_dml(
        spark,
        "CREATE TABLE sqlcl_sh SHALLOW CLONE sqlcl_src VERSION AS OF 1 "
        f"LOCATION '{tmp_path / 'sh'}'",
    )
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM sqlcl_sh").first()["n"]
        == len(ROWS)  # pinned pre-delete version
    )
    execute_dml(
        spark,
        f"CREATE TABLE sqlcl_dp DEEP CLONE sqlcl_src LOCATION '{tmp_path / 'dp'}'",
    )
    # deep clone is self-contained: delete the source outright
    shutil.rmtree(t.path)
    execute_dml(spark, "DROP TABLE sqlcl_src")
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlcl_dp").first()["n"] == 20
    # the clone is a full citizen: DML through its view
    execute_dml(spark, "DELETE FROM sqlcl_dp WHERE k < 10")
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlcl_dp").first()["n"] == 10


def test_sql_analyze_and_generate(spark, tmp_path):
    """ANALYZE recomputes footer stats metadata-only; GENERATE exports
    the symlink manifest — both as statement text."""
    t = _mk(spark, tmp_path, "sqlana")
    m1 = t._manifest(1)
    v = execute_dml(spark, "ANALYZE TABLE sqlana COMPUTE STATISTICS")
    if v != 1:  # fresh tables may already carry current stats (no-op)
        m2 = t._manifest(v)
        assert m2["files"] == m1["files"]  # zero data movement
    paths = execute_dml(spark, "GENERATE symlink_format_manifest FOR TABLE sqlana")
    assert isinstance(paths, list) and paths
    assert all(os.path.exists(p) for p in paths)


def test_sql_restore_timestamp_apply_changes_describe_files(spark, tmp_path):
    """The last statement spellings: RESTORE TO TIMESTAMP AS OF,
    APPLY CHANGES INTO (the DLT verb), DESCRIBE FILES."""
    t = _mk(spark, tmp_path, "sqlmisc")
    v1_path = os.path.join(
        t._versions_dir(), sorted(os.listdir(t._versions_dir()))[0]
    )
    ts1 = t._commit_ts(1, v1_path)
    execute_dml(spark, "DELETE FROM sqlmisc WHERE k < 10")
    # APPLY CHANGES: a CDF-shaped feed (delete one key, upsert another)
    spark.createDataFrame(
        [("delete", 15, "odd", 15.0), ("insert", 500, "new", 5.0)],
        "_change_type string, k bigint, grp string, x double",
    ).createOrReplaceTempView("sqlmisc_feed")
    execute_dml(
        spark, "APPLY CHANGES INTO sqlmisc FROM sqlmisc_feed BATCH 1 APP 'r'"
    )
    got = {r["k"] for r in t.read().collect()}
    assert 15 not in got and 500 in got
    # replayed batch commits nothing
    v = t.latest_version()
    execute_dml(
        spark, "APPLY CHANGES INTO sqlmisc FROM sqlmisc_feed BATCH 1 APP 'r'"
    )
    assert t.latest_version() == v
    # DESCRIBE FILES: manifest-only per-file inventory
    files = execute_dml(spark, "DESCRIBE FILES sqlmisc").collect()
    assert files and all(r["bytes"] > 0 for r in files)
    m = t._manifest(t.latest_version())
    assert len(files) == sum(len(r) for r in m["files"].values())
    # RESTORE TO TIMESTAMP: back to v1 state
    execute_dml(
        spark, f"RESTORE sqlmisc TO TIMESTAMP AS OF {ts1}"
    )
    assert t.read().count() == len(ROWS)
    assert spark.sql("SELECT COUNT(*) AS n FROM sqlmisc").first()["n"] == len(ROWS)


def test_sql_merge_extra_on_conjuncts(spark, tmp_path):
    """Delta's arbitrary ON, part 1: extra conjuncts beyond the key
    equality — a key-equal pair failing them is NOT a match (the pair
    splits: target row -> by-source side, source row -> insert side)."""
    t = _mk(spark, tmp_path, "sqldml_on")
    src = spark.createDataFrame(
        [(0, "even", 500.0), (1, "zzz", 600.0)],
        "k bigint, grp string, x double",
    )
    src.createOrReplaceTempView("sqldml_on_src")
    execute_dml(
        spark,
        """MERGE INTO sqldml_on t USING sqldml_on_src s
           ON t.k = s.k AND t.grp = s.grp
           WHEN MATCHED THEN UPDATE SET x = s.x
           WHEN NOT MATCHED THEN INSERT *""",
    )
    got = {r["k"]: (r["grp"], r["x"]) for r in t.read().collect()}
    # k=0: grp matches ('even'='even') -> updated in place
    assert got[0] == ("even", 500.0)
    # k=1: key matches but grp doesn't ('odd' != 'zzz') -> NOT a match:
    # the target row keeps, the source row INSERTS — Delta would now
    # hold both incarnations of k=1 (the table is keyed but merge ON
    # semantics rule; the duplicate is the caller's to manage)
    ks = sorted(r["k"] for r in t.read().where("k = 1").collect())
    assert ks == [1, 1]
    grps = sorted(r["grp"] for r in t.read().where("k = 1").collect())
    assert grps == ["odd", "zzz"]


def test_sql_merge_non_key_on(spark, tmp_path):
    """Delta's arbitrary ON, part 2 (refusal -> support flip): ON
    anchored on a NON-key column runs the documented full-closure path
    — every bucket read and rewritten, multiple target rows per source
    row each take the action."""
    t = _mk(spark, tmp_path, "sqldml_fc")
    src = spark.createDataFrame(
        [("even", 0.0)], "grp string, x double"
    )
    src.createOrReplaceTempView("sqldml_fc_src")
    v = execute_dml(
        spark,
        """MERGE INTO sqldml_fc t USING sqldml_fc_src s ON t.grp = s.grp
           WHEN MATCHED THEN UPDATE SET x = t.x + 1000""",
    )
    got = {r["k"]: r["x"] for r in t.read().collect()}
    for k in range(40):
        assert got[k] == (float(k) + 1000 if k % 2 == 0 else float(k))
    assert v == 2
    # full closure: every bucket was rewritten (no file carried over)
    m1, m2 = t._manifest(1), t._manifest(2)
    assert all(m2["files"][b] != m1["files"].get(b) for b in m2["files"])
    # by-source + non-key ON compose: delete every target row whose grp
    # has no source match
    execute_dml(
        spark,
        """MERGE INTO sqldml_fc t USING sqldml_fc_src s ON t.grp = s.grp
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
    )
    assert sorted(r["k"] for r in t.read().collect()) == list(range(0, 40, 2))
    # an INSERT clause without the bucket key in the source refuses
    with pytest.raises(ValueError, match="bucket key"):
        execute_dml(
            spark,
            """MERGE INTO sqldml_fc t USING sqldml_fc_src s ON t.grp = s.grp
               WHEN NOT MATCHED THEN INSERT *""",
        )
