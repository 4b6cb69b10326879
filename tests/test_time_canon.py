"""Integration pins for the ADVICE r8 time-canonicalization fixes:
boundary instants must never be falsely proven disjoint.

The three failure shapes, each reproduced end-to-end before the fix:

1. days() over a DATE column — footer stats are bare "yyyy-MM-dd", so a
   " 00:00:00"-suffixed interval lower bound compared ABOVE a stat equal
   to the targeted day, letting drop_partition/replace_where falsely
   prove foreign-spec files disjoint (rows left live / duplicated).
2. identity partition by a TIMESTAMP column — canonical datetime
   constants carry ".000000" but Spark-cast pvals trim it, so exact
   pval equality silently pruned the matching bucket.
3. second-precision string constants vs microsecond-width stats — a
   file whose min IS the queried instant was skipped while the row
   filter would have matched (silent row loss at exact boundaries).

Reference parity note: the reference engine (BugenZhao/6.824-MapReduce)
has no predicate planner; this battery pins the lakehouse extension
tier's data-skipping soundness like tests/test_predicates.py does at
unit level.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from mr_spark.acid import SnapshotTable


def _date_df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, d date, x double")


def _ts_df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, ts timestamp, x double")


def test_days_over_date_column_refuses_unprovable_drop(spark, tmp_path):
    # pre-evolution (unpartitioned spec-0) files CONTAIN the targeted
    # day — drop_partition must refuse, not silently leave rows live
    old = [(i, dt.date(2024, 1, 20 + i % 6), float(i)) for i in range(24)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "dd_t"),
        _date_df(spark, old),
        key="k",
        n_buckets=2,
    )
    t.set_partition_spec(("days", "d"))
    new = [(100 + i, dt.date(2024, 2, 1 + i % 3), 1.0) for i in range(9)]
    t.append(_date_df(spark, new))
    with pytest.raises(ValueError, match="different partition spec"):
        t.drop_partition("2024-01-25")  # day lives in old DATE-stats files
    # a day present ONLY under the new spec drops cleanly
    n = t.read().count()
    gone = sum(1 for r in new if r[1].isoformat() == "2024-02-01")
    assert gone
    t.drop_partition("2024-02-01")
    assert t.read().count() == n - gone
    # and the dropped day's rows are really gone, others intact
    assert t.read(where=("=", "d", dt.date(2024, 2, 1))).count() == 0
    assert t.read(where=("=", "d", dt.date(2024, 1, 25))).count() == sum(
        1 for r in old if r[1] == dt.date(2024, 1, 25)
    )


def test_identity_timestamp_partition_whole_second_constant(spark, tmp_path):
    # identity-partitioned by a timestamp column: whole-second pvals
    # are Spark-cast-trimmed ("... 12:00:00"); the canonical constant
    # is microsecond-width — equality must still find the bucket
    hours = [dt.datetime(2024, 1, 25, h) for h in (6, 12, 18)]
    rows = [(i, hours[i % 3], float(i)) for i in range(30)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "tsid_t"),
        _ts_df(spark, rows),
        key="k",
        n_buckets=2,
        partition_by="ts",
    )
    want = sum(1 for r in rows if r[1] == hours[1])
    got = t.read(where=("=", "ts", dt.datetime(2024, 1, 25, 12)))
    assert got.count() == want
    # the prune actually fired AND kept only the matching partition
    pr = t.last_partition_prune
    assert pr and pr["kept_buckets"] < pr["total_buckets"]
    # IN-list and point-between shapes agree
    assert t.read(
        where=("in", "ts", [dt.datetime(2024, 1, 25, 12)])
    ).count() == want
    assert t.read(
        where=("ts", dt.datetime(2024, 1, 25, 12), dt.datetime(2024, 1, 25, 12))
    ).count() == want


def test_second_precision_string_boundary_not_skipped(spark, tmp_path):
    # one file's min IS the queried instant (microsecond-width stats);
    # bare-second / bare-date string constants must keep the file
    base = dt.datetime(2024, 1, 25, 12, 0, 0)
    rows = [(i, base + dt.timedelta(minutes=i), float(i)) for i in range(20)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "tsb_t"),
        _ts_df(spark, rows),
        key="k",
        n_buckets=1,
    )
    assert t.read(where=("=", "ts", "2024-01-25 12:00:00")).count() == 1
    assert t.read(where=(">=", "ts", "2024-01-25 12:00:00")).count() == len(rows)
    assert t.read(where=("<=", "ts", "2024-01-25 12:05:00")).count() == 6
    # bare DATE string over the timestamp column = midnight instant
    assert t.read(where=(">", "ts", "2024-01-25")).count() == len(rows)
    # file-level: the boundary file survives planning
    paths = t.data_paths(where=("=", "ts", "2024-01-25 12:00:00"))
    assert len(paths) == 1
    # V2 source takes the same constants through SQL-text where
    from mr_spark.sources.snapshot_source import register

    register(spark)
    got = (
        spark.read.format("snapshot")
        .option("path", t.path)
        .option("where", "ts >= '2024-01-25 12:00:00' AND ts <= '2024-01-25 12:05:00'")
        .load()
    )
    assert got.count() == 6


def test_string_column_iso_lookalikes_unaffected(spark, tmp_path):
    # a genuine STRING column holding ISO-looking text must NOT be
    # widened: "2024-01-25 12:00:00" and "...12:00:00.000000" are
    # different strings, and equality must respect that
    rows = [(1, "2024-01-25 12:00:00", 1.0), (2, "2024-01-25 12:00:00.000000", 2.0)]
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "str_t"),
        spark.createDataFrame(rows, "k bigint, s string, x double"),
        key="k",
        n_buckets=1,
    )
    assert t.read(where=("=", "s", "2024-01-25 12:00:00")).count() == 1
    assert t.read(where=("=", "s", "2024-01-25 12:00:00.000000")).count() == 1
