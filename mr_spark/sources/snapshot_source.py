"""Batch Python DataSource for SnapshotTable — ``spark.read.format(
"snapshot").option("path", tbl).load()`` with FILTER PUSHDOWN INTO
MANIFEST PRUNING (Spark 4 ``DataSourceReader.pushFilters``).

This closes the acid.py module docstring's remaining driver-cost note:
``read()`` materializes the pruned path list on the driver because
``spark.read.parquet`` takes paths — this source is the Delta-FileIndex
shape instead: Spark hands the scan's filters to the reader DURING
PLANNING, the reader prunes files from the manifest alone (footer
[min, max] ranges for range predicates, per-file bloom probes for point
predicates on indexed columns — the same ladder as
``SnapshotTable.data_paths``), and only the surviving files become input
partitions. Executors read them under the MANIFEST schema (evolved
columns NULL-fill for old files) and apply deletion vectors by row
position — full snapshot semantics through the standard reader API.

Pushdown contract: ``pushFilters`` returns ALL filters as unhandled, so
Spark re-applies them row-level after the scan — pruning here is an
optimization, never a correctness dependency (exactly how file-skipping
behaves in Delta: advisory at plan time, rechecked at run time). Only
top-level AND conjuncts arrive through this API (Spark's contract), and
only single-column comparisons against literals are used for pruning;
everything else is ignored.

Scale: the pruning decision is O(live files) driver-side metadata work
with ZERO file opens — at 10^5 files a point lookup plans in manifest
memory; the alternative (listing every file into a parquet scan and
letting row groups filter) opens every footer.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


def _table(path: str):
    """Spark-less SnapshotTable handle (manifest I/O only) — same trick
    as sources/cdf_stream.py."""
    from ..acid import SnapshotTable

    return SnapshotTable(None, path)


class SnapshotDataSource(DataSource):
    """``spark.read.format("snapshot")`` — options:

    * ``path``: the snapshot table directory (required)
    * ``version``: version to read (default: latest) — time travel
    * ``timestamp_as_of``: unix seconds — Delta's ``timestampAsOf``:
      read the latest version committed at or before the instant
      (mutually exclusive with ``version``)
    """

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def _pinned_version(self) -> int:
        """Resolve the version ONCE per DataSource instance: schema()
        and reader()/partitions() resolving "latest" independently would
        let a commit landing in between mix one version's declared
        schema with the next version's data — the same hazard
        acid.read() documents ("resolve the version once")."""
        v = self.options.get("version")
        ts = self.options.get("timestamp_as_of")
        if v is not None and ts is not None:
            raise ValueError(
                "pass either option('version') or "
                "option('timestamp_as_of'), not both"
            )
        if v is not None:
            return int(v)
        if not hasattr(self, "_pin"):
            path = self.options.get("path")
            if not path:
                raise ValueError(
                    "snapshot source needs option('path', <table dir>)"
                )
            self._pin = (
                _table(path).version_at(float(ts))
                if ts is not None
                else _table(path).latest_version()
            )
        return self._pin

    def schema(self) -> StructType:
        t = _table(self.options["path"])
        m = t._manifest(self._pinned_version())
        return StructType.fromJson(json.loads(m["schema"]))

    def reader(self, schema: StructType) -> "SnapshotReader":
        return SnapshotReader(self.options, version=self._pinned_version())

    def writer(self, schema: StructType, overwrite: bool):
        from .snapshot_sink import SnapshotWriter

        return SnapshotWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise NotImplementedError(
                "snapshot stream sink supports outputMode('append') only"
            )
        from .snapshot_sink import SnapshotStreamWriter

        return SnapshotStreamWriter(self.options, schema)

    def streamReader(self, schema: StructType) -> "SnapshotStreamReader":
        return SnapshotStreamReader(self.options, schema)


class _FilePartition(InputPartition):
    def __init__(
        self,
        file_path: str,
        dv_paths: list[str],
        schema_json: str,
        colmap: dict | None = None,
    ) -> None:
        self.file_path = file_path  # "" = empty-table sentinel
        self.dv_paths = dv_paths
        self.schema_json = schema_json
        # logical -> physical in-file column names (column mapping)
        self.colmap = colmap or {}


# pushFilters translation: Spark filter class -> comparison op tag
_OPS = {
    EqualTo: "eq",
    GreaterThan: "gt",
    GreaterThanOrEqual: "gte",
    LessThan: "lt",
    LessThanOrEqual: "lte",
}


class SnapshotReader(DataSourceReader):
    def __init__(self, options, version: int | None = None) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snapshot source needs option('path', <table dir>)")
        if version is not None:
            self.version = version  # pinned by the DataSource
        else:
            v = options.get("version")
            self.version = int(v) if v is not None else None
        self._preds: list[tuple[str, str, object]] = []

    # ---- planning (driver): manifest-only pruning ---------------------

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Record single-column comparison conjuncts for file pruning;
        return EVERY filter as unhandled so Spark re-applies them
        row-level — pruning stays advisory (see module docstring)."""
        for f in filters:
            op = _OPS.get(type(f))
            attr = getattr(f, "attribute", None)
            if op and attr is not None and len(attr) == 1:
                self._preds.append((attr[0], op, f.value))
            yield f

    def _keep_file(
        self, fstats: dict, bloom_cols: tuple, preds: list | None = None
    ) -> bool:
        from ..acid import _bloom_might_contain

        for col, op, val in preds if preds is not None else self._preds:
            s = fstats.get(col)
            if s is not None:
                mn, mx = s[0], s[1]
                try:
                    if (
                        (op == "eq" and (val < mn or val > mx))
                        or (op == "gte" and mx < val)
                        or (op == "gt" and mx <= val)
                        or (op == "lte" and mn > val)
                        or (op == "lt" and mn >= val)
                    ):
                        return False
                except TypeError:
                    pass  # bound/stat types don't compare — keep the file
            if op == "eq" and col in bloom_cols:
                bloom = fstats.get("__bloom__", {}).get(col)
                if bloom is not None and not _bloom_might_contain(bloom, val):
                    return False  # proven absent — no false negatives
        return True

    def partitions(self) -> Sequence[InputPartition]:
        t = _table(self.path)
        m = t._manifest(
            self.version if self.version is not None else t.latest_version()
        )
        stats = m.get("stats", {})
        dvs = m.get("dvs", {})
        cmap = m.get("colmap", {})
        # predicates arrive under LOGICAL names; stats and blooms are
        # keyed by the PHYSICAL in-file names (column mapping). Remap
        # into a LOCAL list — mutating self._preds would double-apply
        # the colmap if partitions() ran twice (replanned reader), and a
        # swap-rename colmap would then bind preds to the WRONG column
        phys_preds = [
            (cmap.get(col, col), op, val) for col, op, val in self._preds
        ]
        bloom_cols = tuple(
            cmap.get(c, c) for c in m.get("bloom_cols", ())
        )
        parts: list[InputPartition] = []
        for rels in m["files"].values():
            for rel in rels:
                if not self._keep_file(
                    stats.get(rel, {}), bloom_cols, phys_preds
                ):
                    continue
                parts.append(
                    _FilePartition(
                        os.path.join(self.path, rel),
                        [
                            os.path.join(self.path, d)
                            for d in dvs.get(rel, [])
                        ],
                        m["schema"],
                        cmap,
                    )
                )
        # an empty table still needs >= 1 partition
        return parts or [_FilePartition("", [], m["schema"], cmap)]

    # ---- execution (executor): pyarrow scan + DV anti-filter ----------

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        yield from _read_file_partition(partition)


def _read_file_partition(partition: _FilePartition) -> Iterator[tuple]:
    """ONE executor-side file read under full snapshot semantics
    (physical names via colmap, NULL-fill for pre-evolution files,
    positional DV filter) — shared by the batch reader and the
    table-as-stream reader so the semantics cannot drift apart."""
    if not partition.file_path:
        return
    from ._scan import read_file_rows

    schema = StructType.fromJson(json.loads(partition.schema_json))
    yield from read_file_rows(
        partition.file_path,
        [f.name for f in schema.fields],
        partition.colmap,
        partition.dv_paths,
    )


class SnapshotStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("snapshot")`` — Delta's TABLE-AS-STREAM
    read. Two modes, exactly Delta's:

    * DEFAULT (no ``start_version``): the first batch is the TABLE'S
      CURRENT SNAPSHOT (the latest version's full file list, deletion
      vectors applied) — Delta's initial-snapshot semantics; later
      batches emit each subsequent commit's ADDED files. A table whose
      HISTORY contains rewrites streams fine: history is never replayed.
    * ``start_version=N``: per-commit REPLAY from version N inclusive
      (Delta's ``startingVersion``) — each batch emits the files the
      commit added. A NON-APPEND commit in the replayed range (CoW
      rewrite, DV attach) FAILS the stream by default ("Detected a data
      update… set skipChangeCommits"); ``skip_change_commits=true``
      skips such commits ENTIRELY, adds included (Delta's rule: a
      rewrite's files mostly re-carry old rows — emitting them would
      duplicate). Replayed rows reflect each commit AS WRITTEN, not the
      current state — startingVersion semantics, use the CDF source for
      row-level changes.

    A schema evolution AFTER stream start fails the run; a restart
    re-pins the schema and (in default mode) recovers via a fresh
    initial snapshot — Delta's behavior.

    Planning is pure manifest metadata on the driver (no data read);
    one input partition per file. ``end_version`` bounds a backfill."""

    def __init__(self, options, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snapshot source needs option('path', <table dir>)")
        sv = options.get("start_version")
        self.start_version = int(sv) if sv is not None else None
        end = options.get("end_version")
        self.end = int(end) if end is not None else None
        self.skip_change_commits = (
            str(options.get("skip_change_commits", "false")).lower() == "true"
        )
        self._declared_schema_json = schema.json()

    # ---- offset protocol ---------------------------------------------

    def initialOffset(self) -> dict:
        if self.start_version is not None:
            # replay mode: batches cover [start_version .. latest]
            return {"version": self.start_version - 1}
        # snapshot mode: version 0 + the marker makes the first batch
        # the CURRENT snapshot instead of a history replay
        return {"version": 0, "snapshot": True}

    def latestOffset(self) -> dict:
        latest = _table(self.path).latest_version()
        if self.end is not None:
            latest = min(latest, self.end)
        return {"version": latest}

    def commit(self, end: dict) -> None:
        pass  # versions are immutable; nothing to acknowledge

    def stop(self) -> None:
        pass

    # ---- planning (driver): manifest metadata, no data read -----------

    def _snapshot_parts(self, m: dict) -> list[InputPartition]:
        dvs = m.get("dvs", {})
        return [
            _FilePartition(
                os.path.join(self.path, rel),
                [os.path.join(self.path, d) for d in dvs.get(rel, [])],
                m["schema"],
                m.get("colmap", {}),
            )
            for rels in m["files"].values()
            for rel in rels
        ]

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        t = _table(self.path)
        parts: list[InputPartition] = []
        declared = StructType.fromJson(json.loads(self._declared_schema_json))
        from_v = start["version"] + 1
        if start.get("snapshot"):
            # initial batch = the CURRENT state at end.version — DVs
            # applied, no history replay (Delta's initial snapshot)
            parts += self._snapshot_parts(t._manifest(end["version"]))
            from_v = end["version"] + 1  # nothing incremental this batch
        for v in range(from_v, end["version"] + 1):
            mt = t._manifest(v)
            if StructType.fromJson(json.loads(mt["schema"])) != declared:
                raise RuntimeError(
                    f"table schema changed at version {v} — the stream "
                    "pinned its schema at start; restart the stream "
                    "(default mode recovers via a fresh initial snapshot)"
                )
            mf = t._manifest(v - 1) if v > 1 else {"files": {}, "dvs": {}}
            added: list[str] = []
            changed = False
            for b in set(mf["files"]) | set(mt["files"]):
                old = mf["files"].get(b, [])
                new = mt["files"].get(b, [])
                oset, nset = set(old), set(new)
                if any(r not in nset for r in old):
                    changed = True  # a file was rewritten/removed
                added += [r for r in new if r not in oset]
            # DV changes delete rows without touching file lists
            if mf.get("dvs", {}) != mt.get("dvs", {}):
                changed = True
            if changed:
                if self.skip_change_commits:
                    continue  # skip the WHOLE commit, adds included
                raise RuntimeError(
                    f"version {v} is not append-only (copy-on-write "
                    "rewrite or deletion vectors) — an insert-only "
                    "stream cannot represent it; set "
                    "option('skip_change_commits', 'true') to skip such "
                    "commits, or read format('snapshot_cdf') for "
                    "row-level changes"
                )
            parts += [
                _FilePartition(
                    os.path.join(self.path, rel),
                    [],  # append-only commit: no DVs on its new files
                    mt["schema"],
                    mt.get("colmap", {}),
                )
                for rel in added
            ]
        return parts or [
            _FilePartition("", [], self._declared_schema_json, {})
        ]

    # ---- execution (executor): same path as the batch reader ----------

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        yield from _read_file_partition(partition)


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(SnapshotDataSource)
