"""Custom Python DataSource (Spark 4 API): whole-file text scan with the
reference's task granularity.

The reference schedules ONE map task per input file (coordinator.rs:54-64
builds a MapTask per path; worker.rs:112-117 reads the whole file). This
source reproduces that as a first-class Spark V2 source: one
``InputPartition`` per file, record = (path, mtime, size, contents) —
so `spark.read.format("whole_text").load(glob)` gives the same
parallelism contract as the reference engine, but planned by Catalyst.

File pruning: ``option("path_eq", p)`` / ``option("size_gt", n)`` /
``option("size_lt", n)`` are evaluated against os.stat BEFORE any file
is opened — the Python-source analog of partition pruning (files are
the partitions). These are RELATION-LEVEL options rather than
``pushFilters`` because this image's Spark 4.1.2 caches one planned
read per relation and reuses a FILTERED plan for later unfiltered scans
of the same ``load()`` (PythonDataSourceV2.readInfo single-slot cache —
measured and decompiled; full mechanism in snapshot_source.py's module
docstring, engine canary in tests/test_sources.py). Options are part of
the relation identity, so every scan plans identically — and since each
file IS a row here, option pruning has exact row semantics.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("path", StringType(), nullable=False),
        StructField("size", LongType(), nullable=False),
        StructField("contents", StringType(), nullable=False),
    ]
)


class WholeTextDataSource(DataSource):
    """``spark.read.format("whole_text").load("<glob>")``."""

    @classmethod
    def name(cls) -> str:
        return "whole_text"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> "WholeTextReader":
        return WholeTextReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str, size: int) -> None:
        self.path = path
        self.size = size


class WholeTextReader(DataSourceReader):
    def __init__(self, options) -> None:
        glob_pat = options.get("path") or options.get("glob")
        if not glob_pat:
            raise ValueError("whole_text source needs .load(<glob>) or option('glob')")
        self._files = sorted(_glob.glob(glob_pat))
        self._path_eq = options.get("path_eq")
        sg, sl = options.get("size_gt"), options.get("size_lt")
        self._size_gt = int(sg) if sg is not None else None
        self._size_lt = int(sl) if sl is not None else None

    def _keep(self, path: str, size: int) -> bool:
        if self._path_eq is not None and path != self._path_eq:
            return False
        if self._size_gt is not None and not size > self._size_gt:
            return False
        if self._size_lt is not None and not size < self._size_lt:
            return False
        return True

    def partitions(self) -> Sequence[_FilePartition]:
        """One partition per surviving file — the reference's MapTask
        granularity (coordinator.rs:54-64)."""
        parts = []
        for p in self._files:
            size = os.path.getsize(p)
            if self._keep(p, size):
                parts.append(_FilePartition(p, size))
        # zero-partition sources are legal but Spark still wants ≥1 split
        return parts or [_FilePartition("", 0)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8") as fh:
            yield (partition.path, partition.size, fh.read())


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(WholeTextDataSource)
