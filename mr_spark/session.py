"""SparkSession factory tuned for this engine.

Local mode is a single JVM with N executor threads; on a real cluster the
same configs hold (AQE, shuffle partitions sized to cores, Arrow enabled).
The settings mirror what we would ship for a 1000-executor deployment:
AQE for runtime re-planning + skew-join handling, partition coalescing,
UTC session timezone (so results compare bit-for-bit against the DuckDB
oracle, whose timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# Runtime-settable SQL confs every query needs regardless of who built the
# session (the driver harness hands us ITS SparkSession — a vanilla one
# can't read the NANOS timestamps in events.parquet and would compare
# timestamps in local time). Applied idempotently by tune_session().
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # No in-repo Python DataSource implements pushFilters anymore — this
    # image's Spark 4.1.2 reuses a FILTERED plan for later unfiltered
    # scans of the same relation (PythonDataSourceV2.readInfo single-slot
    # cache; see sources/snapshot_source.py docstring + the engine canary
    # in tests/test_sources.py). Kept true so the canary exercises the
    # real engine path and flags when a fixed Spark lands.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Spark 4.1's ChecksumCheckpointFileManager leaks ~50 threads per
    # streaming-query run (measured: 320 parked ChecksumCheckpointFileManager
    # threads after the 6 stream_* queries; ~900 JVM threads by the second
    # bench sweep). A long-lived driver that starts many short streaming jobs
    # accumulates them without bound — disable checkpoint-file checksums (the
    # local-FS durability they add is not worth a thread per file write here;
    # on a cluster the object store's own integrity checks cover corruption).
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
    # temp checkpoints (memory-sink drains) now live on RAM-backed scratch
    # (see get_spark) — always delete them on query stop, even after an
    # error, so tmpfs never accumulates dead checkpoints
    "spark.sql.streaming.forceDeleteTempCheckpointLocation": "true",
    # Let the planner pick shuffled-hash join when its size conditions
    # hold (build side per partition bounded), and let AQE rewrite a
    # planned sort-merge to shuffled-hash at runtime when every
    # post-shuffle partition is under 128 MB: SHJ skips the sort on both
    # sides. Scale-safe by construction — the planner still falls back
    # to sort-merge whenever the size conditions fail, so a 100 TB join
    # keeps the spill-graceful path; this only removes the sort where
    # the build side provably fits a task.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "128m",
}


def ping(spark: SparkSession) -> bool:
    """Health check — the Spark-native analog of the reference's SayHello
    RPC (service.proto:24,30-31; coordinator.rs:147-155). The reference
    health-checks its separate control plane with an echo RPC; in Spark
    the control plane IS the driver, so the idiomatic liveness probe is a
    trivial end-to-end job: it exercises the scheduler, an executor, and
    the result channel — strictly more than an echo. Returns True iff the
    round-trip completes."""
    return spark.range(1).count() == 1


# ---- tracked persist registry ----------------------------------------------
# Operators persist relations that feed several subtrees of a LAZILY
# returned plan; they cannot unpersist before returning (the caller hasn't
# executed the plan yet), so in a long-lived session those cached blocks
# accumulate across invocations — the leak class ADVICE r3 flagged
# (jaccard tri_arr, substring/novelty windows, dup_span positions, dsir
# bucket counts, …). Every such persist now registers here, and
# release_tracked_caches() frees them all at once. The @query wrapper
# (operators/__init__.py) calls the release at the START of each TOP-LEVEL
# query, so by the time query N+1 builds its plan, query N's caches are
# gone — cache footprint bounded to one query's working set with no
# harness cooperation needed (bench / check_correctness / the driver all
# collect each result before invoking the next query).

_TRACKED: list = []
# Registry mutations are lock-guarded so concurrent persist_tracked calls
# can't lose registrations (list.append is atomic in CPython, but the
# release's iterate+clear is not). NOTE the broader contract is still
# one-query-at-a-time per process: two top-level queries running
# concurrently would flush each other's live caches at their depth-0
# entry (results stay correct — unpersist only forces recompute — but
# benchmarks would be skewed). The bench / driver / pytest harnesses all
# run queries sequentially; see also _QUERY_DEPTH in operators/__init__.
_TRACKED_LOCK = __import__("threading").Lock()


def persist_tracked(df):
    """``df.persist()`` + register for deferred release (see above).
    Use for persists whose lifetime must extend past the operator's
    return; persists released within the operator (the heavy_hitters
    eager-materialize pattern) should stay plain ``persist()``."""
    df.persist()
    with _TRACKED_LOCK:
        _TRACKED.append(df)
    return df


# Memory-sink temp views are the second deferred-release resource class:
# run_to_completion (streaming/pipelines.py) drains a bounded stream into
# a memory sink and returns spark.table(name) — the view must outlive the
# operator's return (the caller hasn't collected yet), so it registers
# here and the same depth-0 release that frees caches drops it. Without
# this, a 198-query session accumulates ~15 driver-held sink tables and
# the leaked views corrupt catalog-diff assertions in full-suite test
# order (VERDICT r5 What's-wrong #1/#2).
_TRACKED_VIEWS: list = []


def register_sink_view(spark: SparkSession, name: str) -> None:
    """Register a memory-sink temp view for deferred dropTempView at the
    next top-level query's release (same contract as persist_tracked:
    the previous query's result is collected before the next begins)."""
    with _TRACKED_LOCK:
        _TRACKED_VIEWS.append((spark, name))


def release_tracked_caches() -> int:
    """Unpersist every tracked DataFrame and drop every tracked
    memory-sink temp view; returns how many caches were released.
    Safe to call at any time between queries — unpersist never invalidates
    a plan (the relation simply recomputes if re-executed), and sink views
    are only registered for already-drained bounded streams."""
    with _TRACKED_LOCK:
        batch, _TRACKED[:] = list(_TRACKED), []
        views, _TRACKED_VIEWS[:] = list(_TRACKED_VIEWS), []
    n = 0
    for df in batch:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    for spark, name in views:
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass  # session already stopped — nothing to drop
    return n


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session.
    Also right-sizes shuffle partitions if left at the 200 default."""
    for k, v in RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    return spark


def get_spark(app_name: str = "mr_spark", *, cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Create (or get) the tuned SparkSession.

    Shuffle partitions are sized to the core count — the 200 default is
    wrong for local mode and is re-planned by AQE on a cluster anyway.
    """
    n = cpus or default_parallelism()
    # Scratch I/O (shuffle files, spills, streaming temp checkpoints) goes
    # to RAM-backed storage when available: the round-9 bench machine's
    # system disk throttles writes to ~10 MB/s (measured), so every
    # shuffle write/writeback stall lands in query wall-clock. On a real
    # cluster spark.local.dir is provisioned on local NVMe for the same
    # reason; $SPARK_GRAFT_SCRATCH_DIR overrides, and a machine without
    # /dev/shm headroom keeps Spark's defaults. tmpfs CANNOT degrade like
    # a disk — filling it mid-shuffle is a hard ENOSPC task failure — so
    # scratch_base() sizes the headroom requirement to the configured
    # input (4x $SPARK_GRAFT_SF_DIR bytes, 16 GiB floor) and larger-SF
    # runs fall back to real disk; spill-heavy workloads should set
    # $SPARK_GRAFT_SCRATCH_DIR to a fast disk. Static confs — they only
    # apply when this factory builds the JVM (bench/tests); an
    # externally-built session keeps its own dirs.
    from .operators._demo import register_scratch, scratch_base

    scratch = scratch_base()
    scratch_confs: dict[str, str] = {}
    if scratch.startswith("/dev/shm") or os.environ.get("SPARK_GRAFT_SCRATCH_DIR"):
        # underscore-pid suffix so _demo's stale-pid sweep reclaims these
        # too after a SIGKILL (atexit never runs there)
        local_dir = os.path.join(scratch, f"spark_local_{os.getpid()}")
        tmp_dir = os.path.join(scratch, f"jvm_tmp_{os.getpid()}")
        os.makedirs(local_dir, exist_ok=True)
        os.makedirs(tmp_dir, exist_ok=True)
        register_scratch(local_dir)
        register_scratch(tmp_dir)
        scratch_confs = {
            "spark.local.dir": local_dir,
            # temporary streaming checkpoints (memory-sink drains) are
            # created under java.io.tmpdir — move them off the throttled
            # disk with the rest of the scratch
            "spark.driver.extraJavaOptions": f"-Djava.io.tmpdir={tmp_dir}",
        }
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark has no
        # native type for: read as long, converted in sources.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # straggler / fault-tolerance parity with the reference's 5 s
        # timeout-requeue (coordinator.rs:112-131): Spark's own retry +
        # speculation machinery (SURVEY.md §2a R1-R6).
        .config("spark.task.maxFailures", "4")
        .config("spark.speculation", "false")  # pointless in local mode; on for clusters
        # Leave the context cleaner's forced full-GC at a long interval: a
        # 30s interval (tried first for broadcast/shuffle-ref cleanup) made
        # every System.gc() pause land inside some query — measured +5s on
        # otherwise-sub-second queries and ~8% on whole-suite totals.
        # Per-query cache cleanup (bench clears explicitly) + the cleaner's
        # normal weak-ref path keep refs bounded without stop-the-world GC.
        .config("spark.cleaner.periodicGC.interval", "30min")
        # ~450 distinct codegen units across the query library vs the
        # 100-entry default: evictions force Janino recompiles + cold JIT on
        # re-run (static conf — must be set at session build time).
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    for k, v in scratch_confs.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune_session(spark)
