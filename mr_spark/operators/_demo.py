"""Per-process demo-table paths with exit-time cleanup (ADVICE r4: the
per-pid dirs acid_*_demo_{pid} / dpp_fact_demo_{pid} accumulated across
bench/driver invocations — each process now removes its own dirs at exit;
pid-suffixing keeps concurrent sessions from touching each other's live
tables).

Demo tables are per-process TEMPORARIES (rebuilt from the parquet inputs
every process, never reused across runs), so they belong on scratch
storage, not durable storage. ``scratch_base()`` picks the root: an
explicit ``$SPARK_GRAFT_SCRATCH_DIR`` wins; otherwise a RAM-backed
``/dev/shm`` directory when one exists with ≥ 16 GiB free (the round-9
bench machine's system disk throttles writes to ~10 MB/s — measured with
a plain 256 MB buffered write — which turned every fixture commit and
spill into a writeback stall; tmpfs restores scratch I/O to memory speed,
which is also how a production node would provision shuffle/scratch
volumes: local NVMe, never a throttled system disk); else the old
``spark-warehouse`` directory next to the repo."""

from __future__ import annotations

import atexit
import os
import shutil

_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "spark-warehouse",
)

_MIN_SHM_FREE = 16 * 1024**3


def scratch_base() -> str:
    """Root directory for per-process scratch (demo tables, streaming
    checkpoints, Spark local dirs). See module docstring for the policy."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize >= _MIN_SHM_FREE:
            base = os.path.join(shm, "mr_spark_scratch")
            os.makedirs(base, exist_ok=True)
            _sweep_stale(base)
            return base
    except OSError:
        pass
    os.makedirs(_WAREHOUSE, exist_ok=True)
    return _WAREHOUSE


_SWEPT = False


def _sweep_stale(base: str) -> None:
    """tmpfs is RAM: a SIGKILLed process never runs its atexit cleanup, so
    reclaim ``*_<pid>`` entries whose pid is gone (once per process; live
    processes' dirs are left alone)."""
    global _SWEPT
    if _SWEPT:
        return
    _SWEPT = True
    for entry in os.listdir(base):
        pid_part = entry.rsplit("_", 1)[-1]
        if not pid_part.isdigit() or int(pid_part) == os.getpid():
            continue
        if not os.path.exists(f"/proc/{pid_part}"):
            shutil.rmtree(os.path.join(base, entry), ignore_errors=True)


_REGISTERED: set[str] = set()


def register_scratch(path: str) -> None:
    """Register an externally-created scratch dir for this process's
    exit-time cleanup (used by session.get_spark for the per-pid Spark
    local / JVM tmp dirs)."""
    _REGISTERED.add(path)


def demo_path(name: str) -> str:
    """``<scratch_base>/{name}_{pid}`` — registered for removal when this
    process exits. Queries rebuild their demo tables per invocation, so
    nothing durable lives here."""
    path = os.path.join(scratch_base(), f"{name}_{os.getpid()}")
    _REGISTERED.add(path)
    return path


@atexit.register
def _cleanup() -> None:
    for p in _REGISTERED:
        shutil.rmtree(p, ignore_errors=True)
