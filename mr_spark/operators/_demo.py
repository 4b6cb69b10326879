"""Per-process demo-table paths under spark-warehouse, with exit-time
cleanup (ADVICE r4: the per-pid dirs acid_*_demo_{pid} / dpp_fact_demo_{pid}
accumulated across bench/driver invocations — each process now removes its
own dirs at exit; pid-suffixing keeps concurrent sessions from touching
each other's live tables)."""

from __future__ import annotations

import atexit
import os
import shutil

_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "spark-warehouse",
)

_REGISTERED: set[str] = set()


def demo_path(name: str) -> str:
    """``spark-warehouse/{name}_{pid}`` — registered for removal when this
    process exits. Queries rebuild their demo tables per invocation, so
    nothing durable lives here."""
    path = os.path.join(_WAREHOUSE, f"{name}_{os.getpid()}")
    _REGISTERED.add(path)
    return path


@atexit.register
def _cleanup() -> None:
    for p in _REGISTERED:
        shutil.rmtree(p, ignore_errors=True)
