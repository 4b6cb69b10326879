"""Early-exit app (app-early-exit/src/lib.rs:14-23): rows-per-input count.
The reducer-staggering sleeps exist only to test output finality — a
scheduler property in Spark, not app code."""

from __future__ import annotations

from ..api import declare_app


@declare_app("early_exit")
class EarlyExit:
    def map(self, k: str, v: str) -> list[tuple[str, str]]:
        return [(k, "1")]

    def reduce(self, k: str, vs: list[str]) -> str:
        return str(len(vs))
