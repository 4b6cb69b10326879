"""Crash app, query part (app-crash/src/lib.rs:30-44).

The fault injection itself (exit(1) / random sleeps, lib.rs:11-24) is not
app code in Spark's model: task failure/retry is engine configuration
(spark.task.maxFailures), and the determinism-under-crash property is what
the engine's commit protocol guarantees. The *query* is ported so golden
outputs stay comparable."""

from __future__ import annotations

from ..api import declare_app


@declare_app("crash")
class Crash:
    def map(self, k: str, v: str) -> list[tuple[str, str]]:
        return [
            ("a", k),
            ("b", str(len(k))),
            ("c", str(len(v))),
            ("d", "xyzzy"),
        ]

    def reduce(self, k: str, vs: list[str]) -> str:
        return " ".join(sorted(vs))  # re-sorts defensively, lib.rs:42
