"""Single-process sequential executor — the golden oracle.

Line-for-line semantic port of sequential/src/main.rs:22-40: read all
inputs, flatMap, sort the full (k2, v2) vector, consecutive-run group,
reduce, emit. Used by the differential tests exactly as test-mr.sh:29-31
uses the Rust sequential binary to produce mr-correct-*.txt.
"""

from __future__ import annotations

from collections.abc import Iterable
from itertools import groupby

from .api import App


def run_sequential(inputs: Iterable[tuple[str, str]], app: App) -> list[tuple[str, str]]:
    intermediate: list[tuple[str, str]] = []
    for k1, v1 in inputs:
        intermediate.extend(app.map(k1, v1))
    intermediate.sort()  # the full-pair sort: main.rs:30
    return [
        (k2, app.reduce(k2, [v for _, v in group]))
        for k2, group in groupby(intermediate, key=lambda kv: kv[0])
    ]


def to_text_lines(result: Iterable[tuple[str, str]]) -> list[str]:
    """Globally sorted ``"k v"`` lines — the mr-all convention."""
    return sorted(f"{k} {v}" for k, v in result)
