"""Inverted index (app-indexer/src/lib.rs:10-25).

Output format per word: ``"{n} {files joined by ','}"``. The file list
comes out ascending because the ENGINE sorts (k2, v2) pairs before
grouping (SURVEY.md §1 ordering guarantee) — this app is the test that the
guarantee holds; it does not sort defensively."""

from __future__ import annotations

from ..api import declare_app
from .wc import tokenize


@declare_app("indexer")
class Indexer:
    def map(self, k: str, v: str) -> list[tuple[str, str]]:
        # per-file dedup — the hand-rolled map-side combiner
        # (app-indexer/src/lib.rs:15-20); dict preserves insertion order
        # but the engine sort makes order irrelevant anyway
        return [(w, k) for w in dict.fromkeys(tokenize(v))]

    def reduce(self, k: str, vs: list[str]) -> str:
        return f"{len(vs)} {','.join(vs)}"  # vs arrive sorted by the engine
