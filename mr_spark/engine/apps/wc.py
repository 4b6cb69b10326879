"""Word count (app-wc/src/lib.rs:8-18)."""

from __future__ import annotations

from itertools import groupby

from ..api import declare_app


def tokenize(text: str) -> list[str]:
    """Split on every non-alphabetic char — exact parity with Rust
    ``split(|c| !c.is_alphabetic())`` (app-wc/src/lib.rs:9): Python
    ``str.isalpha`` and Rust ``char::is_alphabetic`` are both Unicode
    Alphabetic."""
    return ["".join(g) for alpha, g in groupby(text, key=str.isalpha) if alpha]


@declare_app("wc")
class WordCount:
    def map(self, k: str, v: str) -> list[tuple[str, str]]:
        return [(w, "1") for w in tokenize(v)]

    def reduce(self, k: str, vs: list[str]) -> str:
        return str(len(vs))  # counts.len(): app-wc/src/lib.rs:17
