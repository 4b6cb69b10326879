"""The App trait + registry — the engine's entire user surface.

Mirror of the reference's ``App`` trait (common/src/lib.rs:5-8):

    fn map(&self, k: String, v: String) -> Vec<(String, String)>;
    fn reduce(&self, k: String, vs: Vec<String>) -> String;

and of the ``declare_app!`` dylib registry (common/src/lib.rs:12-39) —
Python needs no dynamic loading, a module-level dict suffices.

Constraint inherited from the reference's wire format (worker.rs:43-47,
155-162): keys and values must not contain whitespace/newlines — the text
line ``"k v"`` is split on whitespace into exactly two tokens. Tier A keeps
the constraint documented rather than "fixed".
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Protocol


class App(Protocol):
    """A MapReduce application: a string-typed UDTF (map) + UDAF (reduce)."""

    def map(self, k: str, v: str) -> Iterable[tuple[str, str]]:
        """One input record (k1, v1) → 0..n intermediate (k2, v2) pairs."""
        ...

    def reduce(self, k: str, vs: list[str]) -> str:
        """One key + its values (ASCENDING SORTED, per the engine
        guarantee) → one output string."""
        ...


APPS: dict[str, App] = {}


def declare_app(name: str):
    """Register an App class under a name (the declare_app! analog)."""

    def deco(cls):
        APPS[name] = cls()
        return cls

    return deco


def get_app(name: str) -> App:
    from . import apps  # noqa: F401  (importing populates the registry)

    return APPS[name]
