"""Hot-shingle df cap in exact_substring_pairs: a boilerplate window shared
by more than _SUBSTR_DF_CAP documents is the classic df² skew key — the cap
must drop it BEFORE the self-join, while windows at or below the cap (and
genuine duplicate content) pass through untouched. The cap is mirrored in
the DuckDB oracle, so oracle agreement is pinned separately by
tools/check_correctness; this test pins the cap SEMANTICS against a pure
Python brute-force twin on a constructed corpus where the hot key fires."""

from __future__ import annotations

from collections import Counter

from mr_spark.operators.dedup import _SUBSTR_DF_CAP, _SUBSTR_L, _substring_pairs

BOILER = "## standard license header v1 — do not ".ljust(_SUBSTR_L, "#")[:_SUBSTR_L]
GENUINE = "The quick brown fox jumps over the lazy dog. " * 2  # 90 chars


def _brute_pairs(corpus: dict[int, str]) -> dict[tuple[int, int], int]:
    """The spec, computed directly: per-doc distinct windows, doc-frequency
    cap, then count shared kept windows per doc pair."""
    wins = {
        d: {t[i : i + _SUBSTR_L] for i in range(len(t) - _SUBSTR_L + 1)}
        for d, t in corpus.items()
        if len(t) >= _SUBSTR_L
    }
    df = Counter(w for ws in wins.values() for w in ws)
    kept = {d: {w for w in ws if df[w] <= _SUBSTR_DF_CAP} for d, ws in wins.items()}
    pairs: Counter = Counter()
    inv: dict[str, list[int]] = {}
    for d, ws in kept.items():
        for w in ws:
            inv.setdefault(w, []).append(d)
    for docs in inv.values():
        docs.sort()
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                pairs[(a, b)] += 1
    return dict(pairs)


def test_hot_shingle_cap_matches_bruteforce(spark):
    n_hot = _SUBSTR_DF_CAP + 10  # boilerplate family larger than the cap
    corpus = {i: f"u{i:05d}w{BOILER}q{i:05d}" for i in range(n_hot)}
    corpus[90_001] = GENUINE
    corpus[90_002] = GENUINE

    expected = _brute_pairs(corpus)
    # the corpus is engineered so the cap actually fires: the pure
    # boilerplate window has df > cap, so the full hot clique must NOT be
    # emitted (only low-df digit-fringe collisions may pair hot docs)
    assert len(expected) < n_hot * (n_hot - 1) // 2

    docs = spark.createDataFrame(
        sorted(corpus.items()), "doc_id bigint, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in _substring_pairs(docs).collect()
    }
    assert got == expected
    # genuine duplicate content (df=2) is untouched by the cap
    assert (90_001, 90_002) in got
