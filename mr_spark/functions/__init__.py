"""Reusable column-expression builders.

Everything here is built from ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs in the hot path. Each builder has
a documented ANSI-SQL twin so the DuckDB oracle can mirror it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenizer parity with the reference: Rust `char::is_alphabetic` (Unicode
# Alphabetic) ~ regex `\p{L}` — app-wc/src/lib.rs:8-14. Both Java regex
# (Spark) and RE2 (DuckDB) support \p{L}, so the oracle twin is
#   unnest(regexp_split_to_array(text, '[^\p{L}]+'))
TOKEN_SPLIT_RE = r"[^\p{L}]+"


def tokens(text: Column | str) -> Column:
    """array<string> of alphabetic tokens, empties removed.

    SQL twin: list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), x -> x <> '')
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def word_stream(text: Column | str) -> Column:
    """One exploded token column (use with ``select(...alias('word'))``)."""
    return F.explode(tokens(text))


def normalized_text(text: Column | str) -> Column:
    """Canonical form for exact-dedup / fingerprinting: lowercase,
    non-letter runs collapsed to single spaces, trimmed.

    SQL twin: trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g'))
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(col), TOKEN_SPLIT_RE, " "))


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """array<string> of overlapping character k-grams of the normalized
    text (standard MinHash shingling). Built-ins only: sequence + transform.

    SQL twin (DuckDB): list_transform(range(1, len(t)-k+2), i -> t[i:i+k-1])
    """
    t = normalized_text(text)
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(t, i, F.lit(k)))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns, JVM-side.

    SQL twin: list_dot_product(a, b) — or an explicit unnest-join-sum.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """sqrt(sum(x^2)). SQL twin: sqrt(list_sum(list_transform(a, x -> x*x)))"""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity. SQL twin: list_cosine_similarity(a, b) or explicit."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
