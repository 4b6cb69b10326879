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


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns, JVM-side
    (zip_with + aggregate — fine for SMALL candidate sets; for bulk scoring
    use the quantized numpy path in operators.similarity, and beware that
    lambdas closing over computed arrays re-inline the upstream expression
    per element after projection collapse).

    SQL twin: list_dot_product(a, b).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
