"""Typed Python UDTF surface (Spark 4, Arrow-optimized).

The reference's entire user surface is the two-method ``App`` trait
(common/src/lib.rs:5-8): ``map`` is a string-typed UDTF (one record in,
0..n records out) and ``reduce`` a string-typed UDAF. Tier A preserves
that surface verbatim; this module exposes the same *shape* through
Spark's first-class typed UDTF API — ``@udtf`` + ``LATERAL`` join — the
idiomatic way to ship a custom row-expanding operator on a modern Spark
cluster.

Scale note: a UDTF runs Arrow-batched in the Python worker, after any
pushed filters/pruning on the JVM side. The lateral join is a
per-partition flatMap — no shuffle is introduced; the downstream
aggregation (if any) shuffles on its own key. The slow path is the
Python eval itself, which is why everything expressible stays in
built-in functions elsewhere; this query intentionally exercises the
escape hatch the way a user would (sentence segmentation — genuinely
regex-split + per-fragment logic).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..sources import load_table
from . import query


@udtf(returnType="sent_idx int, sent string, n_tokens int", useArrow=True)
class SplitSentences:
    """Sentence segmentation: split on [.!?]+ runs, drop blank fragments,
    keep the 1-based ordinal over the RAW split (stable under filtering)
    and a whitespace token count per sentence."""

    def eval(self, text: str):
        if text is None:
            return
        for i, raw in enumerate(re.split(r"[.!?]+", text), 1):
            s = raw.strip()
            if s:
                yield i, s, len(s.split())


@query(
    "udtf_sentences",
    oracle="""
    WITH arrs AS (
      SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc,
             regexp_split_to_array(text, '[.!?]+') AS arr
      FROM documents
    ), exploded AS (
      SELECT doc, unnest(arr) AS raw, generate_subscripts(arr, 1) AS i
      FROM arrs
    )
    SELECT doc, CAST(i AS INT) AS sent_idx,
           regexp_replace(raw, '^\\s+|\\s+$', '', 'g') AS sent,
           CAST(array_length(regexp_split_to_array(
                  regexp_replace(raw, '^\\s+|\\s+$', '', 'g'), '\\s+'), 1)
                AS INT) AS n_tokens
    FROM exploded
    WHERE regexp_replace(raw, '^\\s+|\\s+$', '', 'g') <> ''
    """,
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sentence segmentation through a typed Python UDTF in a
    LATERAL join — the Spark-native form of the reference's ``App::map``
    row-expansion contract (common/src/lib.rs:6). The oracle replays the
    segmentation as a pure-SQL array pipeline; the whitespace-trim on both
    sides is the full \\s class so Python ``str.strip`` and the SQL twin
    agree on any whitespace, not just spaces."""
    spark.udtf.register("mrspark_split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "mrspark_udtf_docs"
    )
    return spark.sql(
        """
        SELECT concat('doc_', CAST(doc_id AS STRING)) AS doc,
               s.sent_idx, s.sent, s.n_tokens
        FROM mrspark_udtf_docs, LATERAL mrspark_split_sentences(text) s
        """
    )


@query(
    "pandas_udaf_median",
    oracle="""
    SELECT l_partkey,
           median(l_quantity) AS median_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_partkey
    """,
)
def pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed Pandas UDAF surface (grouped-agg @pandas_udf): the
    Arrow-batched counterpart of the reference's string-typed ``reduce``
    UDAF (common/src/lib.rs:7) — each group's values arrive as ONE pandas
    Series, here folded to an exact median.

    Determinism: np.median sorts internally, so the result is independent
    of arrival order; quantities are integer-valued doubles, and the
    midpoint of two integers is exact in IEEE — bit-identical to DuckDB's
    continuous median. Scale: grouped-agg ships each whole group through
    Arrow — right for holistic aggregates (median/mode) that built-ins
    can't stream; everything DECOMPOSABLE stays JVM-side: the companion
    count is a plain partial-aggregating groupBy().count() joined back on
    l_partkey (AQE broadcasts the small agg side), NOT a second
    whole-group Arrow pass — Spark's no-mixing rule for grouped-agg
    pandas UDFs forbids one agg call, but nothing forces the count
    through Python (VERDICT r3 #4: this halves the Arrow traffic)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(np.median(v.values))

    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_partkey").agg(_median("l_quantity").alias("median_qty"))
    cnt = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    # null-safe join key: a single groupBy emits a NULL-key group; a plain
    # inner join would silently drop it (latent on TPC-H, where l_partkey
    # is non-null — but the rewrite must not change the grouping semantics)
    return med.join(
        cnt, med["l_partkey"].eqNullSafe(cnt["l_partkey"])
    ).select(med["l_partkey"], "median_qty", "n")
