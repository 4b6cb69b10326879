"""The reference's five apps re-expressed as DataFrame-native queries over
the ``documents`` table (SURVEY.md §2b).

* wc          — app-wc/src/lib.rs:8-18  (tokenize, count per word)
* indexer     — app-indexer/src/lib.rs:10-25 (doc-freq + sorted posting list)
* crash-shape — app-crash/src/lib.rs:30-44 (4 constant KVs/doc, sorted join);
                the crash *behavior* maps to Spark task retries (config).
* early-exit  — app-early-exit/src/lib.rs:14-23 (rows-per-group count)
* jobcount    — OUT OF SCOPE: non-idempotent side-effecting UDF
                (app-jobcount/src/lib.rs:18-42); Spark's execution model
                assumes idempotent tasks. The property it tests (no spurious
                re-execution) is owned by Spark's scheduler.

All tokenization uses ``[^\\p{L}]+`` — parity with Rust
``char::is_alphabetic`` splitting, see mr_spark.functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import word_stream
from ..sources import load_table
from . import query

_TOKENS_SQL = (
    "SELECT CAST(doc_id AS VARCHAR) AS doc, "
    "unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word FROM documents"
)


@query(
    "wc",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM ({_TOKENS_SQL})
    WHERE word <> ''
    GROUP BY word
    """,
)
def wc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count. Plan: parquet scan (text column only, pruned) → split →
    explode → partial hash-agg (map-side combine, which the reference's wc
    lacks entirely) → final hash-agg. One shuffle, on `word`."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(word_stream("text").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "indexer",
    oracle=f"""
    WITH wd AS (SELECT DISTINCT doc, word FROM ({_TOKENS_SQL}) WHERE word <> '')
    SELECT word, count(*) AS n_docs,
           string_agg(doc, ',' ORDER BY doc) AS postings
    FROM wd GROUP BY word
    """,
)
def indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: per word, doc frequency + comma-joined posting list
    sorted ascending — the sorted order is the reference's load-bearing
    sorted-values-into-reduce guarantee (SURVEY.md §1), reproduced here with
    sort_array(collect_set(...)), not engine ordering."""
    docs = load_table(spark, sf_dir, "documents")
    wd = (
        docs.select(
            F.col("doc_id").cast("string").alias("doc"),
            word_stream("text").alias("word"),
        )
        .distinct()  # map-side dedup combiner, app-indexer/src/lib.rs:15-20
    )
    return wd.groupBy("word").agg(
        F.count("doc").alias("n_docs"),
        F.concat_ws(",", F.sort_array(F.collect_set("doc"))).alias("postings"),
    )


@query(
    "crash_shape",
    oracle="""
    WITH kv AS (
      SELECT 'a' AS k, source AS v FROM documents
      UNION ALL SELECT 'b', CAST(length(source) AS VARCHAR) FROM documents
      UNION ALL SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
      UNION ALL SELECT 'd', 'xyzzy' FROM documents
    )
    SELECT k, string_agg(v, ' ' ORDER BY v) AS joined FROM kv GROUP BY k
    """,
)
def crash_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crash app's *query* part: 4 KVs per input
    (a→name, b→len(name), c→len(contents), d→'xyzzy'), per-key sorted
    space-join (app-crash/src/lib.rs:30-44). Fault injection itself is
    covered by spark.task.maxFailures, not app code."""
    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("k"), F.col("source").alias("v")),
                F.struct(F.lit("b").alias("k"), F.length("source").cast("string").alias("v")),
                F.struct(F.lit("c").alias("k"), F.length("text").cast("string").alias("v")),
                F.struct(F.lit("d").alias("k"), F.lit("xyzzy").alias("v")),
            )
        ).alias("kv")
    ).select("kv.k", "kv.v")
    return kv.groupBy("k").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("v"))).alias("joined")
    )


@query(
    "early_exit",
    oracle="""
    SELECT source, count(*) AS cnt FROM documents GROUP BY source
    """,
)
def early_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-per-group count (app-early-exit/src/lib.rs:14-23 counts rows per
    input file; `source` is the file analog). The timing/consistency property
    it tests belongs to Spark's job-completion semantics."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(F.count("*").alias("cnt"))
