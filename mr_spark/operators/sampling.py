"""Deterministic sampling & split operators — training-data pipeline
staples. Random sampling is useless at 100 TB if it isn't REPRODUCIBLE and
JOINABLE; these are hash-based (content-keyed), so the same row lands in
the same split on every engine, every run, every cluster size.

Cross-engine hash: the md5-tail trick shared with winnow_fingerprint
(Spark conv(byte-swapped hex) == DuckDB md5_number_lower), mod 100 for
percentage buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query
from .text import _md5_lower64

_BUCKET_SQL_T = "CAST(md5_number_lower({key}) % 9223372036854775808 AS BIGINT) % 100"


def _bucket(key_col) -> F.Column:
    """Deterministic 0..99 bucket from a string key — identical in DuckDB:
    md5_number_lower(key) % 2^63 % 100."""
    return _md5_lower64(key_col) % 100


@query(
    "hash_sample",
    oracle=f"""
    SELECT doc_id, n_chars
    FROM documents
    WHERE {_BUCKET_SQL_T.format(key="'doc_' || CAST(doc_id AS VARCHAR)")} < 10
    """,
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of documents, keyed on doc identity.
    Unlike rand()-sampling this is stable across runs/partitions/engines
    and pushes down as a cheap filter (no shuffle, no seed plumbing)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"))
    return docs.where(_bucket(key) < 10).select("doc_id", "n_chars")


@query(
    "train_val_split",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id,
             CASE WHEN {_BUCKET_SQL_T.format(key="'doc_' || CAST(doc_id AS VARCHAR)")} < 90
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs FROM tagged GROUP BY split
    """,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 train/val assignment by content hash — the split a 100 TB
    corpus job computes inline (and that must never move a document between
    splits when the corpus is re-sharded or re-run)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"))
    tagged = docs.select(
        F.when(_bucket(key) < 90, "train").otherwise("val").alias("split")
    )
    return tagged.groupBy("split").agg(F.count("*").alias("n_docs"))


@query(
    "null_handling",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(MAX(o.o_totalprice), 0.0) AS max_spend,
           MAX(o.o_totalprice) IS NULL AS never_ordered,
           COALESCE(CAST(COUNT(o.o_orderkey) AS BIGINT), 0) AS n_orders,
           NULLIF(COUNT(o.o_orderkey), 0) AS n_orders_or_null
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics battery over an outer join: coalesce, IS NULL,
    nullif, count-vs-null interplay."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.max("o_totalprice"), F.lit(0.0)).alias("max_spend"),
            F.max("o_totalprice").isNull().alias("never_ordered"),
            F.coalesce(F.count("o_orderkey").cast("bigint"), F.lit(0)).alias("n_orders"),
            F.nullif(F.count("o_orderkey"), F.lit(0)).alias("n_orders_or_null"),
        )
    )


@query(
    "stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN {_BUCKET_SQL_T.format(
               key="lang || '_doc_' || CAST(doc_id AS VARCHAR)")} < 20
                      THEN 1 END) AS BIGINT) AS n_sampled
    FROM documents GROUP BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified ~20% sample with per-stratum determinism: the hash key
    is (stratum, doc identity), so each language's sample is an
    independent deterministic 20% — re-balancing one stratum never
    perturbs another, and re-sharding the corpus never moves a document
    in or out of the sample. Returns per-stratum totals and sampled
    counts (the allocation report a curation pipeline logs); the row
    filter itself is the same pushdown-friendly predicate as
    hash_sample."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(
        F.col("lang"), F.lit("_doc_"), F.col("doc_id").cast("string")
    )
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(_bucket(key) < 20, 1)).alias("n_sampled"),
    )


_N_SHARDS = 8


@query(
    "shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             CAST(md5_number_lower('shard_' || CAST(doc_id AS VARCHAR))
                  % 9223372036854775808 AS BIGINT) AS hv
      FROM documents
    )
    SELECT CAST(hv % {_N_SHARDS} AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY hv % {_N_SHARDS}
                                   ORDER BY hv // {_N_SHARDS}, doc_id)
                AS BIGINT) AS pos,
           doc_id
    FROM h
    """,
)
def shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: each
    document hashes to one of {_N_SHARDS} shards (shard = low bits) and to
    a pseudo-random position WITHIN its shard (order = remaining hash
    bits, doc_id tie-break). The classic shuffle-then-shard step before
    sequential training reads — reproducible across engines, runs, and
    cluster sizes, unlike rand()-ordering, and re-runnable on any subset
    of shards. One hash shuffle + per-shard sort; at 100 TB use
    shard-count ≈ target file count and write with partitionBy(shard)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("shard_"), F.col("doc_id").cast("string"))
    h = docs.select("doc_id", _md5_lower64(key).alias("hv"))
    w = Window.partitionBy(F.col("hv") % _N_SHARDS).orderBy(
        F.floor(F.col("hv") / _N_SHARDS), F.col("doc_id")
    )
    return h.select(
        (F.col("hv") % _N_SHARDS).alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
        "doc_id",
    )
