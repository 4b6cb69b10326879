"""CDC / slowly-changing-dimension operators (no Delta/Iceberg in this
container — emulated with anti-join + union + window, the classic recipe).

* scd2_history — fold an event log into SCD2 rows (valid_from/valid_to/
  is_current) via change-point detection + lead()
* merge_upsert — MERGE INTO emulation: source rows replace matching target
  rows, unmatched target rows survive (anti-join + union)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


@query(
    "scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             LAG(o_orderpriority) OVER w AS prev_priority
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    changes AS (
      SELECT o_custkey AS custkey, o_orderpriority AS priority,
             o_orderdate AS valid_from, o_orderkey
      FROM ordered
      WHERE prev_priority IS NULL OR o_orderpriority <> prev_priority
    )
    SELECT custkey, priority, valid_from,
           LEAD(valid_from) OVER (PARTITION BY custkey
                                  ORDER BY valid_from, o_orderkey) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY custkey
                                  ORDER BY valid_from, o_orderkey) IS NULL AS is_current
    FROM changes
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension built from an event log: each customer's order-
    priority history as (valid_from, valid_to, is_current) rows. Change-
    point detection with lag(), interval closing with lead() — one shuffle
    on the dimension key, no MERGE engine required."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.withColumn("prev_priority", F.lag("o_orderpriority").over(w))
        .where(
            F.col("prev_priority").isNull()
            | (F.col("o_orderpriority") != F.col("prev_priority"))
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    w2 = Window.partitionBy("custkey").orderBy("valid_from", "o_orderkey")
    nxt = F.lead("valid_from").over(w2)
    return changes.select(
        "custkey",
        "priority",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE INTO emulation (upsert): rows of ``source`` win on key match,
    unmatched ``target`` rows survive. target ⟕̸ source ∪ source —
    the anti-join + union recipe; at scale both sides shuffle once on key
    (or zero times if both are bucketed on it)."""
    kept = target.join(source, on=key, how="left_anti")
    return kept.unionByName(source)
