"""mr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BugenZhao/6.824-MapReduce.

Two tiers (SURVEY.md §7):

* Tier A (``mr_spark.engine``) — a faithful generic MapReduce engine on the
  RDD API preserving the reference's semantics (sorted-values-into-reduce,
  ``n_reduce`` hash partitions, ``"k v"`` text output); apps wc / indexer /
  crash / early-exit ported as Python ``map``/``reduce`` pairs
  (reference: common/src/lib.rs:5-8, sequential/src/main.rs:22-40).

* Tier B (``mr_spark.operators``) — the DataFrame-native analytics layer:
  every reference app re-expressed as a typed query over the TPC-H-ish
  tables, plus joins / windows / set-ops / rollup and the training-data
  extensions (dedup, similarity search, text analysis, multimodal).

Package layout:
  engine/     Tier A MapReduce core + app registry + sequential oracle
  operators/  Tier B query library (the ``queries()`` registry)
  sources/    table loaders / whole-file text source
  functions/  reusable column expression builders (tokenize, cosine, ...)
  plans/      plan-inspection helpers (pushdown / broadcast assertions)
  streaming/  Structured Streaming pipelines over the events table
"""

__version__ = "0.1.0"
