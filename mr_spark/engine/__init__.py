"""Tier A: a faithful generic MapReduce engine on the Spark RDD API.

Preserves the reference's execution semantics (SURVEY.md §1/§2a):
* record model: string (k, v) pairs end-to-end
* hash partitioning of intermediate keys into ``n_reduce`` buckets
* the sorted-values-into-reduce guarantee (full (k2, v2) sort)
* ``"k v"`` text-line output, one file per reduce partition

The coordinator/worker/gRPC/retry machinery of the reference
(distributed/src/*) is replaced wholesale by Spark's scheduler — see
SURVEY.md §2a R1-R6 for the mapping.
"""

from .api import App, APPS, get_app
from .mapreduce import run_files, run_mapreduce, save_text_output
from .sequential import run_sequential

__all__ = [
    "App",
    "APPS",
    "get_app",
    "run_files",
    "run_mapreduce",
    "run_sequential",
    "save_text_output",
]
