"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full plan execution,
no driver-side collect cost). Session startup is excluded; a warm-up
query primes the JVM/codegen before timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mr_spark import operators as ops
from mr_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("mr-spark-bench")

    queries = ops.queries()
    # warm-up: JVM JIT + codegen + parquet footer caches
    force(queries["early_exit"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
