"""Solo per-query bench: fresh tuned session, warm-up, then N timed passes
of ONE query at $SPARK_GRAFT_SF_DIR (default sf0.1). Mirrors bench.py's
timing (noop-sink force, clearCache between passes) so numbers are
directly comparable to BENCH_DETAIL entries. Usage:
    python tools/solo_bench.py <query> [n_passes]
Prints one JSON line {"query": ..., "passes": [...], "min": ...}."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_spark import operators as ops
from mr_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mr-spark-solo", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = ops.queries()
    qs["early_exit"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    trace = []
    for _ in range(n):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        trace.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(json.dumps({"query": name, "sf_dir": sf_dir, "passes": trace, "min": min(trace)}))


if __name__ == "__main__":
    main()
