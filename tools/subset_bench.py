"""Run an ordered subset of registry queries in ONE session, timing each
(bench.py methodology: noop force + clearCache). Usage:
    python tools/subset_bench.py <query> [query ...]
Prints one line per query plus a total. Use to reproduce session-context
effects the solo bench can't see."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_spark import operators as ops
from mr_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mr-spark-subset", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = ops.queries()
    qs["early_exit"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        print(json.dumps({"q": name, "sec": timings[name]}), flush=True)
    print(json.dumps({"total": round(sum(timings.values()), 3), "n": len(timings)}))


if __name__ == "__main__":
    main()
