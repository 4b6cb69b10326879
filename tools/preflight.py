"""One-command round preflight: rehearse the DRIVER's own checks.

1. Vanilla-session smoke — a bare local[8] SparkSession (not our tuned
   one) imports __spark_entry__ and runs entry() + a probe query, the way
   the real driver does.
2. Prefix correctness — the driver checks only the first 50 registry
   entries; run exactly those through the oracle comparison at sf0.01.
3. Bench-line parse — run bench.py at sf0.01 and json-parse its single
   stdout line (the round-1 failure mode was an overlong line).

Usage: python tools/preflight.py [--full]   (--full checks all queries)
Exit 0 = ready for the driver.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"


def main() -> int:
    full = "--full" in sys.argv
    failures = []

    print("== 1/3 vanilla-session smoke ==", flush=True)
    smoke = subprocess.run(
        [sys.executable, "-c", (
            "from pyspark.sql import SparkSession\n"
            "spark = SparkSession.builder.master('local[8]').getOrCreate()\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            "import sys; sys.path.insert(0, %r)\n"
            "import __spark_entry__ as e\n"
            "n = e.entry(spark).count()\n"
            "assert n > 0, 'entry returned 0 rows'\n"
            "qs, os_ = e.queries(), e.oracle_sql()\n"
            "assert set(os_) <= set(qs), 'oracle without query'\n"
            "probe = next(iter(qs))\n"
            "print('entry rows:', n, '| first registry entry:', probe)\n"
            "print('probe rows:', qs[probe](spark, %r).count())\n"
        ) % (REPO, SF)],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    print(smoke.stdout.strip().splitlines()[-2:] if smoke.stdout else smoke.stderr[-500:])
    if smoke.returncode != 0:
        failures.append("vanilla smoke failed: " + smoke.stderr[-1000:])

    print("== 2/3 driver-prefix correctness (first 50) ==", flush=True)
    from mr_spark import operators as ops

    names = list(ops.queries())
    subset = names if full else names[:50]
    chk = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), SF, *subset],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    tail = [l for l in chk.stdout.splitlines() if l.startswith(("FAIL", "ok?")) or "failures" in l]
    print("\n".join(tail) or chk.stderr[-500:])
    if chk.returncode != 0:
        failures.append("correctness failures (see above)")

    print("== 3/3 bench line parse ==", flush=True)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF, SPARK_GRAFT_BENCH_PASSES="1")
    bench = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, capture_output=True, text=True, timeout=3600, env=env,
    )
    line = bench.stdout.strip().splitlines()[-1] if bench.stdout.strip() else ""
    try:
        parsed = json.loads(line)
        assert {"metric", "value", "unit", "sf"} <= set(parsed), "missing keys"
        assert len(line) < 1024, f"stdout line too long ({len(line)}B) for driver capture"
        print(f"parsed ok: {parsed['value']}s / {parsed.get('n_queries', '?')} queries, {len(line)}B line")
    except Exception as exc:  # noqa: BLE001
        failures.append(f"bench line unparseable: {exc}; line={line[:200]!r}")

    print()
    if failures:
        for f in failures:
            print("PREFLIGHT FAIL:", f)
        return 1
    print("PREFLIGHT OK — ready for the driver")
    return 0


if __name__ == "__main__":
    sys.exit(main())
