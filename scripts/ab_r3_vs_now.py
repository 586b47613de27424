#!/usr/bin/env python
"""Same-window A/B: flagship timing under the r3 codebase vs the current
one. Runs each codebase in its own subprocess JVM (alternating, N rounds),
same host window. Prints one JSON line.

Usage: python scripts/ab_r3_vs_now.py [R3_TREE] [SF_DIR] [ROUNDS]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
import __spark_entry__ as E
from kgpipe_spark.session import get_spark
spark = get_spark(app_name="ab-r3", master="local[32]", shuffle_partitions=32)
spark.range(1_000_000).selectExpr("sum(id)").collect()
from pyspark.sql.functions import col, pandas_udf
@pandas_udf("long")
def _wu(s):
    return s
spark.range(100_000, numPartitions=32).select(_wu(col("id"))).count()
fn = E.queries()["kg_flagship_pipeline"]
sf = sys.argv[2]
out = []
for i in range(2):
    t0 = time.time()
    n = fn(spark, sf).count()
    out.append(round(time.time() - t0, 2))
    spark.catalog.clearCache()
print("ABRESULT " + json.dumps({"times": out, "rows": n}))
"""


def run_once(tree: str, sf: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, sf],
        capture_output=True, text=True, timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    return {"error": p.stderr[-800:], "rc": p.returncode}


def main() -> None:
    r3 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3tree"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    now = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = {"r3": [], "now": [], "loadavg": []}
    for _ in range(rounds):
        for key, tree in (("now", now), ("r3", r3)):
            res["loadavg"].append(round(os.getloadavg()[0], 2))
            res[key].append(run_once(tree, sf))
    for key in ("r3", "now"):
        times = [t for r in res[key] if "times" in r for t in r["times"]]
        res[f"{key}_min"] = min(times) if times else None
    print(json.dumps(res))


if __name__ == "__main__":
    main()
