#!/usr/bin/env python
"""A/B the flagship stage-boundary cut strategy (persist vs eager vs lazy
localCheckpoint) in ONE JVM / one host window, interleaved so host drift
cannot favor a mode. Prints one JSON line.

Usage: python scripts/ab_boundary.py [SF_DIR] [CPUS] [TRIALS_PER_MODE]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from kgpipe_spark.session import get_spark

    spark = get_spark(
        app_name="ab-boundary",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _wu(s):
        return s

    spark.range(100_000, numPartitions=int(cpus)).select(_wu(col("id"))).count()

    fn = E.queries()["kg_flagship_pipeline"]
    modes = ["eager", "lazy", "persist"]
    results: dict[str, list] = {m: [] for m in modes}
    counts: dict[str, int] = {}
    # one untimed warm pass (mode irrelevant for codegen shapes)
    os.environ["KG_STAGE_BOUNDARY"] = "lazy"
    fn(spark, sf_dir).count()
    spark.catalog.clearCache()

    for t in range(trials):
        for m in modes:
            os.environ["KG_STAGE_BOUNDARY"] = m
            la0 = os.getloadavg()[0]
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            results[m].append({"sec": round(dt, 2), "loadavg": round(la0, 2)})
            counts[m] = n
            spark.catalog.clearCache()

    out = {
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "trials": results,
        "min": {m: min(r["sec"] for r in results[m]) for m in modes},
        "rows": counts,
        "loadavg_end": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
