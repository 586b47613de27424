#!/usr/bin/env python
"""Fuse-tail scaling diagnostic (VERDICT r5 next-round #3).

The round-5 winning scaling window showed fuse_complete at 1.16x N->4N at
500k corpus rows, adjudicated as a barrier artifact. This probe isolates the
fuse stage on a 2M-row synthetic canonical-triples table (written once to
parquet) and times it at local[2] vs local[8] in fresh JVMs, 4N leg first
(the r5 protocol: the wide leg must not inherit a drained burst-credit pool).

Usage:
  python scripts/fuse_scaling_probe.py gen      # write the 2M-row input
  python scripts/fuse_scaling_probe.py run 8    # one timed leg at local[8]
  python scripts/fuse_scaling_probe.py pair     # gen + 8-leg + 2-leg, report
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.environ.get("FUSE_PROBE_DATA", "/tmp/fuse_probe_triples")
ROWS = int(os.environ.get("FUSE_PROBE_ROWS", "2000000"))


def _spark(cores: int):
    from kgpipe_spark.session import get_spark

    return get_spark(
        app_name=f"fuse-probe-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 4, 8),
    )


def gen() -> None:
    """2M synthetic canonical triples: ~5 triples per entity over 400k
    entities, URI-shaped strings, ~28% label rows — the flagship fuse
    input's shape at ~13x its sf1.0 row count."""
    from pyspark.sql import functions as F

    spark = _spark(8)
    n_ent = ROWS // 5
    df = spark.range(ROWS).select(
        F.concat(F.lit("http://kg.org/e/"), F.md5((F.col("id") % n_ent).cast("string"))).alias("subject"),
        F.element_at(
            F.array(
                F.lit("http://www.w3.org/2000/01/rdf-schema#label"),
                F.lit("http://kg.org/prop/name"),
                F.lit("http://kg.org/prop/segment"),
                F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
                F.lit("http://kg.org/prop/balance"),
            ),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("predicate"),
        F.concat(F.lit("value_"), (F.col("id") % 97).cast("string")).alias("object_lex"),
        F.when(F.col("id") % 5 == 3, F.lit("uri")).otherwise(F.lit("literal")).alias("object_kind"),
        F.when(
            F.col("id") % 5 == 3, F.lit(None).cast("string")
        ).otherwise(F.lit("http://www.w3.org/2001/XMLSchema#string")).alias("object_datatype"),
    )
    df.write.mode("overwrite").parquet(DATA)
    print(f"wrote {ROWS} rows to {DATA}")
    spark.stop()


def run(cores: int) -> float:
    from pyspark.sql import functions as F

    from kgpipe_spark.operators.extract import unpivot_to_triples
    from kgpipe_spark.pipelines import _stage_fuse_complete

    spark = _spark(cores)
    nation = spark.read.parquet("/root/testdata/sf1.0/nation.parquet")
    region = spark.read.parquet("/root/testdata/sf1.0/region.parquet")
    seed = unpivot_to_triples(
        nation,
        subject_expr=F.concat(F.lit("http://kg.org/nation/"), F.col("n_nationkey").cast("string")),
        type_uri="http://kg.org/onto/Nation",
        label_col="n_name",
        literal_cols={},
    ).unionByName(
        unpivot_to_triples(
            region,
            subject_expr=F.concat(F.lit("http://kg.org/region/"), F.col("r_regionkey").cast("string")),
            type_uri="http://kg.org/onto/Region",
            label_col="r_name",
            literal_cols={},
        )
    )
    canonical = spark.read.parquet(DATA)
    # warmup pass (codegen compile) on a slice, then timed full passes
    _stage_fuse_complete(spark, canonical.limit(50_000), seed).write.format(
        "noop"
    ).mode("overwrite").save()
    times = []
    for _ in range(2):
        t0 = time.time()
        _stage_fuse_complete(spark, canonical, seed).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(round(time.time() - t0, 2))
    best = min(times)
    print(json.dumps({"cores": cores, "trials": times, "best": best, "loadavg": os.getloadavg()[:2]}))
    spark.stop()
    return best


def pair() -> None:
    if not os.path.isdir(DATA):
        gen()
    me = os.path.abspath(__file__)
    out = {}
    for cores in (8, 2):  # wide leg first (r5 protocol)
        r = subprocess.run(
            [sys.executable, me, "run", str(cores)], capture_output=True, text=True
        )
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode != 0 or not lines:
            sys.stderr.write(r.stderr[-2000:])
            raise SystemExit(f"leg local[{cores}] failed (rc={r.returncode})")
        out[cores] = json.loads(lines[-1])
        print(lines[-1])
    speedup = out[2]["best"] / out[8]["best"]
    print(
        json.dumps(
            {
                "rows": ROWS,
                "t_2core": out[2]["best"],
                "t_8core": out[8]["best"],
                "speedup_2_to_8": round(speedup, 3),
                "scaling_efficiency": round(speedup / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "pair"
    if cmd == "gen":
        gen()
    elif cmd == "run":
        print(run(int(sys.argv[2])))
    else:
        pair()
