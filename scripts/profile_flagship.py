#!/usr/bin/env python
"""Per-stage noop-sink timing of the flagship pipeline (guide §1.4).

Times each flagship stage in isolation (computation only — noop sink), twice,
reporting min. Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/profile_flagship.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from kgpipe_spark import pipelines as P
    from kgpipe_spark.session import get_spark

    spark = get_spark(
        app_name="kgpipe-profile-flagship",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    # warmup identical to bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _wu(s):
        return s

    spark.range(100_000, numPartitions=int(cpus)).select(_wu(col("id"))).count()

    from pyspark.sql import functions as F

    from kgpipe_spark.operators.extract import unpivot_to_triples

    nation = E._read(spark, sf_dir, "nation")
    region = E._read(spark, sf_dir, "region")

    def build_seed():
        return unpivot_to_triples(
            nation,
            subject_expr=F.concat(F.lit(E.NAT), F.col("n_nationkey").cast("string")),
            type_uri=E.O + "Nation",
            label_col="n_name",
            literal_cols={},
            uri_cols={E.P + "region": F.concat(F.lit(E.REG), F.col("n_regionkey").cast("string"))},
        ).unionByName(
            unpivot_to_triples(
                region,
                subject_expr=F.concat(F.lit(E.REG), F.col("r_regionkey").cast("string")),
                type_uri=E.O + "Region",
                label_col="r_name",
                literal_cols={},
            )
        )

    timings = {}

    def t(name, fn, trials=2):
        best = None
        for _ in range(trials):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name:30s} {best:8.3f}", flush=True)

    sc = spark.sparkContext

    # stage 0: corpus build alone
    sc.setJobDescription("profile: corpus")
    t("corpus", lambda: noop(E._flagship_corpus(spark, sf_dir)))

    # stage 1: extract
    corpus = E._flagship_corpus(spark, sf_dir)
    seed = build_seed()
    sc.setJobDescription("profile: extract")
    t("stage_extract", lambda: noop(P._stage_extract(spark, corpus, seed)))

    # materialize extracted once for downstream isolation
    extracted = P._stage_extract(spark, corpus, seed).localCheckpoint()

    sc.setJobDescription("profile: link_canonicalize")
    t("stage_link_canon", lambda: noop(P._stage_link_canonicalize(spark, extracted, seed)))

    canonical = P._stage_link_canonicalize(spark, extracted, seed).localCheckpoint()

    sc.setJobDescription("profile: fuse_complete")
    t("stage_fuse_complete", lambda: noop(P._stage_fuse_complete(spark, canonical, seed)))

    # end-to-end (count like bench.py)
    sc.setJobDescription("profile: end-to-end")
    t("flagship_e2e", lambda: E._flagship(spark, sf_dir).count())

    print(json.dumps({"sf_dir": sf_dir, "timings": timings, "loadavg": os.getloadavg()[:2]}))


if __name__ == "__main__":
    main()
