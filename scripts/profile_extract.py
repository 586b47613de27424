#!/usr/bin/env python
"""Sub-stage noop-sink timing of the flagship EXTRACT stage (guide §1.4).

The round-6 flagship profile shows extract as the dominant stage at
sf1.0-scale; this breaks it into corpus / lang-count / per-branch extraction
/ dedupe so the Python-boundary share is visible. Usage:
  SPARK_GRAFT_SF_DIR=/tmp/sfsynth1.0 python scripts/profile_extract.py
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfsynth1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from kgpipe_spark import pipelines as P
    from kgpipe_spark.operators.extract import (
        extract_code_triples,
        extract_json_triples,
        extract_text_surface_triples,
        salted_repartition,
    )
    from kgpipe_spark.operators.linking import label_dictionary
    from kgpipe_spark.operators.transform import remove_empty_literals
    from kgpipe_spark.schemas import TRIPLE_COLS
    from kgpipe_spark.session import get_spark

    spark = get_spark(
        app_name="kgpipe-profile-extract",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _wu(s):
        return s

    spark.range(100_000, numPartitions=int(cpus)).select(_wu(col("id"))).count()

    timings = {}

    def t(name, fn, trials=2):
        best = None
        for _ in range(trials):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name:28s} {best:8.3f}", flush=True)

    sc = spark.sparkContext

    sc.setJobDescription("px: corpus build")
    t("corpus_build", lambda: noop(E._flagship_corpus(spark, sf_dir)))

    # materialize the corpus once so branch timings exclude the corpus build
    corpus = E._flagship_corpus(spark, sf_dir).localCheckpoint()
    n_rows = corpus.count()
    npart = max(int(cpus), 8)
    map_parts = max(
        spark.sparkContext.defaultParallelism, npart, -(-n_rows // P._ROWS_PER_MAP_PARTITION)
    )
    rep = salted_repartition(corpus, map_parts).localCheckpoint()
    print(f"corpus rows={n_rows} map_parts={map_parts}")

    sc.setJobDescription("px: lang counts")
    t("lang_counts", lambda: corpus.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect())

    sc.setJobDescription("px: json branch")
    t("json_branch", lambda: noop(extract_json_triples(rep)))

    sc.setJobDescription("px: code branch")
    t("code_branch", lambda: noop(extract_code_triples(rep)))

    nation = E._read(spark, sf_dir, "nation")
    region = E._read(spark, sf_dir, "region")
    from kgpipe_spark.operators.extract import unpivot_to_triples

    seed = unpivot_to_triples(
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
    dictionary = label_dictionary(seed)

    sc.setJobDescription("px: text branch")
    t(
        "text_branch",
        lambda: noop(
            P.text_surface_to_triples(extract_text_surface_triples(rep), dictionary)
        ),
    )

    # union + clean + project + dedupe on top of all three branches
    def full_tail():
        ext = (
            extract_json_triples(rep)
            .unionByName(extract_code_triples(rep))
            .unionByName(
                P.text_surface_to_triples(extract_text_surface_triples(rep), dictionary)
            )
        )
        noop(remove_empty_literals(ext).select(*TRIPLE_COLS).dropDuplicates())

    sc.setJobDescription("px: full extract tail (branches + dedupe)")
    t("branches_plus_dedupe", full_tail)

    sc.setJobDescription("px: whole stage_extract (incl corpus)")
    t("stage_extract_e2e", lambda: noop(P._stage_extract(spark, E._flagship_corpus(spark, sf_dir), seed)))

    print(json.dumps({"sf_dir": sf_dir, "timings": timings, "loadavg": os.getloadavg()[:2]}))


if __name__ == "__main__":
    main()
