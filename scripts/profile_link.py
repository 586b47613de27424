#!/usr/bin/env python
"""Sub-stage noop-sink timing of the flagship LINK+CANONICALIZE stage
(guide §1.4). Usage:
  SPARK_GRAFT_SF_DIR=/tmp/sfsynth1.0 python scripts/profile_link.py
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
    from kgpipe_spark.operators.cluster import canonical_map, connected_components
    from kgpipe_spark.operators.fusion import canonicalize_triples
    from kgpipe_spark.operators.linking import label_dictionary
    from kgpipe_spark.functions.strings import normalize_label
    from kgpipe_spark.schemas import KG_NS, RDFS_LABEL
    from kgpipe_spark.session import get_spark

    spark = get_spark(
        app_name="kgpipe-profile-link",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col, pandas_udf
    from pyspark.sql.window import Window

    @pandas_udf("long")
    def _wu(s):
        return s

    spark.range(100_000, numPartitions=int(cpus)).select(_wu(col("id"))).count()

    from kgpipe_spark.operators.extract import unpivot_to_triples

    nation = E._read(spark, sf_dir, "nation")
    region = E._read(spark, sf_dir, "region")
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

    corpus = E._flagship_corpus(spark, sf_dir)
    extracted = P._stage_extract(spark, corpus, seed).localCheckpoint()
    extracted.count()

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
    dictionary = label_dictionary(seed)

    sc.setJobDescription("pl: link map")
    t("link_map", lambda: noop(P.link_map(extracted, dictionary)))

    lmap = P.link_map(extracted, dictionary).persist()
    lmap.count()

    def edge_build():
        label_pairs = (
            canonicalize_triples(
                extracted.filter(F.col("predicate") == RDFS_LABEL), lmap
            )
            .select("subject", normalize_label(F.col("object_lex")).alias("norm"))
            .filter(F.col("norm").isNotNull())
            .repartition("norm")
            .distinct()
        )
        dup_edges = (
            label_pairs.withColumn(
                "src", F.min("subject").over(Window.partitionBy("norm"))
            )
            .filter(F.col("subject") != F.col("src"))
            .select("src", F.col("subject").alias("dst"))
        )
        return dup_edges

    sc.setJobDescription("pl: edge build")
    t("edge_build", lambda: noop(edge_build()))

    sc.setJobDescription("pl: cc + canonical_map")
    t("cc_plus_map", lambda: noop(canonical_map(connected_components(edge_build()), prefer_namespace=KG_NS + "person/")))

    canon = canonical_map(connected_components(edge_build()), prefer_namespace=KG_NS + "person/")
    sc.setJobDescription("pl: compose maps")
    t("compose_maps", lambda: noop(P.compose_maps(lmap, canon)))

    composed = P.compose_maps(lmap, canon).persist()
    composed.count()
    sc.setJobDescription("pl: full-KG rewrite")
    t("full_kg_rewrite", lambda: noop(canonicalize_triples(extracted, composed)))

    sc.setJobDescription("pl: whole stage")
    t("stage_link_canon_e2e", lambda: noop(P._stage_link_canonicalize(spark, extracted, seed)))

    print(json.dumps({"sf_dir": sf_dir, "timings": timings, "loadavg": os.getloadavg()[:2]}))


if __name__ == "__main__":
    main()
