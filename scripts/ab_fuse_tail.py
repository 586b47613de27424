#!/usr/bin/env python
"""Interleaved A/B: flagship fuse_complete tail with the inner
type-inference dedupe kept (current) vs dropped (outer dedupe subsumes it).

Both variants must produce identical rows (checked). Usage:
  SPARK_GRAFT_SF_DIR=/tmp/sfsynth1.0 python scripts/ab_fuse_tail.py [pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfsynth1.0")
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from kgpipe_spark import pipelines as P
    from kgpipe_spark.session import get_spark
    from kgpipe_spark.operators.fusion import fuse_first_value
    from kgpipe_spark.operators.transform import type_inference_simple
    from kgpipe_spark.schemas import RDF_TYPE, TRIPLE_COLS

    spark = get_spark(
        app_name="ab-fuse-tail", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from kgpipe_spark.operators.extract import unpivot_to_triples

    corpus = E._flagship_corpus(spark, sf_dir)
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
    extracted = P._stage_extract(spark, corpus, seed).localCheckpoint()
    canonical = P._stage_link_canonicalize(spark, extracted, seed).localCheckpoint()
    ontology = P.default_flagship_ontology(spark, seed)
    fusable = P._fusable(spark, ontology)

    def tail_current():
        fused = P._stage_cut(
            fuse_first_value(seed.select(*TRIPLE_COLS), canonical.select(*TRIPLE_COLS), fusable)
        )
        inferred = type_inference_simple(fused, ontology)
        types = fused.filter(F.col("predicate") == RDF_TYPE).unionByName(inferred).dropDuplicates()
        return fused.filter(F.col("predicate") != RDF_TYPE).unionByName(types)

    def tail_nodedupe():
        fused = P._stage_cut(
            fuse_first_value(seed.select(*TRIPLE_COLS), canonical.select(*TRIPLE_COLS), fusable)
        )
        onto = F.broadcast(
            ontology.select(F.col("uri").alias("predicate"), "domain", "range", "is_object_prop")
        )
        joined = fused.join(onto, "predicate", "inner")
        from_domain = joined.filter(F.col("domain").isNotNull()).select(
            F.col("subject"), F.lit(RDF_TYPE).alias("predicate"),
            F.col("domain").alias("object_lex"), F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
        from_range = joined.filter(
            F.col("range").isNotNull() & (F.col("object_kind") == "uri")
        ).select(
            F.col("object_lex").alias("subject"), F.lit(RDF_TYPE).alias("predicate"),
            F.col("range").alias("object_lex"), F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
        inferred = from_domain.unionByName(from_range)
        types = fused.filter(F.col("predicate") == RDF_TYPE).unionByName(inferred).dropDuplicates()
        return fused.filter(F.col("predicate") != RDF_TYPE).unionByName(types)

    def tail_anti():
        # fused is (s,p,o,kind)-unique by fuse_first_value construction, so
        # dedup(existing ∪ inferred) == existing ∪ (dedup(inferred) anti
        # existing): the 150k existing type rows skip the dedupe exchange
        fused = P._stage_cut(
            fuse_first_value(seed.select(*TRIPLE_COLS), canonical.select(*TRIPLE_COLS), fusable)
        )
        inferred = type_inference_simple(fused, ontology)
        existing = fused.filter(F.col("predicate") == RDF_TYPE)
        # eqNullSafe: dropDuplicates treats nulls as equal (type rows carry
        # null object_datatype), a plain column-list anti join does not
        cond = None
        ex = existing
        for c in TRIPLE_COLS:
            ex = ex.withColumnRenamed(c, f"_e_{c}")
            k = inferred[c].eqNullSafe(F.col(f"_e_{c}"))
            cond = k if cond is None else (cond & k)
        new_types = inferred.join(ex, cond, "left_anti")
        return fused.unionByName(new_types)

    def tail_tagged(ont=None, fused_in=None):
        # ONE exchange: tag existing(1)/inferred-raw(2), groupBy the 5
        # triple columns (nulls equal, map-side partial agg collapses
        # duplicates before the wire), keep min(tag)==2 rows = inferred
        # types absent from existing; no join, no broadcast dependence
        ont = ont if ont is not None else ontology
        fused = fused_in if fused_in is not None else P._stage_cut(
            fuse_first_value(seed.select(*TRIPLE_COLS), canonical.select(*TRIPLE_COLS), fusable)
        )
        onto_b = F.broadcast(
            ont.select(F.col("uri").alias("predicate"), "domain", "range", "is_object_prop")
        )
        joined = fused.join(onto_b, "predicate", "inner")
        from_domain = joined.filter(F.col("domain").isNotNull()).select(
            F.col("subject"), F.lit(RDF_TYPE).alias("predicate"),
            F.col("domain").alias("object_lex"), F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
        from_range = joined.filter(
            F.col("range").isNotNull() & (F.col("object_kind") == "uri")
        ).select(
            F.col("object_lex").alias("subject"), F.lit(RDF_TYPE).alias("predicate"),
            F.col("range").alias("object_lex"), F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
        existing = fused.filter(F.col("predicate") == RDF_TYPE)
        tagged = existing.withColumn("_t", F.lit(1)).unionByName(
            from_domain.unionByName(from_range).withColumn("_t", F.lit(2))
        )
        new_types = (
            tagged.groupBy(*TRIPLE_COLS)
            .agg(F.min("_t").alias("_m"))
            .filter(F.col("_m") == 2)
            .select(*TRIPLE_COLS)
        )
        return fused.unionByName(new_types)

    # equality check first (sorted collect hash)
    import hashlib

    def h(df):
        rows = sorted("\x1f".join("" if c is None else str(c) for c in r) for r in df.collect())
        return len(rows), hashlib.md5("\n".join(rows).encode()).hexdigest()

    ha, hb, hc = h(tail_current()), h(tail_nodedupe()), h(tail_anti())
    hd = h(tail_tagged())
    print("current:", ha, "nodedupe:", hb, "anti:", hc, "tagged:", hd,
          "IDENTICAL" if ha == hb == hc == hd else "**DIFFER**")
    if not (ha == hb == hc == hd):
        sys.exit(1)

    # overlap case: a synthetic ontology whose declarations make inferred
    # NON-empty and guaranteed to collide with existing type rows — the
    # null-safe anti join must reproduce dropDuplicates' null-as-equal
    # semantics exactly here
    fused0 = fuse_first_value(
        seed.select(*TRIPLE_COLS), canonical.select(*TRIPLE_COLS), fusable
    ).localCheckpoint()
    top_class = (
        fused0.filter(F.col("predicate") == RDF_TYPE)
        .groupBy("object_lex").count().orderBy(F.desc("count")).first()[0]
    )
    top_preds = [
        r[0]
        for r in fused0.filter(F.col("predicate") != RDF_TYPE)
        .groupBy("predicate").count().orderBy(F.desc("count")).limit(3).collect()
    ]
    onto2 = spark.createDataFrame(
        [(p, p.rsplit("/", 1)[-1], None, top_class, None, "true", 1) for p in top_preds],
        "uri string, label string, aliases array<string>, domain string, range string, is_object_prop string, max_cardinality int",
    )

    def tail_with(ont, mode):
        inferred = type_inference_simple(fused0, ont)
        existing = fused0.filter(F.col("predicate") == RDF_TYPE)
        if mode == "current":
            types = existing.unionByName(inferred).dropDuplicates()
            return fused0.filter(F.col("predicate") != RDF_TYPE).unionByName(types)
        cond = None
        ex = existing
        for c in TRIPLE_COLS:
            ex = ex.withColumnRenamed(c, f"_e_{c}")
            k = inferred[c].eqNullSafe(F.col(f"_e_{c}"))
            cond = k if cond is None else (cond & k)
        return fused0.unionByName(inferred.join(ex, cond, "left_anti"))

    n_inf = type_inference_simple(fused0, onto2).count()
    ho_cur, ho_anti = h(tail_with(onto2, "current")), h(tail_with(onto2, "anti"))
    ho_tag = h(tail_tagged(ont=onto2, fused_in=fused0))
    print(f"overlap case: inferred={n_inf}  current:", ho_cur, "anti:", ho_anti,
          "tagged:", ho_tag, "IDENTICAL" if ho_cur == ho_anti == ho_tag else "**DIFFER**")
    if not (ho_cur == ho_anti == ho_tag):
        sys.exit(1)

    times = {"current": [], "anti": [], "tagged": []}
    for i in range(pairs):
        for name, fn in (("current", tail_current), ("anti", tail_anti), ("tagged", tail_tagged)):
            t0 = time.time()
            noop(fn())
            times[name].append(round(time.time() - t0, 3))
    print({k: (min(v), v) for k, v in times.items()})
    print("loadavg", open("/proc/loadavg").read().split()[:2])


if __name__ == "__main__":
    main()
