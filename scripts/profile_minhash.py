#!/usr/bin/env python
"""Stage-isolated noop-sink profile of doc_minhash_lsh_pairs (guide §1.4).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_minhash.py [trials]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E  # noqa: E402
from kgpipe_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, fn, trials):
    best = None
    for _ in range(trials):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:32s} min {best:6.2f}s over {trials}")
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        app_name="profile-minhash",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from kgpipe_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    docs = E._aug_docs(spark, sf_dir)
    spark.sparkContext.setJobDescription("docs materialize")
    timeit("docs scan", lambda: noop(docs), trials)

    spark.sparkContext.setJobDescription("signatures")
    timeit("signatures (noop)", lambda: noop(minhash_signatures(docs)), trials)

    # full pipeline
    spark.sparkContext.setJobDescription("full minhash_lsh_pairs")
    timeit("full lsh pairs (noop)", lambda: noop(minhash_lsh_pairs(docs, num_hashes=16, bands=8, jaccard_threshold=0.5)), trials)

    # decompose: sigs materialized once, then banding+cand+verify on top
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    spark.sparkContext.setJobDescription("banding+cand+verify on cached sigs")

    def rest():
        import kgpipe_spark.operators.dedup as D

        rows_per_band = 2
        bands = 8
        banded = sigs.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.transform(
                                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        cand = (
            banded.groupBy("band", "bucket")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
            .select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x, i: F.transform(
                                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
            .dropDuplicates()
        )
        sh = sigs.select("doc_id", "grams64")
        cand = cand.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("grams64").alias("sh_a")), "id_a"
        ).join(sh.select(F.col("doc_id").alias("id_b"), F.col("grams64").alias("sh_b")), "id_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        noop(
            cand.withColumn("jaccard", inter / union)
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )

    timeit("band+cand+verify (cached sigs)", rest, trials)

    # signature sub-stages
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    words = docs.repartition(n_part, F.col("doc_id")).select(
        "doc_id", F.posexplode(E.F.filter(F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "), lambda w: w != "")).alias("pos", "w")
    )
    spark.sparkContext.setJobDescription("words explode")
    timeit("words posexplode (noop)", lambda: noop(words), trials)

    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("w", j).over(w) for j in range(1, 3)]
    sh_rows = (
        words.withColumn("s", F.concat_ws(" ", F.col("w"), *leads))
        .withColumn("_last", leads[-1])
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "s")
        .distinct()
    )
    spark.sparkContext.setJobDescription("shingle rows")
    timeit("shingles+distinct (noop)", lambda: noop(sh_rows), trials)

    ab = sh_rows.select(
        "doc_id",
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long").alias("a"),
        F.conv(F.substring(F.md5("s"), 9, 8), 16, 10).cast("long").alias("b"),
        F.xxhash64("s").alias("h64"),
    )
    agg = ab.groupBy("doc_id").agg(
        *[
            F.min((F.col("a") + F.lit(i) * F.col("b")) % F.lit(4294967296)).alias(f"_h{i}")
            for i in range(16)
        ],
        F.collect_list("h64").alias("grams64"),
    )
    spark.sparkContext.setJobDescription("sig agg")
    timeit("md5+minagg (noop)", lambda: noop(agg), trials)

    print("loadavg", open("/proc/loadavg").read().split()[:2])


if __name__ == "__main__":
    main()
