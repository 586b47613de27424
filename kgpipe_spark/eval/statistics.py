"""Statistical KG measures (SURVEY.md §2.9 count_measures).

Reimplements `/root/reference/src/kgpipe_eval/metrics/statistics.py:21-45`
and the metric classes in `statistical.py:36-220`:
 - entities = distinct subjects ∪ distinct URI objects (statistical.py:47-69)
 - relations = distinct predicates (statistical.py:101-121)
 - triples = row count (statistical.py:146-176)
 - classes = distinct rdf:type objects (statistical.py:211-220)
plus per-predicate and per-class occurrence histograms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgpipe_spark.schemas import RDF_TYPE


def count_measures(triples: DataFrame) -> DataFrame:
    subj = triples.select(F.col("subject").alias("e"))
    obj = triples.filter(F.col("object_kind") == "uri").select(F.col("object_lex").alias("e"))
    n_entities = subj.union(obj).distinct().count()
    row = triples.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("predicate").alias("n_relations"),
        F.countDistinct("subject").alias("n_subjects"),
        F.countDistinct(
            F.when(F.col("predicate") == RDF_TYPE, F.col("object_lex"))
        ).alias("n_classes"),
    ).collect()[0]
    spark = triples.sparkSession
    return spark.createDataFrame(
        [
            (
                int(row["n_triples"]),
                int(n_entities),
                int(row["n_relations"]),
                int(row["n_subjects"]),
                int(row["n_classes"]),
            )
        ],
        "n_triples bigint, n_entities bigint, n_relations bigint, n_subjects bigint, n_classes bigint",
    )


def predicate_histogram(triples: DataFrame) -> DataFrame:
    return (
        triples.groupBy("predicate")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("predicate"))
    )


def class_histogram(triples: DataFrame) -> DataFrame:
    return (
        triples.filter(F.col("predicate") == RDF_TYPE)
        .groupBy(F.col("object_lex").alias("class_uri"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("class_uri"))
    )
