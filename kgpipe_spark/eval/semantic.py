"""Semantic validators (SURVEY.md §2.9) — each one = triples ⋈ broadcast
ontology constraints + filter violations.

Reimplements the validator family in
`/root/reference/src/kgpipe/evaluation/aspects/semantic.py:257-881`:
cardinality, domain, range, datatype, relation-direction, disjoint-domain.
Each returns the violating rows (callers count them for violation metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgpipe_spark.schemas import RDF_TYPE


def _types(triples: DataFrame) -> DataFrame:
    return triples.filter(F.col("predicate") == RDF_TYPE).select(
        F.col("subject").alias("e"), F.col("object_lex").alias("cls")
    )


def cardinality_violations(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """(s, p, n) where n > max_cardinality (semantic.py cardinality checker)."""
    card = F.broadcast(
        ontology.filter(F.col("max_cardinality").isNotNull()).select(
            F.col("uri").alias("predicate"), "max_cardinality"
        )
    )
    return (
        triples.join(card, "predicate")
        .groupBy("subject", "predicate", "max_cardinality")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > F.col("max_cardinality"))
        .select("subject", "predicate", "n")
    )


def domain_violations(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """Triples whose subject has a type that contradicts the predicate domain."""
    dom = F.broadcast(
        ontology.filter(F.col("domain").isNotNull()).select(
            F.col("uri").alias("predicate"), "domain"
        )
    )
    typed = _types(triples).withColumnRenamed("e", "subject")
    return (
        triples.join(dom, "predicate")
        .join(typed, "subject", "inner")
        .filter(F.col("cls") != F.col("domain"))
        .select("subject", "predicate", F.col("cls").alias("actual_type"), "domain")
        .distinct()
    )


def range_violations(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """URI-object triples whose object type contradicts the predicate range."""
    rng = F.broadcast(
        ontology.filter(
            F.col("range").isNotNull() & ~F.col("range").startswith("http://www.w3.org/2001/XMLSchema#")
        ).select(F.col("uri").alias("predicate"), "range")
    )
    typed = _types(triples).withColumnRenamed("e", "object_lex")
    return (
        triples.filter(F.col("object_kind") == "uri")
        .join(rng, "predicate")
        .join(typed, "object_lex", "inner")
        .filter(F.col("cls") != F.col("range"))
        .select(
            "subject", "predicate", F.col("object_lex").alias("object_uri"),
            F.col("cls").alias("actual_type"), "range",
        )
        .distinct()
    )


def datatype_violations(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """Literal triples whose datatype contradicts an xsd range declaration."""
    rng = F.broadcast(
        ontology.filter(
            F.col("range").isNotNull() & F.col("range").startswith("http://www.w3.org/2001/XMLSchema#")
        ).select(F.col("uri").alias("predicate"), F.col("range").alias("expected_dt"))
    )
    return (
        triples.filter(F.col("object_kind") == "literal")
        .join(rng, "predicate")
        .filter(F.coalesce(F.col("object_datatype"), F.lit("")) != F.col("expected_dt"))
        .select("subject", "predicate", "object_lex", "object_datatype", "expected_dt")
    )


def object_prop_violations(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """Object-property used with a literal, or datatype-property with a URI
    (relation 'direction'/kind checker)."""
    kinds = F.broadcast(
        ontology.filter(F.col("is_object_prop").isNotNull()).select(
            F.col("uri").alias("predicate"), "is_object_prop"
        )
    )
    return (
        triples.join(kinds, "predicate")
        .filter(
            ((F.col("is_object_prop") == "true") & (F.col("object_kind") == "literal"))
            | ((F.col("is_object_prop") == "false") & (F.col("object_kind") == "uri"))
        )
        .select("subject", "predicate", "object_lex", "object_kind", "is_object_prop")
    )


def disjoint_class_violations(triples: DataFrame, disjoint_pairs: DataFrame) -> DataFrame:
    """Entities typed with two disjoint classes. disjoint_pairs(cls_a, cls_b)."""
    t = _types(triples)
    a = t.withColumnRenamed("cls", "cls_a")
    b = t.withColumnRenamed("cls", "cls_b")
    return (
        a.join(b, "e")
        .join(F.broadcast(disjoint_pairs), ["cls_a", "cls_b"], "left_semi")
        .select(F.col("e").alias("subject"), "cls_a", "cls_b")
        .distinct()
    )
