"""Transform / interop / enrichment operators (SURVEY.md §2.8) + N-Triples IO
(§2.1).

 - ``pivot_triples_to_wide`` — triples → one row per subject, one column per
   ``<predicate>_{uri|literal}``, multi-values "; "-joined (sorted for
   determinism) — `transform.py:10-135` (`transform_rdf_to_csv`).
 - ``type_inference_simple`` — enrich rdf:type from property domain/range —
   `type_completion.py:8-45`; the closer of every pipeline in pipeline.conf.
 - ``ntriples_lines`` / ``parse_ntriples`` — line-oriented N-Triples sink /
   scan (embarrassingly parallel; replaces whole-file rdflib parses,
   `kg.py:38-46`).
 - ``remove_empty_literals`` — the reference's cleaning stub implemented
   (`cleaning/clean.py:9-15`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgpipe_spark.schemas import RDF_TYPE, SKOS_ALT_LABEL


def pivot_triples_to_wide(triples: DataFrame, predicates: list[str] | None = None) -> DataFrame:
    """groupBy(subject).pivot(predicate_kind).agg(concat_ws('; ', sorted vals)).

    Passing ``predicates`` pins the pivot columns (no extra pass + stable
    schema — required at scale; Spark otherwise scans once just to find
    distinct keys).
    """
    keyed = triples.withColumn(
        "pkey",
        F.concat_ws(
            "_",
            F.col("predicate"),
            F.when(F.col("object_kind") == "uri", F.lit("uri")).otherwise(F.lit("literal")),
        ),
    )
    pvt = keyed.groupBy("subject").pivot(
        "pkey", values=[p for p in predicates] if predicates else None
    )
    return pvt.agg(F.concat_ws("; ", F.sort_array(F.collect_list("object_lex"))))


def type_inference_simple(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """Emit (s, rdf:type, domain) and (o, rdf:type, range) for every triple
    whose predicate has a declared domain/range (`type_completion.py:8-45`).
    Ontology is tiny → broadcast joins; result deduped."""
    return type_inference_branches(triples, ontology).dropDuplicates()


def type_inference_branches(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """``type_inference_simple`` WITHOUT the final dedupe — for callers that
    fold the inferred rows into their own grouping anyway (the pipeline
    type-completion tails), so the inference costs zero exchanges of its
    own. Rows may repeat; every row carries object_kind='uri' and a null
    object_datatype."""
    onto = F.broadcast(
        ontology.select(F.col("uri").alias("predicate"), "domain", "range", "is_object_prop")
    )
    joined = triples.join(onto, "predicate", "inner")

    from_domain = (
        joined.filter(F.col("domain").isNotNull())
        .select(
            F.col("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.col("domain").alias("object_lex"),
            F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
    )
    from_range = (
        joined.filter(
            F.col("range").isNotNull()
            & (F.col("object_kind") == "uri")
        )
        .select(
            F.col("object_lex").alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.col("range").alias("object_lex"),
            F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
    )
    # all-column dedupe (in type_inference_simple): every inferred row
    # carries object_kind='uri' and a null datatype, so deduping on all 5
    # columns equals the 3-col dedupe while planning as a pure-grouping
    # HashAggregate (the subset form kept first()-of-strings for the other
    # columns — a SortAggregate)
    return from_domain.unionByName(from_range)


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """Triples → one N-Triples line per row (column ``line``).

    Literal escaping covers backslash + quote + newlines (the cases the
    synthetic corpora can produce); URIs pass through angle brackets.
    """
    esc = F.regexp_replace(
        F.regexp_replace(F.col("object_lex"), r"\\", r"\\\\"), r'"', r'\\"'
    )
    esc = F.regexp_replace(esc, r"\n", r"\\n")
    obj = F.when(
        F.col("object_kind") == "uri", F.concat(F.lit("<"), F.col("object_lex"), F.lit(">"))
    ).otherwise(
        F.when(
            F.col("object_datatype").isNull()
            | (F.col("object_datatype") == "http://www.w3.org/2001/XMLSchema#string"),
            F.concat(F.lit('"'), esc, F.lit('"')),
        ).otherwise(
            F.concat(F.lit('"'), esc, F.lit('"^^<'), F.col("object_datatype"), F.lit(">"))
        )
    )
    return triples.select(
        F.concat(
            F.lit("<"), F.col("subject"), F.lit("> <"), F.col("predicate"), F.lit("> "), obj, F.lit(" .")
        ).alias("line")
    )


_NT_RE = r'^<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]+)>)?)\s*\.\s*$'


def parse_ntriples(lines: DataFrame, drop_alt_labels: bool = True) -> DataFrame:
    """Line-parallel N-Triples scan → triples schema.

    ``drop_alt_labels`` mirrors the reference's KG load which discards
    skos:altLabel triples (`kg.py:40-45`).
    """
    col = F.col("value") if "value" in lines.columns else F.col("line")
    parsed = lines.select(
        F.regexp_extract(col, _NT_RE, 1).alias("subject"),
        F.regexp_extract(col, _NT_RE, 2).alias("predicate"),
        F.regexp_extract(col, _NT_RE, 3).alias("obj_uri"),
        F.regexp_extract(col, _NT_RE, 4).alias("obj_lit"),
        F.regexp_extract(col, _NT_RE, 5).alias("obj_dt"),
    ).filter(F.col("subject") != "")
    unescaped = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.col("obj_lit"), r"\\n", "\n"), r'\\"', '"'),
        r"\\\\",
        r"\\",
    )
    out = parsed.select(
        "subject",
        "predicate",
        F.when(F.col("obj_uri") != "", F.col("obj_uri")).otherwise(unescaped).alias("object_lex"),
        F.when(F.col("obj_uri") != "", F.lit("uri")).otherwise(F.lit("literal")).alias("object_kind"),
        F.when(F.col("obj_uri") != "", F.lit(None).cast("string"))
        .when(F.col("obj_dt") != "", F.col("obj_dt"))
        .otherwise(F.lit("http://www.w3.org/2001/XMLSchema#string"))
        .alias("object_datatype"),
    )
    if drop_alt_labels:
        out = out.filter(F.col("predicate") != SKOS_ALT_LABEL)
    return out


def remove_inconsistent_triples(triples: DataFrame, ontology: DataFrame) -> DataFrame:
    """Subtract ontology-inconsistent triples — implements the intent of
    ``remove_inconsistent_rdf_triples``
    (`/root/reference/src/kgpipe_tasks/cleaning/clean.py:10-11`, shipped as a
    ``NotImplementedError`` stub there): a triple is dropped when it trips
    the domain validator (its subject carries a type contradicting the
    predicate's declared domain), the range validator (its URI object
    carries a contradicting type), the xsd-datatype validator, or the
    property-kind validator (object property with a literal / datatype
    property with a URI).

    SCALE: the ontology side of every check is broadcast; the violation
    keys are aliased projections of the SAME validator dataframes the eval
    suite verifies, subtracted with left_anti joins — no extra shuffle of
    the KG beyond the anti-join probes.
    """
    from kgpipe_spark.eval.semantic import (
        datatype_violations,
        domain_violations,
        object_prop_violations,
        range_violations,
    )

    bad_sp = domain_violations(triples, ontology).select("subject", "predicate").distinct()
    # object_kind is part of the subtraction key: a literal triple that shares
    # its lexical form with a violating URI object under the same (s, p) must
    # NOT be collaterally dropped.  Range violations are URI objects by
    # construction; datatype violations are literals; property-kind
    # violations carry the violating triple's own kind.
    bad_spo = (
        range_violations(triples, ontology)
        .select(
            "subject", "predicate", F.col("object_uri").alias("object_lex"),
            F.lit("uri").alias("object_kind"),
        )
        .unionByName(
            datatype_violations(triples, ontology).select(
                "subject", "predicate", "object_lex", F.lit("literal").alias("object_kind")
            )
        )
        .unionByName(
            object_prop_violations(triples, ontology).select(
                "subject", "predicate", "object_lex", "object_kind"
            )
        )
        .distinct()
    )
    return triples.join(bad_sp, ["subject", "predicate"], "left_anti").join(
        bad_spo, ["subject", "predicate", "object_lex", "object_kind"], "left_anti"
    )


def remove_empty_literals(triples: DataFrame) -> DataFrame:
    """Implements the reference's `remove_empty_rdf_literals` stub
    (`cleaning/clean.py:12-15`)."""
    return triples.filter(
        ~((F.col("object_kind") == "literal") & (F.length(F.trim(F.coalesce("object_lex", F.lit("")))) == 0))
    )


def extract_ontology_from_rdf(triples: DataFrame) -> DataFrame:
    """RDF triples → the ontology dimension table (uri, label, aliases,
    domain, range, is_object_prop, max_cardinality).

    Implements the intent of ``extract_ontology_from_rdf``
    (`/root/reference/src/kgpipe_tasks/transform/ontology_rdf_filter.py:1-14`
    — shipped as a ``pass`` stub there): properties are subjects of
    rdfs:domain / rdfs:range declarations; label from rdfs:label, aliases
    from skos:altLabel; is_object_prop derived from whether the declared
    range is an xsd datatype; max_cardinality from owl:maxCardinality when
    present.
    """
    from kgpipe_spark.schemas import RDFS_LABEL, SKOS_ALT_LABEL

    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    OWL = "http://www.w3.org/2002/07/owl#"
    XSD = "http://www.w3.org/2001/XMLSchema#"

    def obj_of(pred):
        return triples.filter(F.col("predicate") == pred).select(
            F.col("subject").alias("uri"), F.col("object_lex").alias("v")
        )

    dom = obj_of(RDFS + "domain").withColumnRenamed("v", "domain")
    rng = obj_of(RDFS + "range").withColumnRenamed("v", "range")
    lab = (
        obj_of(RDFS_LABEL)
        .groupBy("uri")
        .agg(F.min("v").alias("label"))
    )
    alias = (
        obj_of(SKOS_ALT_LABEL)
        .groupBy("uri")
        .agg(F.array_sort(F.collect_set("v")).alias("aliases"))
    )
    card = (
        obj_of(OWL + "maxCardinality")
        .groupBy("uri")
        .agg(F.min(F.col("v").cast("int")).alias("max_cardinality"))
    )
    props = dom.join(rng, "uri", "full_outer")
    return (
        props.join(lab, "uri", "left")
        .join(alias, "uri", "left")
        .join(card, "uri", "left")
        .select(
            "uri",
            F.coalesce(
                "label", F.regexp_extract(F.col("uri"), r"([^/#:]*)$", 1)
            ).alias("label"),
            "aliases",
            "domain",
            "range",
            F.when(F.col("range").isNull(), F.lit(None).cast("string"))
            .when(F.col("range").startswith(XSD), F.lit("false"))
            .otherwise(F.lit("true"))
            .alias("is_object_prop"),
            "max_cardinality",
        )
    )
