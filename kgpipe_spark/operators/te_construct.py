"""TE-document finalizer: TE_Documents → RDF triples (SURVEY.md §2.3).

Reimplements ``construct_rdf_from_te_json``
(`/root/reference/src/kgpipe_tasks/construction/construct.py:39-178,300-330`):

 1. **coref chains** (construct.py:46-59): every alias surface in a chain is
    rewritten to the chain's main surface before linking.
 2. **links** (construct.py:61-105): entity links with score ≥ 0.5 and
    predicate links with score ≥ 0.3 map surfaces (matched lowercased) to
    KG URIs; thresholds are engine config (construct.py:31-32).
 3. **emission** (construct.py:116-177): subject/object surfaces become the
    linked URI or a minted ``newE/sha256(surface)`` URI (benchutils.py:10-14);
    predicates become the linked property URI or ``prop/<normalized>``;
    object literals are typed by the ontology range; ``rdf:type`` triples are
    added from the matched property's domain/range; an ``rdfs:label`` row is
    emitted for every minted entity.

Everything is explode + broadcast joins — per-document arrays become rows,
linking is corpus-wide relational, then triples are assembled back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgpipe_spark.functions.hashing import mint_uri_sha256
from kgpipe_spark.functions.strings import normalize_label
from kgpipe_spark.schemas import (
    KG_NS,
    RDF_TYPE,
    RDFS_LABEL,
    XSD_STRING,
)

ENTITY_LINK_THRESHOLD = 0.5  # construct.py:31
PREDICATE_LINK_THRESHOLD = 0.3  # construct.py:32


def aggregate_te_documents(*te_docs: DataFrame) -> DataFrame:
    """Merge TE_Documents per doc_id across extractor outputs — concat the
    triples/chains/links arrays (`aggregation.py:18-69`, aggregate*_te_json).
    """
    assert te_docs
    u = te_docs[0]
    for d in te_docs[1:]:
        u = u.unionByName(d)
    return u.groupBy("doc_id").agg(
        F.first("text", ignorenulls=True).alias("text"),
        F.flatten(F.collect_list("triples")).alias("triples"),
        F.flatten(F.collect_list("chains")).alias("chains"),
        F.flatten(F.collect_list("links")).alias("links"),
    )


def _chain_map(te_docs: DataFrame) -> DataFrame:
    """(doc_id, alias_surface, main_surface) from coref chains."""
    return (
        te_docs.select("doc_id", F.explode("chains").alias("c"))
        .select("doc_id", F.col("c.main").alias("main_surface"), F.explode("c.aliases").alias("a"))
        .select("doc_id", F.col("a.surface_form").alias("alias_surface"), "main_surface")
        .filter(F.col("alias_surface").isNotNull())
        .dropDuplicates(["doc_id", "alias_surface"])
    )


def _link_map(te_docs: DataFrame, link_type: str, threshold: float) -> DataFrame:
    """(doc_id, surface_lc, mapping) for accepted links of one type.

    The reference matches link spans by lowercased surface
    (construct.py:61-105 `lower()`); best link per surface wins
    (max score, deterministic tiebreak).
    """
    from pyspark.sql.window import Window

    links = (
        te_docs.select("doc_id", F.explode("links").alias("l"))
        .filter((F.col("l.link_type") == link_type) & (F.col("l.score") >= threshold))
        .select(
            "doc_id",
            F.lower(F.col("l.span")).alias("surface_lc"),
            F.col("l.mapping").alias("mapping"),
            F.col("l.score").alias("score"),
        )
    )
    w = Window.partitionBy("doc_id", "surface_lc").orderBy(F.desc("score"), F.asc("mapping"))
    return (
        links.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "surface_lc", "mapping")
    )


def te_documents_to_triples(
    te_docs: DataFrame,
    ontology: DataFrame,
    entity_threshold: float = ENTITY_LINK_THRESHOLD,
    predicate_threshold: float = PREDICATE_LINK_THRESHOLD,
    mappings_only: bool = False,
) -> DataFrame:
    """TE_Documents → triples. ``mappings_only=True`` mirrors
    ``construct_rdf_from_te_json_mappings_only`` (construct.py:300-330):
    only triples whose predicate linked to the ontology are emitted."""
    spark = te_docs.sparkSession

    rows = te_docs.select("doc_id", F.explode("triples").alias("t")).select(
        "doc_id",
        F.col("t.subject.surface_form").alias("subj_surface"),
        F.col("t.predicate.surface_form").alias("pred_surface"),
        F.col("t.object.surface_form").alias("obj_surface"),
    ).filter(F.col("subj_surface").isNotNull() & F.col("pred_surface").isNotNull())

    # 1. coref chains: alias → main
    chains = _chain_map(te_docs)
    for side in ("subj_surface", "obj_surface"):
        c = chains.select(
            "doc_id",
            F.col("alias_surface").alias(side),
            F.col("main_surface").alias(f"__main_{side}"),
        )
        rows = (
            rows.join(c, ["doc_id", side], "left")
            .withColumn(side, F.coalesce(F.col(f"__main_{side}"), F.col(side)))
            .drop(f"__main_{side}")
        )

    # 2. links
    ent_links = _link_map(te_docs, "entity", entity_threshold)
    pred_links = _link_map(te_docs, "predicate", predicate_threshold)

    for side, out in (("subj_surface", "subj_uri"), ("obj_surface", "obj_mapping")):
        el = ent_links.select(
            "doc_id", F.col("surface_lc"), F.col("mapping").alias(f"__m_{out}")
        )
        rows = (
            rows.withColumn("__lc", F.lower(F.col(side)))
            .join(
                el.withColumnRenamed("surface_lc", "__lc"),
                ["doc_id", "__lc"],
                "left",
            )
            .drop("__lc")
            .withColumnRenamed(f"__m_{out}", out)
        )
    rows = (
        rows.withColumn("__lc", F.lower(F.col("pred_surface")))
        .join(
            pred_links.select(
                "doc_id", F.col("surface_lc").alias("__lc"), F.col("mapping").alias("pred_uri")
            ),
            ["doc_id", "__lc"],
            "left",
        )
        .drop("__lc")
    )

    # 3. resolve URIs / minting
    subj_uri = F.coalesce(F.col("subj_uri"), mint_uri_sha256(normalize_label(F.col("subj_surface"))))
    pred_resolved = F.coalesce(
        F.col("pred_uri"),
        F.concat(
            F.lit(KG_NS + "prop/"),
            F.regexp_replace(normalize_label(F.col("pred_surface")), " ", "_"),
        ),
    )
    resolved = rows.select(
        "doc_id",
        subj_uri.alias("subject"),
        pred_resolved.alias("predicate"),
        F.col("pred_uri").isNotNull().alias("pred_linked"),
        F.col("subj_uri").isNotNull().alias("subj_linked"),
        F.col("subj_surface"),
        F.col("obj_surface"),
        F.col("obj_mapping"),
    )
    if mappings_only:
        resolved = resolved.filter(F.col("pred_linked"))

    onto = F.broadcast(
        ontology.select(
            F.col("uri").alias("predicate"), "domain", "range", "is_object_prop"
        )
    )
    resolved = resolved.join(onto, "predicate", "left")

    # object: linked URI, else object property → minted URI, else typed literal
    is_obj_prop = (F.col("is_object_prop") == "true") | F.col("obj_mapping").isNotNull()
    obj_uri = F.coalesce(F.col("obj_mapping"), mint_uri_sha256(normalize_label(F.col("obj_surface"))))
    literal_dt = F.coalesce(
        F.when(F.col("range").startswith("http://www.w3.org/2001/XMLSchema#"), F.col("range")),
        F.lit(XSD_STRING),
    )
    main = resolved.filter(F.col("obj_surface").isNotNull()).select(
        "subject",
        "predicate",
        F.when(is_obj_prop, obj_uri).otherwise(F.col("obj_surface")).alias("object_lex"),
        F.when(is_obj_prop, F.lit("uri")).otherwise(F.lit("literal")).alias("object_kind"),
        F.when(is_obj_prop, F.lit(None).cast("string")).otherwise(literal_dt).alias(
            "object_datatype"
        ),
    )

    # rdf:type from domain/range (construct.py:166-177)
    types_dom = (
        resolved.filter(F.col("domain").isNotNull())
        .select(
            "subject",
            F.lit(RDF_TYPE).alias("predicate"),
            F.col("domain").alias("object_lex"),
            F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
    )
    types_rng = (
        resolved.filter(
            F.col("range").isNotNull()
            & ~F.col("range").startswith("http://www.w3.org/2001/XMLSchema#")
            & F.col("obj_surface").isNotNull()
        )
        .select(
            obj_uri.alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.col("range").alias("object_lex"),
            F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
    )

    # rdfs:label for minted entities (construct.py label union)
    subj_labels = (
        resolved.filter(~F.col("subj_linked"))
        .select(
            F.col("subject"),
            F.lit(RDFS_LABEL).alias("predicate"),
            F.col("subj_surface").alias("object_lex"),
            F.lit("literal").alias("object_kind"),
            F.lit(XSD_STRING).alias("object_datatype"),
        )
    )
    obj_labels = (
        resolved.filter(
            is_obj_prop & F.col("obj_mapping").isNull() & F.col("obj_surface").isNotNull()
        )
        .select(
            obj_uri.alias("subject"),
            F.lit(RDFS_LABEL).alias("predicate"),
            F.col("obj_surface").alias("object_lex"),
            F.lit("literal").alias("object_kind"),
            F.lit(XSD_STRING).alias("object_datatype"),
        )
    )

    return (
        main.unionByName(types_dom)
        .unionByName(types_rng)
        .unionByName(subj_labels)
        .unionByName(obj_labels)
        .dropDuplicates(["subject", "predicate", "object_lex", "object_kind"])
    )
