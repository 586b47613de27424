"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline
(extract → link → canonicalize → fuse → type-complete, SURVEY.md §3.4
`json_b` shape) over a corpus derived from the sf0.001 parquet tables.

``queries()`` exposes every implemented operator from SURVEY.md §2 over the
driver's parquet tables; ``oracle_sql()`` holds the DuckDB-equivalent SQL.
Shared derived inputs (the KG "triples" table, the ER "matches" table) are
deterministic functions of customer/nation/region so both engines compute
them independently and must agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe_spark.schemas import (
    KG_NS,
    RDF_TYPE,
    RDFS_LABEL,
    SKOS_ALT_LABEL,
    XSD_DECIMAL,
    XSD_STRING,
)

# ---------------------------------------------------------------------------
# helpers: derived deterministic inputs (Spark side)
# ---------------------------------------------------------------------------

CUST = KG_NS + "cust/"
NAT = KG_NS + "nation/"
REG = KG_NS + "region/"
P = KG_NS + "prop/"
O = KG_NS + "onto/"


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _base_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer/nation/region → triples (the relational 'extraction')."""
    from kgpipe_spark.operators.extract import unpivot_to_triples

    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region")

    cust_t = unpivot_to_triples(
        cust,
        subject_expr=F.concat(F.lit(CUST), F.col("c_custkey").cast("string")),
        type_uri=O + "Customer",
        label_col="c_name",
        literal_cols={
            "c_mktsegment": P + "mktsegment",
        },
        uri_cols={P + "nation": F.concat(F.lit(NAT), F.col("c_nationkey").cast("string"))},
    )
    acct = cust.select(
        F.concat(F.lit(CUST), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit(P + "acctbal").alias("predicate"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("object_lex"),
        F.lit("literal").alias("object_kind"),
        F.lit(XSD_DECIMAL).alias("object_datatype"),
    )
    alt = cust.filter(F.col("c_custkey") % 5 == 0).select(
        F.concat(F.lit(CUST), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit(SKOS_ALT_LABEL).alias("predicate"),
        F.upper(F.col("c_name")).alias("object_lex"),
        F.lit("literal").alias("object_kind"),
        F.lit(XSD_STRING).alias("object_datatype"),
    )
    nat_t = unpivot_to_triples(
        nation,
        subject_expr=F.concat(F.lit(NAT), F.col("n_nationkey").cast("string")),
        type_uri=O + "Nation",
        label_col="n_name",
        literal_cols={},
        uri_cols={P + "region": F.concat(F.lit(REG), F.col("n_regionkey").cast("string"))},
    )
    reg_t = unpivot_to_triples(
        region,
        subject_expr=F.concat(F.lit(REG), F.col("r_regionkey").cast("string")),
        type_uri=O + "Region",
        label_col="r_name",
        literal_cols={},
    )
    return cust_t.unionByName(acct).unionByName(alt).unionByName(nat_t).unionByName(reg_t)


def _matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ER match table from customer keys (FIXTURES.md §4):
    transitive chains, below-threshold pairs, relation matches, suffixed ids.
    """
    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    k = F.col("c_custkey").cast("string")
    k1 = (F.col("c_custkey") + 1).cast("string")
    k2 = (F.col("c_custkey") + 2).cast("string")
    k3 = (F.col("c_custkey") + 3).cast("string")
    m1 = cust.filter(F.col("c_custkey") % 10 == 0).select(
        F.concat(F.lit(CUST), k).alias("id_1"),
        F.concat(F.lit(CUST), k1).alias("id_2"),
        F.lit(0.9).alias("score"),
        F.lit("entity").alias("id_type"),
    )
    m2 = cust.filter(F.col("c_custkey") % 20 == 0).select(
        F.concat(F.lit(CUST), k1).alias("id_1"),
        F.concat(F.lit(CUST), k2).alias("id_2"),
        F.lit(0.8).alias("score"),
        F.lit("entity").alias("id_type"),
    )
    m3 = cust.filter(F.col("c_custkey") % 10 == 5).select(
        F.concat(F.lit(CUST), k).alias("id_1"),
        F.concat(F.lit(CUST), k3).alias("id_2"),
        F.lit(0.4).alias("score"),
        F.lit("entity").alias("id_type"),
    )
    m4 = cust.filter(F.col("c_custkey") % 50 == 0).select(
        F.concat(F.lit(CUST), k, F.lit("_uri")).alias("id_1"),
        F.concat(F.lit(CUST), k3, F.lit("_literal")).alias("id_2"),
        F.lit(0.7).alias("score"),
        F.lit("entity").alias("id_type"),
    )
    rel = spark.createDataFrame(
        [(P + "mktsegment", P + "segment", 0.9, "relation")],
        "id_1 string, id_2 string, score double, id_type string",
    )
    return m1.unionByName(m2).unionByName(m3).unionByName(m4).unionByName(rel)


def _ontology(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            (P + "nation", "nation", None, O + "Customer", O + "Nation", "true", 1),
            (P + "region", "region", None, O + "Nation", O + "Region", "true", 1),
            (P + "acctbal", "acctbal", None, O + "Customer", XSD_DECIMAL, "false", 1),
            (P + "mktsegment", "mktsegment", None, O + "Customer", XSD_STRING, "false", 1),
        ],
        "uri string, label string, aliases array<string>, domain string, range string, is_object_prop string, max_cardinality int",
    )


# ---------------------------------------------------------------------------
# shared SQL CTEs (DuckDB side) — MUST mirror the Spark derivations above
# ---------------------------------------------------------------------------

_RT = RDF_TYPE
_RL = RDFS_LABEL
_SA = SKOS_ALT_LABEL
_XS = XSD_STRING
_XD = XSD_DECIMAL

SQL_TRIPLES = f"""
triples AS (
  SELECT 'http://kg.org/cust/' || c_custkey AS subject, '{_RT}' AS predicate,
         'http://kg.org/onto/Customer' AS object_lex, 'uri' AS object_kind,
         CAST(NULL AS VARCHAR) AS object_datatype FROM customer
  UNION ALL
  SELECT 'http://kg.org/cust/' || c_custkey, '{_RL}', c_name, 'literal', '{_XS}' FROM customer
  UNION ALL
  SELECT 'http://kg.org/cust/' || c_custkey, 'http://kg.org/prop/mktsegment', c_mktsegment,
         'literal', '{_XS}' FROM customer
  UNION ALL
  SELECT 'http://kg.org/cust/' || c_custkey, 'http://kg.org/prop/nation',
         'http://kg.org/nation/' || c_nationkey, 'uri', NULL FROM customer
  UNION ALL
  SELECT 'http://kg.org/cust/' || c_custkey, 'http://kg.org/prop/acctbal',
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), 'literal', '{_XD}' FROM customer
  UNION ALL
  SELECT 'http://kg.org/cust/' || c_custkey, '{_SA}', upper(c_name), 'literal', '{_XS}'
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT 'http://kg.org/nation/' || n_nationkey, '{_RT}', 'http://kg.org/onto/Nation', 'uri', NULL FROM nation
  UNION ALL
  SELECT 'http://kg.org/nation/' || n_nationkey, '{_RL}', n_name, 'literal', '{_XS}' FROM nation
  UNION ALL
  SELECT 'http://kg.org/nation/' || n_nationkey, 'http://kg.org/prop/region',
         'http://kg.org/region/' || n_regionkey, 'uri', NULL FROM nation
  UNION ALL
  SELECT 'http://kg.org/region/' || r_regionkey, '{_RT}', 'http://kg.org/onto/Region', 'uri', NULL FROM region
  UNION ALL
  SELECT 'http://kg.org/region/' || r_regionkey, '{_RL}', r_name, 'literal', '{_XS}' FROM region
)"""

SQL_MATCHES = """
matches AS (
  SELECT 'http://kg.org/cust/' || c_custkey AS id_1,
         'http://kg.org/cust/' || (c_custkey + 1) AS id_2,
         0.9 AS score, 'entity' AS id_type FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 'http://kg.org/cust/' || (c_custkey + 1), 'http://kg.org/cust/' || (c_custkey + 2),
         0.8, 'entity' FROM customer WHERE c_custkey % 20 = 0
  UNION ALL
  SELECT 'http://kg.org/cust/' || c_custkey, 'http://kg.org/cust/' || (c_custkey + 3),
         0.4, 'entity' FROM customer WHERE c_custkey % 10 = 5
  UNION ALL
  SELECT 'http://kg.org/cust/' || c_custkey || '_uri',
         'http://kg.org/cust/' || (c_custkey + 3) || '_literal',
         0.7, 'entity' FROM customer WHERE c_custkey % 50 = 0
  UNION ALL
  SELECT 'http://kg.org/prop/mktsegment', 'http://kg.org/prop/segment', 0.9, 'relation'
)"""

SQL_EDGES_ONLY = """
edges AS (
  SELECT DISTINCT regexp_replace(id_1, '(_uri|_literal)$', '') AS src,
                  regexp_replace(id_2, '(_uri|_literal)$', '') AS dst
  FROM matches
  WHERE score > 0.5 AND id_type = 'entity'
    AND NOT regexp_replace(id_1, '(_uri|_literal)$', '') LIKE '%-'
    AND NOT regexp_replace(id_2, '(_uri|_literal)$', '') LIKE '%-'
    AND regexp_replace(id_1, '(_uri|_literal)$', '') <> regexp_replace(id_2, '(_uri|_literal)$', '')
)"""

# requires a WITH RECURSIVE prefix on the enclosing query
SQL_EDGES = (
    SQL_EDGES_ONLY
    + """,
sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
reach(a, b) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.a, e.dst FROM reach r JOIN sym e ON e.src = r.b
),
components AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
)"""
)


# ---------------------------------------------------------------------------
# entry — flagship pipeline on sf0.001
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: JSON corpus derived from sf0.001 customers → extract → link
    (nation labels vs seed KG) → canonicalize → fuse → type-complete."""
    sf_dir = "/root/testdata/sf0.001"
    return _flagship(spark, sf_dir)


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kgpipe_spark.pipelines import run_flagship

    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region")

    # corpus: one JSON blob per customer (input_hint shape)
    corpus = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        F.lit("org/tpch").alias("repo"),
        F.concat(F.lit("cust/"), F.col("c_custkey").cast("string"), F.lit(".json")).alias("path"),
        F.sha2(F.concat(F.lit("c"), F.col("c_custkey").cast("string")), 256).substr(1, 40).alias("commit"),
        F.lit("json").alias("lang"),
        F.to_json(
            F.struct(
                F.col("c_name").alias("name"),
                F.struct(F.col("n_name").alias("name")).alias("nation"),
                F.col("c_mktsegment").alias("segment"),
                F.col("c_acctbal").alias("balance"),
            )
        ).alias("content"),
    )
    # seed KG: nation + region entities
    from kgpipe_spark.operators.extract import unpivot_to_triples

    seed = unpivot_to_triples(
        nation,
        subject_expr=F.concat(F.lit(NAT), F.col("n_nationkey").cast("string")),
        type_uri=O + "Nation",
        label_col="n_name",
        literal_cols={},
        uri_cols={P + "region": F.concat(F.lit(REG), F.col("n_regionkey").cast("string"))},
    ).unionByName(
        unpivot_to_triples(
            region,
            subject_expr=F.concat(F.lit(REG), F.col("r_regionkey").cast("string")),
            type_uri=O + "Region",
            label_col="r_name",
            literal_cols={},
        )
    )
    return run_flagship(spark, corpus, seed)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgpipe_spark.eval.alignment import fact_alignment, subtract_kg
    from kgpipe_spark.eval.er_eval import duplicate_entities, evaluate_matching
    from kgpipe_spark.eval.semantic import cardinality_violations
    from kgpipe_spark.eval.statistics import class_histogram, count_measures, predicate_histogram
    from kgpipe_spark.operators.cluster import (
        best_match_1to1,
        canonical_map,
        connected_components,
        match_edges,
    )
    from kgpipe_spark.operators.fusion import (
        aggregate_matches,
        allowed_predicate_filter,
        canonicalize_triples,
        fuse_first_value,
        fuse_majority,
        sameas_provenance,
        type_namespace_filter,
    )
    from kgpipe_spark.operators.transform import (
        ntriples_lines,
        pivot_triples_to_wide,
        type_inference_simple,
    )

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- extraction / scans -------------------------------------------------
    q["kg_extract_triples"] = lambda s, d: _base_triples(s, d)

    q["kg_load_drop_altlabel"] = lambda s, d: _base_triples(s, d).filter(
        F.col("predicate") != SKOS_ALT_LABEL
    )

    def _allowed(s, d):
        allowed = s.createDataFrame(
            [(RDF_TYPE,), (RDFS_LABEL,), (P + "nation",)], ["predicate"]
        )
        return allowed_predicate_filter(_base_triples(s, d), allowed)

    q["kg_allowed_predicates"] = _allowed

    q["kg_type_namespace_filter"] = lambda s, d: type_namespace_filter(
        _base_triples(s, d).withColumn(
            "object_lex",
            F.when(
                (F.col("predicate") == RDF_TYPE) & (F.col("subject").startswith(REG)),
                F.concat(F.lit("http://other.org/"), F.col("object_lex")),
            ).otherwise(F.col("object_lex")),
        ),
        O,
    )

    def _seed_subtract(s, d):
        base = _base_triples(s, d)
        seed = base.filter(F.col("subject").startswith(NAT) | F.col("subject").startswith(REG))
        return subtract_kg(base, seed)

    q["kg_seed_subtract"] = _seed_subtract

    # --- statistics ----------------------------------------------------------
    q["kg_statistics"] = lambda s, d: count_measures(_base_triples(s, d))
    q["kg_predicate_histogram"] = lambda s, d: predicate_histogram(_base_triples(s, d))
    q["kg_class_histogram"] = lambda s, d: class_histogram(_base_triples(s, d))

    # --- matching / clustering / canonicalization ----------------------------
    q["kg_match_edges"] = lambda s, d: match_edges(_matches(s, d)).select(
        F.col("src"), F.col("dst")
    )

    q["kg_connected_components"] = lambda s, d: connected_components(
        match_edges(_matches(s, d))
    )

    q["kg_canonical_map"] = lambda s, d: canonical_map(
        connected_components(match_edges(_matches(s, d)))
    )

    q["kg_sameas_provenance"] = lambda s, d: sameas_provenance(
        canonical_map(connected_components(match_edges(_matches(s, d))))
    )

    def _canonicalized(s, d):
        canon = canonical_map(connected_components(match_edges(_matches(s, d))))
        return canonicalize_triples(
            _base_triples(s, d).filter(F.col("predicate") != SKOS_ALT_LABEL), canon
        ).dropDuplicates(["subject", "predicate", "object_lex", "object_kind"])

    q["kg_canonicalize_triples"] = _canonicalized

    q["kg_best_match_1to1"] = lambda s, d: best_match_1to1(
        _matches(s, d).filter(F.col("id_type") == "entity")
    )

    def _agg_matches(s, d):
        m = _matches(s, d)
        m1 = m.filter(F.col("id_type") == "entity")
        m2 = m.filter(F.col("id_type") == "relation").withColumn("id_type", F.lit("str"))
        return aggregate_matches(m1, m2)

    q["kg_aggregate_matches"] = _agg_matches

    # --- fusion ---------------------------------------------------------------
    def _first_value(s, d):
        base = _base_triples(s, d)
        labels = base.filter(F.col("predicate") == RDFS_LABEL)
        seed = labels.filter(
            (F.col("subject").startswith(CUST))
            & (F.regexp_extract("subject", r"(\d+)$", 1).cast("bigint") % 2 == 0)
        )
        src_a = labels.filter(F.col("subject").startswith(CUST)).withColumn(
            "object_lex", F.concat(F.lit("A:"), F.col("object_lex"))
        )
        src_b = labels.filter(F.col("subject").startswith(CUST)).withColumn(
            "object_lex", F.concat(F.lit("B:"), F.col("object_lex"))
        )
        seg = base.filter(F.col("predicate") == P + "mktsegment")
        source = src_a.unionByName(src_b).unionByName(seg)
        fusable = s.createDataFrame([(RDFS_LABEL,)], ["predicate"])
        return fuse_first_value(seed, source, fusable)

    q["kg_fuse_first_value"] = _first_value

    def _majority(s, d):
        orders = _read(s, d, "orders")
        src = orders.select(
            F.concat(F.lit(CUST), F.col("o_custkey").cast("string")).alias("subject"),
            F.lit(P + "priority").alias("predicate"),
            F.col("o_orderpriority").alias("object_lex"),
            F.lit("literal").alias("object_kind"),
            F.lit(XSD_STRING).alias("object_datatype"),
        )
        return fuse_majority(src)

    q["kg_fuse_majority"] = _majority

    # --- transform / enrichment ------------------------------------------------
    q["kg_type_inference"] = lambda s, d: type_inference_simple(
        _base_triples(s, d), _ontology(s)
    )

    def _pivot(s, d):
        base = _base_triples(s, d).filter(F.col("subject").startswith(CUST))
        wide = pivot_triples_to_wide(
            base,
            predicates=[
                RDFS_LABEL + "_literal",
                P + "mktsegment_literal",
                P + "acctbal_literal",
                P + "nation_uri",
            ],
        )
        return wide.select(
            "subject",
            F.col("`" + RDFS_LABEL + "_literal`").alias("label"),
            F.col("`" + P + "mktsegment_literal`").alias("mktsegment"),
            F.col("`" + P + "acctbal_literal`").alias("acctbal"),
            F.col("`" + P + "nation_uri`").alias("nation"),
        )

    q["kg_pivot_wide"] = _pivot

    def _ntriples(s, d):
        return ntriples_lines(
            _base_triples(s, d).filter(F.col("subject").startswith(NAT))
        )

    q["kg_ntriples_lines"] = _ntriples

    # --- evaluation --------------------------------------------------------------
    def _alignment(s, d):
        actual = _base_triples(s, d)
        phantom = _read(s, d, "customer").filter(F.col("c_custkey") % 7 == 0).select(
            F.concat(F.lit(CUST), F.col("c_custkey").cast("string")).alias("subject"),
            F.lit(P + "phantom").alias("predicate"),
            F.lit("missing").alias("object_lex"),
            F.lit("literal").alias("object_kind"),
            F.lit(XSD_STRING).alias("object_datatype"),
        )
        expected = actual.filter(F.col("predicate") != SKOS_ALT_LABEL).unionByName(phantom)
        return fact_alignment(actual, expected)

    q["kg_fact_alignment"] = _alignment

    def _card_viol(s, d):
        orders = _read(s, d, "orders")
        src = orders.select(
            F.concat(F.lit(CUST), F.col("o_custkey").cast("string")).alias("subject"),
            F.lit(P + "order").alias("predicate"),
            F.concat(F.lit(KG_NS + "order/"), F.col("o_orderkey").cast("string")).alias("object_lex"),
            F.lit("uri").alias("object_kind"),
            F.lit(None).cast("string").alias("object_datatype"),
        )
        onto = s.createDataFrame(
            [(P + "order", "order", None, None, None, "true", 1)],
            "uri string, label string, aliases array<string>, domain string, range string, is_object_prop string, max_cardinality int",
        )
        return cardinality_violations(src, onto)

    q["kg_cardinality_violations"] = _card_viol

    def _er_eval(s, d):
        cust = _read(s, d, "customer")
        gold = cust.select(
            F.expr("CAST(c_custkey DIV 2 AS STRING)").alias("cluster_id"),
            F.concat(F.lit(CUST), F.col("c_custkey").cast("string")).alias("entity_uri"),
        )
        pred = _matches(s, d).filter(F.col("id_type") == "entity")
        return evaluate_matching(pred, gold)

    q["kg_er_matching_eval"] = _er_eval

    def _dupes(s, d):
        cust = _read(s, d, "customer")
        al = cust.select(
            F.concat(F.lit(CUST), F.col("c_custkey").cast("string")).alias("actual_uri"),
            F.concat(F.lit(KG_NS + "ref/"), (F.col("c_custkey") % 700).cast("string")).alias(
                "reference_uri"
            ),
        )
        return duplicate_entities(al)

    q["kg_duplicate_entities"] = _dupes

    # flagship end-to-end (no SQL oracle — iterative/UDF pipeline)
    q["kg_flagship_pipeline"] = lambda s, d: _flagship(s, d)

    return q


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["kg_extract_triples"] = f"WITH {SQL_TRIPLES} SELECT * FROM triples"

    sql["kg_load_drop_altlabel"] = (
        f"WITH {SQL_TRIPLES} SELECT * FROM triples WHERE predicate <> '{_SA}'"
    )

    sql["kg_allowed_predicates"] = f"""
        WITH {SQL_TRIPLES}
        SELECT * FROM triples
        WHERE predicate IN ('{_RT}', '{_RL}', 'http://kg.org/prop/nation')
    """

    sql["kg_type_namespace_filter"] = f"""
        WITH {SQL_TRIPLES},
        mutated AS (
          SELECT subject, predicate,
                 CASE WHEN predicate = '{_RT}' AND subject LIKE 'http://kg.org/region/%'
                      THEN 'http://other.org/' || object_lex ELSE object_lex END AS object_lex,
                 object_kind, object_datatype
          FROM triples
        )
        SELECT * FROM mutated
        WHERE NOT (predicate = '{_RT}' AND object_lex NOT LIKE 'http://kg.org/onto/%')
    """

    sql["kg_seed_subtract"] = f"""
        WITH {SQL_TRIPLES},
        seed AS (
          SELECT DISTINCT subject, predicate, object_lex, object_kind FROM triples
          WHERE subject LIKE 'http://kg.org/nation/%' OR subject LIKE 'http://kg.org/region/%'
        )
        SELECT t.* FROM triples t
        ANTI JOIN seed s USING (subject, predicate, object_lex, object_kind)
    """

    sql["kg_statistics"] = f"""
        WITH {SQL_TRIPLES}
        SELECT count(*) AS n_triples,
               (SELECT count(DISTINCT e) FROM (
                  SELECT subject AS e FROM triples
                  UNION SELECT object_lex FROM triples WHERE object_kind = 'uri')) AS n_entities,
               count(DISTINCT predicate) AS n_relations,
               count(DISTINCT subject) AS n_subjects,
               count(DISTINCT CASE WHEN predicate = '{_RT}' THEN object_lex END) AS n_classes
        FROM triples
    """

    sql["kg_predicate_histogram"] = f"""
        WITH {SQL_TRIPLES}
        SELECT predicate, count(*) AS n FROM triples GROUP BY predicate
    """

    sql["kg_class_histogram"] = f"""
        WITH {SQL_TRIPLES}
        SELECT object_lex AS class_uri, count(*) AS n FROM triples
        WHERE predicate = '{_RT}' GROUP BY object_lex
    """

    sql["kg_match_edges"] = f"""
        WITH {SQL_MATCHES}, {SQL_EDGES_ONLY}
        SELECT src, dst FROM edges
    """

    sql["kg_connected_components"] = f"""
        WITH RECURSIVE {SQL_MATCHES}, {SQL_EDGES}
        SELECT node, component FROM components
    """

    sql["kg_canonical_map"] = f"""
        WITH RECURSIVE {SQL_MATCHES}, {SQL_EDGES}
        SELECT node AS entity, component AS canonical FROM components WHERE node <> component
    """

    sql["kg_sameas_provenance"] = f"""
        WITH RECURSIVE {SQL_MATCHES}, {SQL_EDGES}
        SELECT node AS subject, 'http://www.w3.org/2002/07/owl#sameAs' AS predicate,
               component AS object_lex, 'uri' AS object_kind, CAST(NULL AS VARCHAR) AS object_datatype
        FROM components WHERE node <> component
    """

    sql["kg_canonicalize_triples"] = f"""
        WITH RECURSIVE {SQL_MATCHES}, {SQL_EDGES}, {SQL_TRIPLES},
        canon AS (SELECT node AS entity, component AS canonical FROM components WHERE node <> component),
        filtered AS (SELECT * FROM triples WHERE predicate <> '{_SA}'),
        rewritten AS (
          SELECT coalesce(cs.canonical, t.subject) AS subject,
                 t.predicate,
                 CASE WHEN t.object_kind = 'uri' THEN coalesce(co.canonical, t.object_lex)
                      ELSE t.object_lex END AS object_lex,
                 t.object_kind, t.object_datatype
          FROM filtered t
          LEFT JOIN canon cs ON cs.entity = t.subject
          LEFT JOIN canon co ON co.entity = t.object_lex AND t.object_kind = 'uri'
        )
        SELECT subject, predicate, object_lex, object_kind,
               min(object_datatype) AS object_datatype
        FROM rewritten GROUP BY subject, predicate, object_lex, object_kind
    """

    # two unrolled rounds of locally-dominant-edge matching (greedy 1:1)
    sql["kg_best_match_1to1"] = f"""
        WITH {SQL_MATCHES},
        ent AS (
          SELECT *, sha256(id_1 || chr(1) || id_2) AS pk FROM matches WHERE id_type = 'entity'
        ),
        {_round_sql('ent', 'r1')},
        used1 AS (SELECT id_1 AS node FROM r1 UNION SELECT id_2 FROM r1),
        rem AS (
          SELECT e.* FROM ent e
          WHERE e.id_1 NOT IN (SELECT node FROM used1) AND e.id_2 NOT IN (SELECT node FROM used1)
        ),
        {_round_sql('rem', 'r2')}
        SELECT id_1, id_2, score, id_type FROM r1
        UNION ALL
        SELECT id_1, id_2, score, id_type FROM r2
    """

    sql["kg_aggregate_matches"] = f"""
        WITH {SQL_MATCHES},
        u AS (
          SELECT id_1, id_2, score, id_type FROM matches WHERE id_type = 'entity'
          UNION ALL
          SELECT id_1, id_2, score, 'str' FROM matches WHERE id_type = 'relation'
        ),
        rewritten AS (
          SELECT id_1, id_2, score,
                 regexp_replace(id_type, '^str$', 'relation') AS id_type
          FROM u
        )
        SELECT id_1, id_2, min(score) AS score, id_type
        FROM rewritten GROUP BY id_1, id_2, id_type
    """

    sql["kg_fuse_first_value"] = f"""
        WITH {SQL_TRIPLES},
        labels AS (
          SELECT * FROM triples WHERE predicate = '{_RL}' AND subject LIKE 'http://kg.org/cust/%'
        ),
        seed AS (
          SELECT * FROM labels
          WHERE CAST(regexp_extract(subject, '(\\d+)$', 1) AS BIGINT) % 2 = 0
        ),
        source AS (
          SELECT subject, predicate, 'A:' || object_lex AS object_lex, object_kind, object_datatype FROM labels
          UNION ALL
          SELECT subject, predicate, 'B:' || object_lex, object_kind, object_datatype FROM labels
          UNION ALL
          SELECT * FROM triples WHERE predicate = 'http://kg.org/prop/mktsegment'
        ),
        src_fusable AS (SELECT * FROM source WHERE predicate = '{_RL}'),
        src_rest AS (SELECT * FROM source WHERE predicate <> '{_RL}'),
        seed_sp AS (SELECT DISTINCT subject, predicate FROM seed),
        new_fusable AS (
          SELECT f.* FROM src_fusable f ANTI JOIN seed_sp sp USING (subject, predicate)
        ),
        first_vals AS (
          SELECT subject, predicate, object_lex, object_kind, object_datatype FROM (
            SELECT *, row_number() OVER (
              PARTITION BY subject, predicate
              ORDER BY sha256(coalesce(object_lex, chr(0)) || coalesce(object_kind, chr(0)) || coalesce(object_datatype, chr(0)))
            ) AS rn FROM new_fusable
          ) WHERE rn = 1
        ),
        new_rest AS (
          SELECT r.* FROM src_rest r
          ANTI JOIN (SELECT DISTINCT subject, predicate, object_lex, object_kind FROM seed) s
            USING (subject, predicate, object_lex, object_kind)
        ),
        unioned AS (
          SELECT * FROM seed UNION ALL SELECT * FROM first_vals UNION ALL SELECT * FROM new_rest
        )
        SELECT subject, predicate, object_lex, object_kind, min(object_datatype) AS object_datatype
        FROM unioned GROUP BY subject, predicate, object_lex, object_kind
    """

    sql["kg_fuse_majority"] = """
        WITH src AS (
          SELECT 'http://kg.org/cust/' || o_custkey AS subject,
                 'http://kg.org/prop/priority' AS predicate,
                 o_orderpriority AS object_lex,
                 'literal' AS object_kind,
                 'http://www.w3.org/2001/XMLSchema#string' AS object_datatype
          FROM orders
        ),
        grouped AS (
          SELECT subject, predicate, object_lex, object_kind, object_datatype,
                 count(*) AS n, avg(1.0) AS avg_score
          FROM src GROUP BY ALL
        )
        SELECT subject, predicate, object_lex, object_kind, object_datatype FROM (
          SELECT *, row_number() OVER (
            PARTITION BY subject, predicate
            ORDER BY n DESC, avg_score DESC,
                     sha256(coalesce(object_lex, chr(0)) || coalesce(object_kind, chr(0)))
          ) AS rn FROM grouped
        ) WHERE rn = 1
    """

    sql["kg_type_inference"] = f"""
        WITH {SQL_TRIPLES},
        onto AS (
          SELECT 'http://kg.org/prop/nation' AS uri, 'http://kg.org/onto/Customer' AS dom, 'http://kg.org/onto/Nation' AS rng
          UNION ALL SELECT 'http://kg.org/prop/region', 'http://kg.org/onto/Nation', 'http://kg.org/onto/Region'
          UNION ALL SELECT 'http://kg.org/prop/acctbal', 'http://kg.org/onto/Customer', 'http://www.w3.org/2001/XMLSchema#decimal'
          UNION ALL SELECT 'http://kg.org/prop/mktsegment', 'http://kg.org/onto/Customer', 'http://www.w3.org/2001/XMLSchema#string'
        ),
        joined AS (SELECT t.*, o.dom, o.rng FROM triples t JOIN onto o ON t.predicate = o.uri),
        inferred AS (
          SELECT subject, '{_RT}' AS predicate, dom AS object_lex, 'uri' AS object_kind,
                 CAST(NULL AS VARCHAR) AS object_datatype
          FROM joined WHERE dom IS NOT NULL
          UNION ALL
          SELECT object_lex, '{_RT}', rng, 'uri', NULL
          FROM joined WHERE rng IS NOT NULL AND object_kind = 'uri'
        )
        SELECT subject, predicate, object_lex, object_kind, min(object_datatype) AS object_datatype
        FROM inferred GROUP BY subject, predicate, object_lex, object_kind
    """

    sql["kg_pivot_wide"] = f"""
        WITH {SQL_TRIPLES}
        SELECT subject,
          string_agg(object_lex, '; ' ORDER BY object_lex) FILTER (WHERE predicate = '{_RL}' AND object_kind='literal') AS label,
          string_agg(object_lex, '; ' ORDER BY object_lex) FILTER (WHERE predicate = 'http://kg.org/prop/mktsegment' AND object_kind='literal') AS mktsegment,
          string_agg(object_lex, '; ' ORDER BY object_lex) FILTER (WHERE predicate = 'http://kg.org/prop/acctbal' AND object_kind='literal') AS acctbal,
          string_agg(object_lex, '; ' ORDER BY object_lex) FILTER (WHERE predicate = 'http://kg.org/prop/nation' AND object_kind='uri') AS nation
        FROM triples
        WHERE subject LIKE 'http://kg.org/cust/%'
        GROUP BY subject
    """

    sql["kg_ntriples_lines"] = f"""
        WITH {SQL_TRIPLES}
        SELECT '<' || subject || '> <' || predicate || '> ' ||
          CASE WHEN object_kind = 'uri' THEN '<' || object_lex || '>'
               WHEN object_datatype IS NULL OR object_datatype = '{_XS}'
                 THEN '"' || object_lex || '"'
               ELSE '"' || object_lex || '"^^<' || object_datatype || '>'
          END || ' .' AS line
        FROM triples
        WHERE subject LIKE 'http://kg.org/nation/%'
    """

    sql["kg_fact_alignment"] = f"""
        WITH {SQL_TRIPLES},
        actual AS (SELECT DISTINCT subject, predicate, object_lex, object_kind FROM triples),
        expected AS (
          SELECT DISTINCT subject, predicate, object_lex, object_kind FROM (
            SELECT subject, predicate, object_lex, object_kind FROM triples WHERE predicate <> '{_SA}'
            UNION ALL
            SELECT 'http://kg.org/cust/' || c_custkey, 'http://kg.org/prop/phantom', 'missing', 'literal'
            FROM customer WHERE c_custkey % 7 = 0
          )
        ),
        counts AS (
          SELECT
            (SELECT count(*) FROM actual a SEMI JOIN expected e USING (subject, predicate, object_lex, object_kind)) AS tp,
            (SELECT count(*) FROM actual a ANTI JOIN expected e USING (subject, predicate, object_lex, object_kind)) AS fp,
            (SELECT count(*) FROM expected e ANTI JOIN actual a USING (subject, predicate, object_lex, object_kind)) AS fn
        )
        SELECT tp, fp, fn,
               round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision,
               round(tp / CAST(tp + fn AS DOUBLE), 6) AS recall,
               round(2.0 * (tp / CAST(tp + fp AS DOUBLE)) * (tp / CAST(tp + fn AS DOUBLE))
                     / ((tp / CAST(tp + fp AS DOUBLE)) + (tp / CAST(tp + fn AS DOUBLE))), 6) AS f1
        FROM counts
    """

    sql["kg_cardinality_violations"] = """
        WITH src AS (
          SELECT 'http://kg.org/cust/' || o_custkey AS subject,
                 'http://kg.org/prop/order' AS predicate
          FROM orders
        )
        SELECT subject, predicate, count(*) AS n
        FROM src GROUP BY subject, predicate HAVING count(*) > 1
    """

    sql["kg_er_matching_eval"] = f"""
        WITH {SQL_MATCHES},
        g AS (
          SELECT CAST(c_custkey // 2 AS VARCHAR) AS cluster_id,
                 'http://kg.org/cust/' || c_custkey AS e
          FROM customer
        ),
        gold_pairs AS (
          SELECT DISTINCT a.e AS id_1, b.e AS id_2
          FROM g a JOIN g b ON a.cluster_id = b.cluster_id AND a.e < b.e
        ),
        pred_pairs AS (
          SELECT DISTINCT least(id_1, id_2) AS id_1, greatest(id_1, id_2) AS id_2
          FROM matches WHERE id_type = 'entity'
        ),
        counts AS (
          SELECT
            (SELECT count(*) FROM pred_pairs p SEMI JOIN gold_pairs gp USING (id_1, id_2)) AS tp,
            (SELECT count(*) FROM pred_pairs p ANTI JOIN gold_pairs gp USING (id_1, id_2)) AS fp,
            (SELECT count(*) FROM gold_pairs gp ANTI JOIN pred_pairs p USING (id_1, id_2)) AS fn
        )
        SELECT tp, fp, fn,
               round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision,
               round(tp / CAST(tp + fn AS DOUBLE), 6) AS recall,
               CASE WHEN tp = 0 THEN 0.0 ELSE
                 round(2.0 * (tp / CAST(tp + fp AS DOUBLE)) * (tp / CAST(tp + fn AS DOUBLE))
                     / ((tp / CAST(tp + fp AS DOUBLE)) + (tp / CAST(tp + fn AS DOUBLE))), 6) END AS f1
        FROM counts
    """

    sql["kg_duplicate_entities"] = """
        SELECT 'http://kg.org/ref/' || (c_custkey % 700) AS reference_uri,
               count(DISTINCT 'http://kg.org/cust/' || c_custkey) AS n_dupes
        FROM customer
        GROUP BY (c_custkey % 700)
        HAVING count(DISTINCT c_custkey) > 1
    """

    return sql


def _round_sql(src: str, out: str) -> str:
    """One round of locally-dominant-edge 1:1 matching over ``src``."""
    return f"""
        {out}_incid AS (
          SELECT id_1 AS node, pk, score FROM {src}
          UNION ALL
          SELECT id_2 AS node, pk, score FROM {src}
        ),
        {out}_best AS (
          SELECT pk FROM (
            SELECT pk, row_number() OVER (PARTITION BY node ORDER BY score DESC, pk ASC) AS rn
            FROM {out}_incid
          ) WHERE rn = 1
          GROUP BY pk HAVING count(*) = 2
        ),
        {out} AS (
          SELECT e.id_1, e.id_2, e.score, e.id_type FROM {src} e SEMI JOIN {out}_best b USING (pk)
        )"""
