from pyspark.sql import functions as F

from kgpipe_spark.operators.transform import (
    ntriples_lines,
    parse_ntriples,
    pivot_triples_to_wide,
    remove_empty_literals,
    type_inference_simple,
)
from kgpipe_spark.schemas import RDF_TYPE, SKOS_ALT_LABEL, XSD_INTEGER

TRIPLE_DDL = "subject string, predicate string, object_lex string, object_kind string, object_datatype string"


def t(spark, rows):
    return spark.createDataFrame(rows, TRIPLE_DDL)


def test_pivot_wide(spark):
    triples = t(
        spark,
        [
            ("s1", "p", "b", "literal", None),
            ("s1", "p", "a", "literal", None),
            ("s1", "q", "u1", "uri", None),
            ("s2", "p", "c", "literal", None),
        ],
    )
    wide = pivot_triples_to_wide(triples, predicates=["p_literal", "q_uri"])
    rows = {r["subject"]: (r["p_literal"], r["q_uri"]) for r in wide.collect()}
    assert rows["s1"] == ("a; b", "u1")  # multi-values sorted, "; "-joined
    assert rows["s2"][0] == "c"


def test_type_inference(spark):
    onto = spark.createDataFrame(
        [("p", "p", None, "C_dom", "C_rng", "true", None)],
        "uri string, label string, aliases array<string>, domain string, range string, is_object_prop string, max_cardinality int",
    )
    triples = t(spark, [("s", "p", "o", "uri", None)])
    got = {(r["subject"], r["object_lex"]) for r in type_inference_simple(triples, onto).collect()}
    assert got == {("s", "C_dom"), ("o", "C_rng")}


def test_ntriples_roundtrip(spark):
    triples = t(
        spark,
        [
            ("http://e/s", "http://p/p", "http://e/o", "uri", None),
            ("http://e/s", "http://p/q", 'say "hi"\nplease', "literal", None),
            ("http://e/s", "http://p/r", "42", "literal", XSD_INTEGER),
            ("http://e/s", SKOS_ALT_LABEL, "alt", "literal", None),
        ],
    )
    lines = ntriples_lines(triples)
    back = parse_ntriples(lines, drop_alt_labels=True)
    rows = {(r["subject"], r["predicate"], r["object_lex"], r["object_kind"], r["object_datatype"]) for r in back.collect()}
    # altLabel dropped on load (kg.py:40-45); strings get explicit xsd:string
    assert len(rows) == 3
    assert ("http://e/s", "http://p/p", "http://e/o", "uri", None) in rows
    assert ("http://e/s", "http://p/q", 'say "hi"\nplease', "literal", "http://www.w3.org/2001/XMLSchema#string") in rows
    assert ("http://e/s", "http://p/r", "42", "literal", XSD_INTEGER) in rows


def test_remove_empty_literals(spark):
    triples = t(spark, [("s", "p", "  ", "literal", None), ("s", "p", "x", "literal", None)])
    assert remove_empty_literals(triples).count() == 1


def test_extract_ontology_from_rdf(spark):
    from kgpipe_spark.operators.transform import extract_ontology_from_rdf

    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    OWL = "http://www.w3.org/2002/07/owl#"
    rows = [
        ("p:director", RDFS + "domain", "o:Film", "uri", None),
        ("p:director", RDFS + "range", "o:Person", "uri", None),
        ("p:director", "http://www.w3.org/2000/01/rdf-schema#label", "director", "literal", None),
        ("p:director", OWL + "maxCardinality", "1", "literal", None),
        ("p:year", RDFS + "range", "http://www.w3.org/2001/XMLSchema#gYear", "uri", None),
    ]
    df = spark.createDataFrame(
        rows,
        "subject string, predicate string, object_lex string, object_kind string,"
        " object_datatype string",
    )
    out = {r["uri"]: r for r in extract_ontology_from_rdf(df).collect()}
    d = out["p:director"]
    assert (d["label"], d["domain"], d["range"], d["is_object_prop"], d["max_cardinality"]) == (
        "director", "o:Film", "o:Person", "true", 1)
    y = out["p:year"]
    assert (y["label"], y["is_object_prop"]) == ("year", "false")


def test_remove_inconsistent_triples(spark):
    from kgpipe_spark.operators.transform import remove_inconsistent_triples

    O = "http://kg.org/onto/"
    P = "http://kg.org/prop/"
    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    XS = "http://www.w3.org/2001/XMLSchema#string"
    XD = "http://www.w3.org/2001/XMLSchema#decimal"
    triples = spark.createDataFrame(
        [
            # e1 typed Customer: consistent everywhere
            ("e1", RT, O + "Customer", "uri", None),
            ("e1", P + "nation", "n1", "uri", None),
            ("e1", P + "acctbal", "10.00", "literal", XD),
            # e2 typed Supplier: domain violation on its nation/acctbal rows
            ("e2", RT, O + "Supplier", "uri", None),
            ("e2", P + "nation", "n1", "uri", None),
            ("e2", P + "acctbal", "11.00", "literal", XD),
            # e1 bad-datatype acctbal row: dropped, good row kept
            ("e1", P + "acctbal", "12.00", "literal", XS),
            # object-prop with literal: dropped
            ("e1", P + "nation", "FRANCE", "literal", XS),
            # n1 typed Nation: object of e1.nation is consistent
            ("n1", RT, O + "Nation", "uri", None),
        ],
        "subject string, predicate string, object_lex string, object_kind string, object_datatype string",
    )
    onto = spark.createDataFrame(
        [
            (P + "nation", "nation", None, O + "Customer", O + "Nation", "true", 1),
            (P + "acctbal", "acctbal", None, O + "Customer", XD, "false", 1),
        ],
        "uri string, label string, aliases array<string>, domain string, range string,"
        " is_object_prop string, max_cardinality int",
    )
    kept = {tuple(r) for r in remove_inconsistent_triples(triples, onto).collect()}
    assert ("e1", P + "nation", "n1", "uri", None) in kept
    assert ("e1", P + "acctbal", "10.00", "literal", XD) in kept
    # type rows themselves survive (rdf:type has no ontology entry)
    assert ("e2", RT, O + "Supplier", "uri", None) in kept
    # violations removed
    assert ("e2", P + "nation", "n1", "uri", None) not in kept
    assert ("e2", P + "acctbal", "11.00", "literal", XD) not in kept
    assert ("e1", P + "acctbal", "12.00", "literal", XS) not in kept
    assert ("e1", P + "nation", "FRANCE", "literal", XS) not in kept
