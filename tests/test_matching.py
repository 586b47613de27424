from pyspark.sql import functions as F

from kgpipe_spark.operators.matching import (
    blocked_entity_matching,
    map_matched_relations,
    schema_column_matching,
    token_blocking_matches,
)
from kgpipe_spark.schemas import RDFS_LABEL

TRIPLE_DDL = "subject string, predicate string, object_lex string, object_kind string, object_datatype string"


def _kg(spark, ns, labels, edges=()):
    rows = [(f"{ns}{i}", RDFS_LABEL, lbl, "literal", None) for i, lbl in enumerate(labels)]
    rows += [(f"{ns}{a}", "http://p/rel", f"{ns}{b}", "uri", None) for a, b in edges]
    return spark.createDataFrame(rows, TRIPLE_DDL)


def test_token_blocking_matches(spark):
    kg1 = _kg(spark, "http://a/", ["The Matrix Movie", "Blade Runner", "Unique Alpha"])
    kg2 = _kg(spark, "http://b/", ["Matrix Movie", "Blade Runner Final", "Other Beta"])
    m = token_blocking_matches(kg1, kg2, threshold=0.3)
    got = {(r["id_1"], r["id_2"]): r["score"] for r in m.collect()}
    assert ("http://a/0", "http://b/0") in got  # matrix movie overlap
    assert ("http://a/1", "http://b/1") in got  # blade runner overlap
    assert not any(k == ("http://a/2", "http://b/2") for k in got)


def test_blocked_entity_matching_neighbor_boost(spark):
    # partially-overlapping labels (base Jaccard 2/3 < 1.0, leaving headroom
    # for the neighbor boost); rows 0 additionally share a URI neighbor
    kg1 = _kg(spark, "http://a/", ["Matrix Film Extended", "Matrix Film Extended"])
    kg2 = _kg(spark, "http://b/", ["Matrix Film", "Matrix Film"])
    shared = spark.createDataFrame(
        [("http://a/0", "http://p/rel", "http://shared/x", "uri", None)], TRIPLE_DDL
    )
    shared2 = spark.createDataFrame(
        [("http://b/0", "http://p/rel", "http://shared/x", "uri", None)], TRIPLE_DDL
    )
    m = blocked_entity_matching(kg1.unionByName(shared), kg2.unionByName(shared2), threshold=0.5)
    got = {(r["id_1"], r["id_2"]): r["score"] for r in m.collect()}
    assert got[("http://a/0", "http://b/0")] > got[("http://a/1", "http://b/1")]
    assert abs(got[("http://a/1", "http://b/1")] - 2 / 3) < 1e-6
    assert abs(got[("http://a/0", "http://b/0")] - (2 / 3 + 0.1)) < 1e-6


def test_schema_column_matching(spark):
    df1 = spark.createDataFrame([("Alice", 30), ("Bob", 31)], ["person_name", "age_years"])
    df2 = spark.createDataFrame([("Alice", "x"), ("Carol", "y")], ["personName", "note"])
    m = schema_column_matching(df1, df2, threshold=0.3)
    got = {(r["id_1"], r["id_2"]) for r in m.collect()}
    assert ("person_name", "personName") in got
    assert all(r[1] != "note" or r[0] == "note" for r in got)


def test_map_matched_relations(spark):
    triples = spark.createDataFrame(
        [("s", "http://old/p", "o", "literal", None), ("s", "http://keep/q", "o", "literal", None)],
        TRIPLE_DDL,
    )
    rm = spark.createDataFrame(
        [("http://old/p", "http://new/p", 0.9, "relation"), ("http://keep/q", "http://no/q", 0.2, "relation")],
        "id_1 string, id_2 string, score double, id_type string",
    )
    out = {r["predicate"] for r in map_matched_relations(triples, rm).collect()}
    assert out == {"http://new/p", "http://keep/q"}
