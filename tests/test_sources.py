import json
import os

from kgpipe_spark.sources.readers import (
    read_er_json,
    read_paris_dir,
    read_te_json,
    write_er_json,
)


def test_read_paris_dir(spark, tmp_path):
    # iteration 0 has data, iteration 1 eqv is non-empty (should win), 2 empty
    (tmp_path / "0_eqv.tsv").write_text("dbr:A\thttp://x/a\t0.5\n")
    (tmp_path / "1_eqv.tsv").write_text("dbr:B\thttp://x/b\t0.9\ndbr:C\thttp://x/c\t0.8\n")
    (tmp_path / "2_eqv.tsv").write_text("")
    (tmp_path / "1_superrelations1.tsv").write_text("dbo:p\thttp://x/q\t0.7\n")
    m = read_paris_dir(spark, str(tmp_path))
    rows = {(r["id_1"], r["id_2"], r["score"], r["id_type"]) for r in m.collect()}
    assert ("http://dbpedia.org/resource/B", "http://x/b", 0.9, "entity") in rows
    assert ("http://dbpedia.org/resource/C", "http://x/c", 0.8, "entity") in rows
    assert ("http://dbpedia.org/ontology/p", "http://x/q", 0.7, "relation") in rows
    # last non-empty iteration wins: the 0_eqv row must NOT be present
    assert not any(r[0].endswith("/A") for r in rows)


def test_er_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "er.json")
    with open(p, "w") as f:
        json.dump(
            {
                "matches": [
                    {"id_1": "a", "id_2": "b", "score": 0.9, "id_type": "entity"},
                    {"id_1": "p", "id_2": "q", "score": 0.4, "id_type": "relation"},
                ],
                "blocks": [],
                "clusters": [],
            },
            f,
        )
    m = read_er_json(spark, p)
    assert m.count() == 2
    p2 = str(tmp_path / "er2.json")
    write_er_json(m, p2)
    m2 = read_er_json(spark, p2)
    assert {tuple(r) for r in m.collect()} == {tuple(r) for r in m2.collect()}


def test_read_te_json(spark, tmp_path):
    doc = {
        "doc_id": "d1",
        "text": "t",
        "triples": [
            {
                "subject": {"start": 0, "end": 1, "surface_form": "s", "text": "s", "mapping": None},
                "predicate": {"start": 0, "end": 1, "surface_form": "p", "text": "p", "mapping": None},
                "object": {"start": 0, "end": 1, "surface_form": "o", "text": "o", "mapping": None},
            }
        ],
        "chains": [],
        "links": [{"span": "s", "mapping": "http://x", "link_type": "entity", "score": 0.9}],
    }
    p = str(tmp_path / "te.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    d = read_te_json(spark, p)
    r = d.collect()[0]
    assert r["doc_id"] == "d1"
    assert r["triples"][0]["subject"]["surface_form"] == "s"
    assert r["links"][0]["score"] == 0.9


def test_csv_table_roundtrip(spark, tmp_path):
    """CSV scan/sink contract (the round-2 untested §2.1 row): write →
    read roundtrips values, header, and option overrides."""
    from kgpipe_spark.sources.readers import read_csv_table, write_csv_table

    df = spark.createDataFrame(
        [("a", 1, 1.5, None), ("b; c", 2, -0.25, "x,y")],
        "s string, i int, d double, opt string",
    )
    p = str(tmp_path / "tbl")
    write_csv_table(df, p)
    back = read_csv_table(spark, p)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    # option override: no inference -> everything string
    raw = read_csv_table(spark, p, inferSchema=False)
    assert all(f.dataType.simpleString() == "string" for f in raw.schema.fields)


def test_write_te_json_roundtrip(spark, tmp_path):
    """TE JSON sink (round-2 verdict missing #3): one <doc_id>.json per doc,
    readable back by read_te_json with identical structs."""
    from kgpipe_spark.sources.readers import read_te_json, write_te_json

    doc = {
        "doc_id": "d1",
        "text": "t",
        "triples": [
            {
                "subject": {"start": 0, "end": 1, "surface_form": "s", "text": "s", "mapping": None},
                "predicate": {"start": 0, "end": 1, "surface_form": "p", "text": "p", "mapping": None},
                "object": {"start": 0, "end": 1, "surface_form": "o", "text": "o", "mapping": "http://x"},
            }
        ],
        "chains": [{"main": "s", "aliases": [
            {"start": 2, "end": 3, "surface_form": "it", "text": "it", "mapping": None}
        ]}],
        "links": [{"span": "s", "mapping": "http://x", "link_type": "entity", "score": 0.9}],
    }
    doc2 = {"doc_id": "d2", "text": "", "triples": [], "chains": [], "links": []}
    src = str(tmp_path / "src")
    os.makedirs(src)
    for d in (doc, doc2):
        with open(os.path.join(src, d["doc_id"] + ".json"), "w") as f:
            json.dump(d, f)
    te = read_te_json(spark, src)

    out = str(tmp_path / "sink")
    write_te_json(te, out)
    assert sorted(os.listdir(out)) == ["d1.json", "d2.json"]
    back = read_te_json(spark, out)
    assert {tuple(map(str, r)) for r in back.collect()} == {
        tuple(map(str, r)) for r in te.collect()
    }
