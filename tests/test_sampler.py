import json

from kgpipe_spark.operators.sampler import greedy_set_cover_sample


def test_greedy_set_cover(spark):
    docs = [
        ("r", "a.json", "c" * 40, "json", json.dumps({"a": 1, "b": {"c": 2}})),
        ("r", "b.json", "c" * 40, "json", json.dumps({"a": 1})),          # subset of a.json
        ("r", "c.json", "c" * 40, "json", json.dumps({"d": [{"e": 1}]})),  # new paths
        ("r", "d.txt", "c" * 40, "text", "not json"),
    ]
    corpus = spark.createDataFrame(
        docs, "repo string, path string, commit string, lang string, content string"
    )
    picked = greedy_set_cover_sample(corpus)
    names = {p["path"] for p in picked}
    # two docs cover everything; the subset doc is never needed
    assert names == {"a.json", "c.json"}
    all_paths = set().union(*(set(p["paths"]) for p in picked))
    assert "$.b.c" in all_paths and "$.d[*].e" in all_paths
