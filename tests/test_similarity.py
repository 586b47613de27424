import numpy as np
import pytest

from kgpipe_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
    random_hyperplane_buckets,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(42)
    vecs = rng.randn(100, 8).astype(float)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(100)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").cache(), vecs


def test_bruteforce_matches_numpy(spark, emb):
    df, vecs = emb
    q = spark.createDataFrame([(0, [float(x) for x in vecs[0]])], "q_id bigint, q_vec array<double>")
    got = cosine_topk_bruteforce(df, q, k=5).orderBy("rank").collect()
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    expected = list(np.argsort(-sims)[:5])
    assert [r["vec_id"] for r in got] == expected
    assert got[0]["vec_id"] == 0 and abs(got[0]["cosine"] - 1.0) < 1e-6


def test_ivf_recall(spark, emb):
    df, vecs = emb
    q = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(5)], "q_id bigint, q_vec array<double>"
    )
    exact = cosine_topk_bruteforce(df, q, k=5)
    approx = ivf_topk(df, q, k=5, n_centroids=8, nprobe=4)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6  # approximate, but must be useful
    # self-hit always found (query vector is in its own probe cell)
    assert all((i, i) in a for i in range(5))


def test_hyperplane_buckets_deterministic(spark, emb):
    df, _ = emb
    b1 = {r["vec_id"]: r["bucket"] for r in random_hyperplane_buckets(df, n_planes=6).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in random_hyperplane_buckets(df, n_planes=6).collect()}
    assert b1 == b2
    assert len(set(b1.values())) > 1
