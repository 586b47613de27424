from kgpipe_spark.operators.text import fingerprint, language_id, quality_features, token_count


def _docs(spark):
    rows = [
        (1, "The cat sat on the mat and it was happy for the day."),
        (2, "der hund ist nicht mit der katze und das ist gut"),
        (3, "!!! ??? ### $$$ %%%"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_token_count(spark):
    r = {x["doc_id"]: x for x in token_count(_docs(spark)).collect()}
    assert r[1]["n_ws_tokens"] == 13
    assert r[1]["n_subword_tokens"] >= r[1]["n_ws_tokens"]
    assert r[4]["n_ws_tokens"] == 0


def test_quality(spark):
    r = {x["doc_id"]: x for x in quality_features(_docs(spark)).collect()}
    assert r[1]["quality"] > r[3]["quality"]
    assert r[1]["stopword_ratio"] > 0
    assert r[3]["punct_ratio"] > 0.5
    assert r[4]["quality"] == 0.0


def test_language_id(spark):
    r = {x["doc_id"]: x["pred_lang"] for x in language_id(_docs(spark)).collect()}
    assert r[1] == "en"
    assert r[2] == "de"
    assert r[3] == "und" and r[4] == "und"


def test_fingerprint_order_insensitive(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma   beta alpha"), (3, "alpha beta delta")],
        "doc_id bigint, text string",
    )
    r = {x["doc_id"]: x for x in fingerprint(docs).collect()}
    assert r[1]["content_fp"] != r[2]["content_fp"]
    assert r[1]["shingle_fp"] == r[2]["shingle_fp"]  # word-set fingerprint
    assert r[1]["shingle_fp"] != r[3]["shingle_fp"]
