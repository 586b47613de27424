"""Cross-engine determinism contracts: the Spark column helpers and the
DuckDB SQL idioms the oracles use MUST agree byte-for-byte on hostile
inputs, or every hash-exact oracle in __spark_entry__.py silently rests on
luck. Exercises the exact SQL templates the oracles embed."""

import duckdb
import pytest
from pyspark.sql import functions as F

NASTY = [
    "",
    " ",
    "  double  spaces  ",
    "under_score-and-dash",
    "__--__",
    "MiXeD CaSe",
    "tab\tand\nnewline",
    "unicode: émile zolà ß 中文 🎬",
    "quote'and\"doublequote",
    "trailing-",
    "-leading",
    "a",
    "\x01",  # the shared null sentinel itself as data
    "percent % and || pipe",
    "very " + "long " * 50 + "label",
]

_SQL_NORM = (
    "trim(regexp_replace(lower(replace(replace(v, '_', ' '), '-', ' ')), '\\s+', ' ', 'g'))"
)


@pytest.fixture(scope="module")
def pairs(spark):
    """[(input, spark_norm, spark_key, spark_mint)] for the battery."""
    from kgpipe_spark.functions.hashing import mint_uri_sha256, stable_order_key
    from kgpipe_spark.functions.strings import normalize_label

    df = spark.createDataFrame([(v,) for v in NASTY], "v string")
    rows = df.select(
        "v",
        normalize_label(F.col("v")).alias("norm"),
        stable_order_key(F.col("v"), F.lit(None).cast("string"), F.col("v")).alias("key"),
        mint_uri_sha256(F.col("v")).alias("mint"),
    ).collect()
    return rows


def test_normalize_label_matches_duckdb(pairs):
    con = duckdb.connect()
    sql = "SELECT " + _SQL_NORM.replace("replace(v,", "replace(?,")
    for r in pairs:
        got = con.execute(sql, [r["v"]]).fetchone()[0]
        assert got == r["norm"], f"normalize mismatch for {r['v']!r}: {got!r} != {r['norm']!r}"


def test_stable_order_key_matches_duckdb(pairs):
    con = duckdb.connect()
    for r in pairs:
        got = con.execute(
            "SELECT sha256(coalesce(?, chr(1)) || coalesce(CAST(NULL AS VARCHAR), chr(1)) || coalesce(?, chr(1)))",
            [r["v"], r["v"]],
        ).fetchone()[0]
        assert got == r["key"], f"stable_order_key mismatch for {r['v']!r}"


def test_mint_uri_matches_duckdb(pairs):
    con = duckdb.connect()
    for r in pairs:
        got = con.execute("SELECT 'http://kg.org/newE/' || sha256(?)", [r["v"]]).fetchone()[0]
        assert got == r["mint"], f"mint mismatch for {r['v']!r}"
