"""Structured-Streaming incremental triple ingest.

The reference is strictly batch (SURVEY.md §2.10 — "Streaming: none"); its
incrementality is stage-wise: stage N's result KG feeds stage N+1
(`/root/reference/experiments/moviekg/src/moviekg/pipelines/helpers.py:62-69`).
This module is the streaming-native version of that loop for a corpus that
keeps growing: new corpus blobs land as parquet files, each micro-batch is
extracted + linked and appended to the triples table with set semantics
(dedupe against what is already materialized — rdflib Graph-union semantics,
`fusion/union.py:44-58`, made incremental).

foreachBatch is used (not a plain append sink) because the dedupe-vs-existing
anti-join needs batch-scoped reads of the sink — the standard idempotent-
upsert pattern. Checkpointing gives exactly-once per input file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe_spark.schemas import CORPUS_SCHEMA, TRIPLE_COLS


def stream_corpus_to_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    dictionary: DataFrame | None = None,
    max_files_per_trigger: int = 16,
):
    """Start (and return) a streaming query: corpus dir → triples parquet.

    Run with ``.trigger(availableNow=True)`` semantics via ``process_available``
    for tests; on a cluster leave it running continuously.
    """
    from kgpipe_spark.operators.extract import extract_code_triples, extract_json_triples
    from kgpipe_spark.pipelines import link_entities

    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = (
            extract_json_triples(batch_df)
            .unionByName(extract_code_triples(batch_df))
            .select(*TRIPLE_COLS)
        )
        if dictionary is not None:
            triples = link_entities(
                triples.withColumn("prov_repo", F.lit(None).cast("string")), dictionary
            ).select(*TRIPLE_COLS)
        triples = triples.dropDuplicates(
            ["subject", "predicate", "object_lex", "object_kind"]
        )
        # set semantics vs the already-materialized KG (incremental union)
        if _has_parquet(output_dir):
            existing = batch_df.sparkSession.read.parquet(output_dir).select(
                "subject", "predicate", "object_lex", "object_kind"
            )
            triples = triples.join(
                existing, ["subject", "predicate", "object_lex", "object_kind"], "left_anti"
            )
        triples.write.mode("append").parquet(output_dir)

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
