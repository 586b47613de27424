"""Watermarked event-time windowed aggregation (SURVEY.md streaming surface).

Completes the Structured-Streaming triad next to the incremental ingest
(`ingest.py`) and the custom stateful sessionizer (`stateful.py`): tumbling
event-time windows with a watermark, so state for closed windows is dropped
and data later than the watermark is discarded — the standard late-data
policy for an unbounded event table at cluster scale (per-window partial
aggregation, state bounded by (watermark horizon / window length) windows
per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_length: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming events → (window_start, window_end, event_type, n, total).

    In append output mode a window row is emitted exactly once, when the
    watermark passes its end; events arriving later than the watermark are
    dropped (never double-counted, never resurrect a closed window).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_length), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal-accumulate then quantize to 1e-4: bit-identical across
            # engines (float sums differ in the last ulp between Spark's
            # partial-agg tree and DuckDB's sequential sum)
            (F.sum(F.col("value").cast("decimal(20,4)")) * 10000)
            .cast("long")
            .cast("double")
            .alias("_t"),
        )
        .withColumn("total", F.col("_t") / F.lit(10000.0))
        .drop("_t")
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )
