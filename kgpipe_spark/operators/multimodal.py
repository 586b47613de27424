"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step itself is STUBBED (the decode libraries are not in this
container): ``decode_image_batch`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode so the
Spark-side plumbing — schema, partitioning, mapInPandas batch shape, UDF
signatures — is real and tested end-to-end.

Schema convention:
    media(media_id BIGINT, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, duration_ms INT, codec STRING>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("n_bytes", LongType(), False),
    ]
)


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = sha-derived bytes."""
    df = spark.range(n_rows)
    kind = (
        F.when(F.pmod("id", F.lit(3)) == 0, F.lit("image"))
        .when(F.pmod("id", F.lit(3)) == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    payload = F.encode(F.sha2(F.concat(F.lit(f"media-{seed}-"), F.col("id")), 256), "utf-8")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.cast("binary").alias("payload"),
        F.struct(
            (F.lit(64) + F.pmod("id", F.lit(64))).cast("int").alias("width"),
            (F.lit(64) + F.pmod("id" , F.lit(48))).cast("int").alias("height"),
            (F.lit(1000) + F.pmod("id", F.lit(9000))).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decoded feature': md5-seeded float vector."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = False, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real decode (PIL/librosa/av) is NOT available in this container — the
    decode call raises NotImplementedError unless ``fake=True``. Everything
    around it (Arrow batching, schema, partition preservation) is real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                if not fake:
                    raise NotImplementedError(
                        "media decode requires PIL/librosa/av — not installed; "
                        "pass fake=True for the deterministic test path"
                    )
                feats.append(_fake_decode(bytes(payload), dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video rows → (media_id, frame_ts_ms) sampling plan — pure JVM
    (sequence + explode); the actual frame decode plugs into
    ``extract_features``."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
