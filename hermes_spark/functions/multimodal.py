"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages.  The decode libraries (PIL,
ffmpeg, torchaudio...) are NOT in this container, so the actual decode
is STUBBED — `deterministic_fake_features` derives a stable feature
vector from the payload bytes so the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and testable;
swap `_decode_stub` for a real decoder on a cluster with the libs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB for the real decoder (PIL/ffmpeg not in this container).

    Deterministic fake: 16 floats derived from sha256(payload) — stable
    across runs/engines, so tests can assert exact values.  Replace
    with a real decode+embed on a cluster with media libs.
    """
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    digest = hashlib.sha256(kind.encode() + payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0).astype(np.float32)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction — the real plumbing.

    Arrow batches stream through the Python worker; each batch is
    processed as a whole (vectorized over the batch, stub per payload).
    Repartition upstream by media_id so payload bytes distribute evenly
    (one huge video per partition is the skew case)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(extract, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-timestamp plan per
    video from metadata (JVM-side) — the decode of each frame would be
    a second mapInPandas over (media_id, frame_ts).  NotImplemented
    decode; the plan/schema/partitioning is the deliverable here."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(42)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        meta = (
            (64 + i, 48 + i, None, "png")
            if kind == "image"
            else (None, None, 1000 * (1 + i % 7), "opus" if kind == "audio" else "h264")
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
