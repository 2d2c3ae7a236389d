"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample are `mapInPandas` stages. The
sandbox has no imaging/audio libraries, so the decoders are STUBS — either a
clearly marked NotImplementedError (real codecs) or a deterministic fake
(for testing the Spark-side plumbing: schema, partitioning, Arrow batch
shape, UDF signatures — all real and tested).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode requires Pillow/libvips — not in this container."""
    raise NotImplementedError(
        "image decode stub: install Pillow on the cluster image and replace "
        "with PIL.Image.open(io.BytesIO(payload))"
    )


def fake_feature(payload: bytes, dim: int = 16, normalize: bool = True) -> np.ndarray:
    """Deterministic fake 'embedding': byte-histogram projection (optionally
    L2-normalized). Stands in for a real encoder so the distributed plumbing
    is testable end-to-end — with normalize=False the components are exact
    integer counts, which the DuckDB oracle reproduces byte-for-byte."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    if not normalize:
        return hist
    n = np.linalg.norm(hist)
    return hist / n if n > 0 else hist


def extract_features(
    media: DataFrame, dim: int = 16, use_fake: bool = True, normalize: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches).
    With use_fake=False this raises NotImplementedError inside the task —
    the documented behavior until real codecs are installed."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                data = bytes(payload) if payload is not None else b""
                if not use_fake:
                    decode_image(data)
                feats.append(fake_feature(data, dim, normalize).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows derived from
    duration metadata — pure Column math (sequence + explode); the decode of
    each planned frame is the stubbed stage above."""
    return (
        media.filter(F.col("kind") == "video")
        .filter(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
