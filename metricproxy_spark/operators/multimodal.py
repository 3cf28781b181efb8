"""Multimodal column handling (SURVEY §3.8 L5).

Images/audio/video ride the pipeline as opaque BINARY columns with a
typed metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so heavy per-item work is vectorized per partition and
never touches the driver. The actual codec step is STUBBED in this
container (no image/audio libs): ``decode_media`` raises
NotImplementedError by contract, and ``fake_features`` is the
deterministic stand-in that keeps every piece of Spark-side plumbing —
schema, batching, partitioning, UDF signature — real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

N_FAKE_FEATURES = 8


def decode_media(content: bytes, media_type: str):  # pragma: no cover
    """STUB — real decode (PIL/libav/opencv) is unavailable in this
    container. The Spark-side contract (binary in, ndarray out) is
    fixed; swap the body when codecs exist."""
    raise NotImplementedError(
        "media decode stub: install codec libs and implement decode_media()"
    )


def fake_features(content: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: 8 floats derived from
    byte statistics of the payload. Replaces the model forward pass so
    batching/schema plumbing is exercised end-to-end."""
    if not content:
        return [0.0] * N_FAKE_FEATURES
    n = len(content)
    return [
        round(
            sum(content[i::N_FAKE_FEATURES]) / max(1, len(content[i::N_FAKE_FEATURES])) / 255.0,
            9,
        )
        for i in range(N_FAKE_FEATURES)
    ] if n >= 1 else [0.0] * N_FAKE_FEATURES


def extract_features(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Output: (id, n_bytes, features array<double>). Arrow moves the
    binary batches to Python whole-partition at a time; partition count
    (not row count) bounds Python invocation overhead.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[content_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "features": content.map(
                        lambda b: fake_features(b if b is not None else b"")
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, out_schema)


def sample_frame_offsets(
    df: DataFrame,
    duration_col: str = "duration_ms",
    frame_interval_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plumbing, Catalyst side: one row per sampled
    frame offset (0, interval, 2·interval … ≤ duration). The expensive
    per-frame decode stays downstream in mapInPandas; this explode is
    pure JVM and scales with input splits."""
    return df.withColumn(
        "frame_ms",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col(duration_col).cast("long"),
                F.lit(frame_interval_ms).cast("long"),
            )
        ),
    )


def extract_frame_features(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_col: str = "frame_ms",
    content_col: str = "content",
) -> DataFrame:
    """Per-frame feature extraction stub over (payload, frame offset).

    Real shape: seek to ``frame_ms`` in the container, decode one frame,
    run the vision model — all inside this mapInPandas. Stub emits a
    deterministic arithmetic feature ((id·1000003 + frame) % 10007 /
    10007) so the full plumbing (explode → Arrow batch → per-frame
    Python → columnar out) is exercised and ORACLE-CHECKABLE in plain
    SQL, which a hash-based fake would not be.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(frame_col, T.LongType(), False),
            T.StructField("frame_feature", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feat = (
                (pdf[id_col] * 1000003 + pdf[frame_col]) % 10007
            ) / 10007.0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    frame_col: pdf[frame_col],
                    "frame_feature": feat.round(9),
                }
            )

    return df.select(id_col, frame_col, content_col).mapInPandas(
        run, out_schema
    )


def attach_media_meta(
    df: DataFrame,
    content_col: str = "content",
    media_type: str = "image",
    fmt: str | None = None,
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct (L5 carry-
    through shape): payload stays opaque, metadata is columnar."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ),
    )
