"""Multimodal column operators — training-data-pipeline extensions.

Images/audio/video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; the decode kernels themselves
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode step
is a deterministic fake behind the real Spark plumbing: schema,
partitioning, mapInPandas batch shape, and byte handling are all
exercised for real. Swap ``_fake_decode_*`` for a real decoder on a
cluster with the codec libs installed — the operator contract is
unchanged.

Scale notes: binary payloads dominate row size, so these stages set
``maxRecordsPerBatch`` low implicitly via Arrow's byte-based slicing;
keep payload columns OUT of shuffles (derive features, drop bytes
before any groupBy/join).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META_SCHEMA, False),
    ]
)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    media_type: str = "image",
    fmt: str | None = None,
) -> DataFrame:
    """Derive the typed metadata struct from the raw bytes (native)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: RNG seeded by
    the payload hash. Same bytes ⇒ same features (goldens are stable).
    Replace with a real model on a GPU cluster; the signature and the
    Arrow batch shape are the contract."""
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    v /= np.linalg.norm(v) or 1.0
    return v.astype(np.float32).tolist()


def extract_media_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 64
) -> DataFrame:
    """binary payload → feature vector via mapInPandas (the multimodal
    analogue of the text embedder)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType(), False), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(
                features=pdf[payload_col].map(
                    lambda b: _fake_decode_features(bytes(b), dim)
                )
            )

    return df.mapInPandas(run, out_schema)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode requires PIL/opencv — not in this container."""
    raise NotImplementedError(
        "image decode needs PIL/opencv on the cluster; "
        "use extract_media_features (deterministic fake) for plumbing tests"
    )


def sample_video_frames(
    df: DataFrame, payload_col: str = "payload", every_ms: int = 1000
) -> DataFrame:
    """Real frame sampling requires ffmpeg — not in this container."""
    raise NotImplementedError(
        "video frame sampling needs ffmpeg on the cluster"
    )
