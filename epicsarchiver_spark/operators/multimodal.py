"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition sizing) is
real and tested; the actual codec work is STUBBED behind
``DeterministicFakeCodec`` because image/audio libraries are not in this
container — swap in PIL/ffmpeg decoders by replacing the codec object.
Batches stream through Arrow; peak memory per task ≈ one Arrow batch, so
``spark.sql.execution.arrow.maxRecordsPerBatch`` is the knob for huge
blobs at scale."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


class DeterministicFakeCodec:
    """Stand-in for real decoders: derives a deterministic feature vector
    from the payload bytes so tests are reproducible. Real deployments
    replace this with PIL/torchvision/ffmpeg implementations."""

    dim = 8

    def decode_features(self, payload: bytes) -> list[float]:
        if payload is None:
            return [0.0] * self.dim
        arr = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(arr, self.dim) if len(arr) else [np.array([0])] * self.dim
        return [float(c.sum() % 997) / 997.0 for c in chunks]

    def resize_image(self, payload: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError(
            "real image resize requires PIL/opencv — not in this container"
        )

    def sample_frames(self, payload: bytes, every_ms: int) -> list[bytes]:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg — not in this container"
        )


def extract_features(
    media: DataFrame, codec: DeterministicFakeCodec | None = None
) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: Arrow
    batches in, Arrow batches out, codec applied per row inside the batch
    loop — the plumbing real decode shares."""
    codec = codec or DeterministicFakeCodec()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "feature": pdf["payload"].map(codec.decode_features),
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM aggregation over metadata + payload length — payloads
    stay in the JVM (no Python round-trip)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length("payload")).alias("avg_bytes"),
            F.max("width").alias("max_width"),
        )
        .orderBy("kind")
    )
