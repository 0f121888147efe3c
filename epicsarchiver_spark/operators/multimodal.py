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
    """Stand-in for real decoders: derives deterministic outputs from the
    payload bytes so the Spark-side plumbing (schemas, Arrow batch shapes,
    UDF signatures) is fully testable without image/audio libraries. Real
    deployments replace this object with PIL/torchvision/ffmpeg
    implementations — the operators below do not change."""

    dim = 8

    def decode_features(self, payload: bytes) -> list[float]:
        if payload is None:
            return [0.0] * self.dim
        arr = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(arr, self.dim) if len(arr) else [np.array([0])] * self.dim
        return [float(c.sum() % 997) / 997.0 for c in chunks]

    def resize_image(self, payload: bytes, w: int, h: int) -> bytes:
        """Deterministic fake 'resize': nearest-neighbor byte sampling to
        exactly w*h bytes (a real codec decodes → resamples → re-encodes;
        the w*h output-size contract is what the plumbing tests pin)."""
        if payload is None:
            return None
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            return b"\x00" * (w * h)
        idx = np.linspace(0, len(arr) - 1, num=w * h).astype(np.int64)
        return arr[idx].tobytes()

    def sample_frames(self, payload: bytes, duration_ms: int, every_ms: int) -> list[tuple[int, bytes]]:
        """Deterministic fake frame sampler: one (offset_ms, frame_bytes)
        per every_ms tick, frame bytes sliced proportionally from the
        payload (ffmpeg would seek+decode the real frame)."""
        if payload is None or not duration_ms or every_ms <= 0:
            return []
        n_frames = max(1, duration_ms // every_ms)
        arr = np.frombuffer(payload, dtype=np.uint8)
        out = []
        for i in range(n_frames):
            lo = int(len(arr) * i / n_frames)
            hi = int(len(arr) * (i + 1) / n_frames)
            out.append((i * every_ms, arr[lo:hi].tobytes()))
        return out


class RealCodec(DeterministicFakeCodec):
    """Marker for production: every method must be overridden with a real
    PIL/opencv/ffmpeg implementation; the base methods raise."""

    def decode_features(self, payload):
        raise NotImplementedError("real decode requires PIL/torchaudio — not in this container")

    def resize_image(self, payload, w, h):
        raise NotImplementedError("real image resize requires PIL/opencv — not in this container")

    def sample_frames(self, payload, duration_ms, every_ms):
        raise NotImplementedError("real frame sampling requires ffmpeg — not in this container")


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


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("offset_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    codec: DeterministicFakeCodec | None = None,
) -> DataFrame:
    """Image resize over binary payloads via mapInPandas. Non-image rows
    pass through untouched; image rows get a new payload and the target
    width/height stamped into metadata. Output schema == MEDIA_SCHEMA, so
    resize composes with every other media operator (idempotent pipeline
    stage). At scale, blobs dominate batch size — tune
    ``arrow.maxRecordsPerBatch`` down so a batch of decoded images fits
    executor memory."""
    codec = codec or DeterministicFakeCodec()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(
                lambda p: codec.resize_image(p, width, height)
            )
            pdf.loc[is_img, "width"] = width
            pdf.loc[is_img, "height"] = height
            yield pdf

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    codec: DeterministicFakeCodec | None = None,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (a flatMap —
    mapInPandas may yield more rows than it consumes). Only
    ``kind == 'video'`` (or audio with a duration) rows produce frames.
    The explode happens Python-side inside the batch loop; downstream
    per-frame work (feature extraction) then distributes over the
    frame rows, which is the point — partition count follows frames,
    not source videos."""
    codec = codec or DeterministicFakeCodec()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sel = pdf[pdf["kind"].isin(("video", "audio"))]
            out = {"media_id": [], "frame_idx": [], "offset_ms": [], "frame": []}
            # row selection is vectorized; the residual python loop is the
            # per-payload codec call itself (zip over raw arrays — no
            # pandas per-row Series construction)
            for mid, payload, dur in zip(
                sel["media_id"].to_numpy(),
                sel["payload"].to_numpy(),
                sel["duration_ms"].to_numpy(),
            ):
                for i, (off, fb) in enumerate(codec.sample_frames(payload, dur, every_ms)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["offset_ms"].append(off)
                    out["frame"].append(fb)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)


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
