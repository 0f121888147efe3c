"""Pure-python baseline JPEG codec: round-trip fidelity across sampling
modes and restart intervals, spec conformance of the generated tables,
robustness on malformed input, and integration with the multimodal
codec (feature extraction, resize-in-container, aHash container
near-match)."""

from __future__ import annotations

import numpy as np
import pytest

from epicsarchiver_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    zigzag_order,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [
            np.clip(xx * 3 + 10, 0, 255),
            np.clip(yy * 4 + 40, 0, 255),
            np.clip((xx + yy) * 2 + 30, 0, 255),
        ]
    ).astype(np.uint8)


def test_zigzag_is_the_spec_order():
    zz = zigzag_order()
    assert sorted(zz.tolist()) == list(range(64))
    # the universally-published prefix of the JPEG zigzag scan
    assert zz[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subsample": True},
        {"restart_interval": 2},
        {"subsample": True, "restart_interval": 3},
    ],
)
def test_round_trip_fidelity(kw):
    px = _gradient(37, 53)  # odd dims exercise replicate padding
    out = decode_jpeg(encode_jpeg(px, **kw))
    assert out is not None and out.shape == px.shape
    err = np.abs(out.astype(float) - px.astype(float))
    # smooth content + mild quant tables: tiny luma error; 4:2:0 adds
    # bounded chroma averaging error
    assert err.mean() < 1.5 and err.max() <= 8


def test_round_trip_noise_bounded_by_quantization():
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, (24, 24, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(px))
    assert np.abs(out.astype(float) - px.astype(float)).mean() < 6


def test_flat_image_is_lossless():
    px = np.full((8, 16, 3), 128, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(px)), px)


def test_decoder_never_raises_on_malformed():
    px = _gradient(16, 16)
    data = encode_jpeg(px)
    assert decode_jpeg(data[:2]) is None
    assert decode_jpeg(data[:50]) is None  # truncated mid-headers
    assert decode_jpeg(data[:-40]) is None or decode_jpeg(data[:-40]) is not None
    assert decode_jpeg(b"\x00" * 100) is None
    assert decode_jpeg(b"\xff\xd8" + b"\xff\xc2" + b"\x00\x04\x00\x00") is None  # progressive


def test_codec_integration_features_resize_ahash(spark):
    from pyspark.sql import functions as F

    from epicsarchiver_spark.operators import multimodal

    px = _gradient(32, 48)
    jpg = encode_jpeg(px)
    from epicsarchiver_spark.operators.multimodal import _encode_bmp

    bmp = _encode_bmp(px)
    df = spark.createDataFrame(
        [("jpg", "image", bytearray(jpg)), ("bmp", "image", bytearray(bmp))],
        "media_id string, kind string, payload binary",
    ).select(
        "media_id", "kind", F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"), F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"), "payload",
    )
    codec = multimodal.PurePythonCodec()
    feats = {r.media_id: r.feature for r in multimodal.extract_features(df, codec=codec).collect()}
    # both decode as real images (marker 1.0) with near-identical stats
    assert feats["jpg"][0] == 1.0 and feats["bmp"][0] == 1.0
    assert np.allclose(feats["jpg"][1:7], feats["bmp"][1:7], atol=0.01)
    # aHash over decoded luma: lossy JPEG stays within a few bits of BMP
    ah = {r.media_id: r.ahash for r in multimodal.media_ahash(df, codec=codec).collect()}
    assert bin((ah["jpg"] ^ ah["bmp"]) & ((1 << 64) - 1)).count("1") <= 4
    # resize keeps the JPEG container and the target geometry
    resized = multimodal.resize_images(df, 16, 8, codec=codec).collect()
    out = {r.media_id: bytes(r.payload) for r in resized}
    assert out["jpg"][:2] == b"\xff\xd8"
    dec = decode_jpeg(out["jpg"])
    assert dec is not None and dec.shape == (8, 16, 3)


# --- robustness fuzzing ----------------------------------------------------


def test_decoder_never_raises_fuzz():
    """decode_jpeg must return an image or None on ANY input — one bad
    blob must never kill a Spark stage (the multimodal robustness
    contract). Deterministic fuzz corpus: random bytes, random bytes
    with a JPEG SOI, and random mutations of a valid stream."""
    rng = np.random.RandomState(99)
    valid = encode_jpeg(_gradient(16, 24))
    for trial in range(60):
        kind = trial % 3
        if kind == 0:
            blob = rng.bytes(rng.randint(0, 400))
        elif kind == 1:
            blob = b"\xff\xd8" + rng.bytes(rng.randint(0, 400))
        else:
            mutated = bytearray(valid)
            for _ in range(rng.randint(1, 8)):
                mutated[rng.randint(0, len(mutated))] = rng.randint(0, 256)
            blob = bytes(mutated)
        out = decode_jpeg(blob)  # must not raise
        assert out is None or (out.ndim == 3 and out.dtype == np.uint8)


def test_truncation_sweep_never_raises():
    data = encode_jpeg(_gradient(16, 24), restart_interval=2)
    for cut in range(0, len(data), 37):
        out = decode_jpeg(data[:cut])
        assert out is None or out.dtype == np.uint8
