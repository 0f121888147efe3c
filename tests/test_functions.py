"""Scalar/text/vector function unit tests (SURVEY §2.8) with
hand-computed expectations, including the reference's quirky operators:
normalize (C1), clean_value byte-repr unwrap (C4), chararray (C12), enum
mapping (C13), alert comparison cast-fallback (C16)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epicsarchiver_spark.functions import scalar, text, vector
from epicsarchiver_spark.operators.multimodal import extract_features, media_stats


def _col1(spark, values, fn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"x {in_type}")
    return [r.y for r in df.select(fn(F.col("x")).alias("y")).collect()]


def test_normalize_pvname(spark):
    got = _col1(spark, ["XXX:m1", "XXX:m1.VAL", " XXX:m2.RBV ", "a.b"], scalar.normalize_pvname)
    assert got == ["XXX:m1.VAL", "XXX:m1.VAL", "XXX:m2.RBV", "a.b"]


def test_valid_pvname(spark):
    got = _col1(spark, ["XXX:m1.VAL", "bad name", "ok{}<>;"], scalar.valid_pvname)
    assert got == [True, False, True]


def test_clean_string_truncates_injection(spark):
    got = _col1(spark, ["abc;drop table", "x # comment", "plain"], scalar.clean_string)
    assert got == ["abc", "x ", "plain"]


def test_clean_value_num(spark):
    got = _col1(spark, ["1.25", "b'2.5'", 'b"3.5"', "nope", "7"], scalar.clean_value_num)
    assert got == [1.25, 2.5, 3.5, None, 7.0]


def test_bucket_id_range(spark):
    got = _col1(spark, [f"PV:{i}" for i in range(50)], scalar.bucket_id)
    assert all(0 <= b < 128 for b in got)
    assert len(set(got)) > 1


def test_hashname_parity_matches_reference_algorithm(spark):
    """Independent check of C5 parity: sha256 → base64 → Σ bytes mod 128
    (ref epicsarchiver/archiver.py:25-32)."""
    import base64
    import hashlib

    names = ["XXX:m1.VAL", "S13:ip1.VAL", "ABC"]
    expect = [
        sum(base64.b64encode(hashlib.sha256(n.encode()).digest())) % 128 for n in names
    ]
    df = spark.createDataFrame([(n,) for n in names], schema="x string")
    got = [r.y for r in df.select(scalar.hashname_parity(F.col("x")).alias("y")).collect()]
    assert got == expect


def test_chararray_as_string(spark):
    got = _col1(
        spark,
        ["[72, 105, 0, 33]", "[72, 101, 108, 108, 111]", "[]"],
        scalar.chararray_as_string,
    )
    assert got == ["Hi", "Hello", ""]


def test_enum_label(spark):
    df = spark.createDataFrame(
        [(0, ["Off", "On", "Fault"]), (2, ["Off", "On", "Fault"]), (7, ["Off", "On"])],
        schema="v int, labels array<string>",
    )
    got = [
        r.y
        for r in df.select(
            scalar.enum_label(F.col("v"), F.col("labels")).alias("y")
        ).collect()
    ]
    assert got == ["Off", "Fault", "7"]


def test_yes_no(spark):
    got = _col1(spark, ["0", "1", "2"], scalar.yes_no)
    assert got == ["No", "Yes", "Yes"]


def test_alert_fires_numeric_and_string(spark):
    df = spark.createDataFrame(
        [
            ("9.5", "gt", "5"),
            ("3", "gt", "5"),
            ("abc", "eq", "abc"),
            ("abc", "lt", "abd"),
            ("10", "le", "9"),
        ],
        schema="v string, c string, t string",
    )
    got = [
        r.y
        for r in df.select(
            scalar.alert_fires(F.col("v"), F.col("c"), F.col("t")).alias("y")
        ).collect()
    ]
    assert got == [True, False, True, True, False]


def test_hformat_reference_vectors():
    """Vectors captured by EXECUTING the reference formatter
    (epicsarchiver/util.py:427-491) on representative inputs. Note the
    reference's own docstring example (' 1.0000e+08' for 1e8+5.2 at
    length 11) does not match its implementation, which yields
    '  100000005' — parity follows the implementation."""
    from epicsarchiver_spark.functions.scalar import _hformat_one

    assert _hformat_one(99999995.2, 11) == " 99999995.2"
    assert _hformat_one(100000005.2, 11) == "  100000005"
    assert _hformat_one(1.5, 11) == " 1.50000"  # trailing '000' stripped
    assert _hformat_one(1.5, 10) == " 1.5000"
    assert _hformat_one(-2.25, 10) == "-2.2500"
    assert _hformat_one(0.001, 11) == " 1.0000e-03"
    assert _hformat_one(123456.789, 10) == " 123456.79"
    assert _hformat_one(0.0, 10) == " 0.0000"
    assert _hformat_one(1e120, 10) == " 1.00e+120"
    assert _hformat_one(float("nan"), 10) == "       nan"


def test_hformat_udf(spark):
    df = spark.createDataFrame([(1.5,), (float("nan"),)], schema="x double")
    got = [r.y for r in df.select(scalar.hformat(F.col("x")).alias("y")).collect()]
    assert got[0] == " 1.5000" and got[1].strip() == "nan"  # default length 10


def test_tformat_ts2iso(spark):
    df = spark.createDataFrame([(1704067200.0,)], schema="x double")
    r = df.select(
        scalar.tformat(F.col("x")).alias("t"), scalar.ts2iso(F.col("x")).alias("i")
    ).head()
    assert r.t == "2024-Jan-01 00:00:00"
    assert r.i == "2024-01-01 00:00:00.000"


def test_null_norm(spark):
    got = _col1(spark, ["", "none", "None", "x", None], scalar.null_norm)
    assert got == [None, None, None, "x", None]


# --- text functions ---

def test_tokens_and_counts(spark):
    got = _col1(spark, ["a  b c", "", "  x "], text.token_count, "string")
    assert got == [3, 0, 1]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], schema="x string")
    got = df.select(text.word_shingles(F.col("x"), 2).alias("y")).head().y
    assert list(got) == ["a b", "b c", "c d"]


def test_langid(spark):
    got = _col1(
        spark,
        ["the cat and the dog of to in", "der hund ist nicht und", "zzz qqq"],
        text.langid,
    )
    assert got == ["en", "de", "und"]


# --- vector functions ---

def test_cosine_identity(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])], "a array<double>, b array<double>")
    r = df.select(vector.cosine(F.col("a"), F.col("b")).alias("c")).head()
    assert math.isclose(r.c, 1.0)


def test_l2_distance(spark):
    df = spark.createDataFrame([([0.0, 3.0], [4.0, 0.0])], "a array<double>, b array<double>")
    assert math.isclose(
        df.select(vector.l2_distance(F.col("a"), F.col("b")).alias("d")).head().d, 5.0
    )


# --- multimodal plumbing ---

@pytest.fixture()
def media(spark):
    rows = [
        ("m1", "image", "image/png", 64, 64, None, b"\x01\x02\x03\x04" * 16),
        ("m2", "audio", "audio/wav", None, None, 2000, b"\x10\x20" * 32),
        ("m3", "image", "image/png", 32, 32, None, None),
    ]
    return spark.createDataFrame(
        rows, schema="media_id string, kind string, mime string, width int, height int, duration_ms int, payload binary"
    )


def test_extract_features_deterministic(spark, media):
    out = {r.media_id: (r.n_bytes, list(r.feature)) for r in extract_features(media).collect()}
    assert out["m1"][0] == 64 and len(out["m1"][1]) == 8
    assert out["m3"] == (0, [0.0] * 8)
    again = {r.media_id: (r.n_bytes, list(r.feature)) for r in extract_features(media).collect()}
    assert out == again


def test_media_stats(spark, media):
    rows = {r.kind: r.n for r in media_stats(media).collect()}
    assert rows == {"image": 2, "audio": 1}


def test_resize_images_plumbing(spark, media):
    from epicsarchiver_spark.operators.multimodal import resize_images

    out = {r.media_id: r for r in resize_images(media, 8, 4).collect()}
    # image rows: payload resampled to exactly w*h bytes, metadata stamped
    assert len(out["m1"].payload) == 32 and (out["m1"].width, out["m1"].height) == (8, 4)
    # null payload passes through null
    assert out["m3"].payload is None
    # non-image rows untouched
    assert bytes(out["m2"].payload) == b"\x10\x20" * 32 and out["m2"].width is None
    # schema closed under resize → composes with extract_features
    feats = extract_features(resize_images(media, 8, 4))
    assert {r.media_id for r in feats.collect()} == {"m1", "m2", "m3"}


def test_sample_video_frames_plumbing(spark, media):
    from epicsarchiver_spark.operators.multimodal import sample_video_frames

    vid = media.unionByName(
        spark.createDataFrame(
            [("v1", "video", "video/mp4", None, None, 3000, bytes(range(30)))],
            schema=media.schema,
        )
    )
    rows = sample_video_frames(vid, every_ms=1000).collect()
    frames = {(r.media_id, r.frame_idx): r for r in rows}
    # 3000ms/1000ms = 3 frames for the video; 2 for the 2000ms audio; images none
    assert sorted(k for k in frames if k[0] == "v1") == [("v1", 0), ("v1", 1), ("v1", 2)]
    assert len([k for k in frames if k[0] == "m2"]) == 2
    assert not [k for k in frames if k[0] in ("m1", "m3")]
    assert frames[("v1", 1)].offset_ms == 1000
    # frame payload slices partition the source bytes
    got = b"".join(bytes(frames[("v1", i)].frame) for i in range(3))
    assert got == bytes(range(30))


def test_bpe_token_count(spark):
    got = _col1(
        spark,
        ["I'll have 42 tokens!", "hello  world", ""],
        text.bpe_token_count,
    )
    # "I"/"'ll"/" have"/" 42"/" tokens"/"!" → 6; "hello"/"  world"→... split
    assert got[0] == 6 and got[2] == 0


def test_scrub_pii_masks_and_counts(spark):
    from epicsarchiver_spark.operators.text_ops import scrub_pii

    df = spark.createDataFrame(
        [(1, "a.b@x.co.uk then https://ex.com/p?q=1 and 1234567890123"), (2, "clean 1234")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert rows[1].clean_text == "<EMAIL> then <URL> and <NUM>"
    assert (rows[1].n_email, rows[1].n_url, rows[1].n_longnum) == (1, 1, 1)
    assert rows[2].clean_text == "clean 1234"  # short digit runs kept
    assert (rows[2].n_email, rows[2].n_url, rows[2].n_longnum) == (0, 0, 0)


def test_assign_splits_deterministic_and_proportional(spark):
    from epicsarchiver_spark.operators.text_ops import assign_splits

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in assign_splits(df).collect()}
    b = {r.doc_id: r.split for r in assign_splits(df).collect()}
    assert a == b  # reproducible, no RNG
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert abs(c["train"] / 5000 - 0.9) < 0.03
    assert abs(c["val"] / 5000 - 0.05) < 0.02
    assert abs(c["test"] / 5000 - 0.05) < 0.02


def test_chunk_documents_cover_and_overlap(spark):
    from epicsarchiver_spark.operators.text_ops import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.start_token, r.chunk_text, r.n_tokens)
         for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect())
    )
    assert rows == [
        (1, 0, 0, "w0 w1 w2 w3", 4),
        (1, 1, 3, "w3 w4 w5 w6", 4),
        (1, 2, 6, "w6 w7 w8 w9", 4),
        (2, 0, 0, "a b", 2),
    ]  # empty doc 3 yields no chunks; every token covered; 1-token overlap


def test_repetition_stats_counts(spark):
    from epicsarchiver_spark.operators.text_ops import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y"), (3, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    # tokens a,a,a,b → 4 total / 2 distinct; bigrams "a a","a a","a b"
    assert (r1.n_tokens, r1.dup_token_frac) == (4, 0.5)
    assert (r1.n_bigrams, r1.dup_bigram_frac) == (3, round(1 / 3, 6))
    assert r1.top_bigram_frac == round(2 / 3, 6)
    assert rows[2].dup_token_frac == 0.0 and rows[2].top_bigram_frac == 1.0
    r3 = rows[3]  # degenerate doc: null fractions, not fake zeros
    assert (r3.n_tokens, r3.n_bigrams) == (0, 0)
    assert r3.dup_token_frac is None and r3.top_bigram_frac is None


def test_contamination_overlap_counts(spark):
    from epicsarchiver_spark.operators.text_ops import contamination_overlap

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "nothing shared here at all")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox runs")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in contamination_overlap(docs, bench, n=3).collect()}
    # doc1 3-grams: {the quick brown, quick brown fox, brown fox jumps};
    # bench contributes "quick brown fox" → 1 of 3 contaminated
    assert (rows[1].n_grams, rows[1].n_hits) == (3, 1)
    assert rows[1].contaminated_frac == round(1 / 3, 6)
    assert (rows[2].n_hits, rows[2].contaminated_frac) == (0, 0.0)


def test_global_shuffle_matches_hash_order(spark):
    import hashlib

    from epicsarchiver_spark.operators.text_ops import global_shuffle

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    got = {r.doc_id: r.shuffle_index for r in global_shuffle(df).collect()}
    order = sorted(range(1000), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert got == {k: i for i, k in enumerate(order)}


def test_pack_sequences_matches_stream_layout(spark):
    import hashlib

    from epicsarchiver_spark.operators.text_ops import pack_sequences

    chunks = [(d, c, 10 + (d * 7 + c) % 23) for d in range(40) for c in range(3)]
    df = spark.createDataFrame(chunks, "doc_id long, chunk_id long, n_tokens long")
    got = {
        (r.doc_id, r.chunk_id): (r.seq_id, r.seq_offset)
        for r in pack_sequences(df, seq_tokens=64).collect()
    }
    order = sorted(chunks, key=lambda t: (hashlib.md5(f"{t[0]}:{t[1]}".encode()).hexdigest(), t[0], t[1]))
    cum = 0
    for d, c, n in order:
        assert got[(d, c)] == (cum // 64, cum % 64), (d, c)
        cum += n
    assert len(got) == len(chunks)


def test_rebalance_sources_rates_and_determinism(spark):
    import hashlib

    from epicsarchiver_spark.operators.text_ops import rebalance_sources

    rows = [(i, "a" if i < 100 else "b") for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = {r.doc_id for r in rebalance_sources(df, {"a": 0.5, "b": 0.5}).collect()}
    # T = min(100/0.5, 50/0.5) = 100 → a keeps 50%, b keeps 100%
    assert all(i in kept for i in range(100, 150))
    thr_a = int((0.5 * (50 / 0.5) / 100) * 10000)  # floor(0.5·10000)
    expect_a = {
        i for i in range(100)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10000 < thr_a
    }
    assert kept - set(range(100, 150)) == expect_a
    kept2 = {r.doc_id for r in rebalance_sources(df, {"a": 0.5, "b": 0.5}).collect()}
    assert kept == kept2  # deterministic, no RNG


def test_quantize_embeddings_roundtrip_bound(spark):
    from epicsarchiver_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.003, 0.001, -0.002, 0.004]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 0, all-zero qvec
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for vid, vec in rows:
        q = [int(x) for x in got[vid].qvec.split(",")]
        assert all(-127 <= x <= 127 for x in q)
        amax = max(abs(x) for x in vec)
        scale = amax / 127.0
        if amax == 0:
            assert q == [0, 0, 0, 0] and got[vid].scale == 0.0
            continue
        for orig, qi in zip(vec, q):
            assert abs(qi * scale - orig) <= scale / 2 + 1e-12  # round-trip bound
    assert got[1].qvec == "64,-127,32,0"  # 0.5/scale = 63.5 → floor(+0.5) = 64


# --- PurePythonCodec: REAL decode (BMP / PCM-WAV), zero container deps ---

def _make_bmp(px_rows):
    """Hand-build a 24-bit BMP from [[(r,g,b), ...], ...] (top-down)."""
    import struct

    import numpy as np

    px = np.array(px_rows, dtype=np.uint8)
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    raw = body.tobytes()
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(raw), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0)
        + raw
    )


def _make_wav(samples, rate=8000):
    """Hand-build a mono PCM16 WAV from an int16 sample list."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_pure_python_codec_decodes_real_bmp_end_to_end(spark):
    """A genuine 24-bit BMP flows through the Spark mapInPandas operator
    and comes back with features computed from the DECODED pixels — the
    proof that the plumbing carries real decode, not just byte-counting."""
    from epicsarchiver_spark.operators.multimodal import PurePythonCodec, extract_features

    # 2x2: red, green / blue, white  → meanR = (255+0+0+255)/4 = 127.5
    bmp = _make_bmp([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]])
    media = spark.createDataFrame(
        [("img1", "image", "image/bmp", 2, 2, None, bmp)],
        schema="media_id string, kind string, mime string, width int, height int, duration_ms int, payload binary",
    )
    feat = extract_features(media, codec=PurePythonCodec()).head().feature
    assert feat[0] == 1.0  # image branch, not the fake fallback
    assert feat[1] == pytest.approx(2 / 4096) and feat[2] == pytest.approx(2 / 4096)
    assert feat[3] == pytest.approx(127.5 / 255)  # mean R from decoded pixels
    assert feat[4] == pytest.approx(127.5 / 255)
    assert feat[5] == pytest.approx(127.5 / 255)


def test_pure_python_codec_resize_produces_valid_bmp(spark):
    """Resize decodes, resamples the real pixel grid, re-encodes: output
    is itself a parseable BMP with the requested dims and the source's
    corner pixels (nearest-neighbor)."""
    from epicsarchiver_spark.operators.multimodal import (
        PurePythonCodec,
        _parse_bmp,
        resize_images,
    )

    quad = [
        [(10, 0, 0), (10, 0, 0), (0, 20, 0), (0, 20, 0)],
        [(10, 0, 0), (10, 0, 0), (0, 20, 0), (0, 20, 0)],
        [(0, 0, 30), (0, 0, 30), (40, 40, 40), (40, 40, 40)],
        [(0, 0, 30), (0, 0, 30), (40, 40, 40), (40, 40, 40)],
    ]
    media = spark.createDataFrame(
        [("img1", "image", "image/bmp", 4, 4, None, _make_bmp(quad))],
        schema="media_id string, kind string, mime string, width int, height int, duration_ms int, payload binary",
    )
    row = resize_images(media, 2, 2, codec=PurePythonCodec()).head()
    px = _parse_bmp(bytes(row.payload))
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (10, 0, 0) and tuple(px[0, 1]) == (0, 20, 0)
    assert tuple(px[1, 0]) == (0, 0, 30) and tuple(px[1, 1]) == (40, 40, 40)


def test_pure_python_codec_wav_features_and_frames(spark):
    """PCM16 WAV: features come from the decoded samples (peak/rms of a
    known square wave), and audio frame sampling slices the true PCM
    stream so the frames re-concatenate to the original samples."""
    import numpy as np

    from epicsarchiver_spark.operators.multimodal import (
        PurePythonCodec,
        extract_features,
        sample_video_frames,
    )

    samples = ([16384] * 400 + [-16384] * 400) * 10  # 8000 samples @ 8kHz = 1 s
    wav = _make_wav(samples, rate=8000)
    media = spark.createDataFrame(
        [("a1", "audio", "audio/wav", None, None, 1000, wav)],
        schema="media_id string, kind string, mime string, width int, height int, duration_ms int, payload binary",
    )
    feat = extract_features(media, codec=PurePythonCodec()).head().feature
    assert feat[0] == 2.0  # audio branch
    assert feat[1] == pytest.approx(8000 / 96000)
    assert feat[2] == pytest.approx(1.0 / 3600)  # 1 s decoded duration
    assert feat[3] == pytest.approx(0.5) and feat[4] == pytest.approx(0.5)  # rms = peak

    frames = sample_video_frames(media, every_ms=250, codec=PurePythonCodec()).collect()
    assert [r.offset_ms for r in sorted(frames, key=lambda r: r.frame_idx)] == [0, 250, 500, 750]
    rejoined = b"".join(bytes(r.frame) for r in sorted(frames, key=lambda r: r.frame_idx))
    assert np.array_equal(np.frombuffer(rejoined, dtype="<i2"), np.asarray(samples))


def test_pure_python_codec_falls_back_on_unknown_bytes():
    from epicsarchiver_spark.operators.multimodal import (
        DeterministicFakeCodec,
        PurePythonCodec,
    )

    junk = b"\x01\x02\x03\x04" * 16
    assert PurePythonCodec().decode_features(junk) == DeterministicFakeCodec().decode_features(junk)


def test_pure_python_codec_never_raises_on_malformed_riff():
    """Adversarial RIFF payloads must fall back, not raise — a struct
    error inside the codec would kill the whole Spark task (ADVICE r3):
    truncated fmt chunk, odd-length data chunk, data size overrunning the
    payload, and a fmt chunk cut at every possible byte length."""
    import struct

    from epicsarchiver_spark.operators.multimodal import (
        DeterministicFakeCodec,
        PurePythonCodec,
        _parse_wav,
    )

    fake, real = DeterministicFakeCodec(), PurePythonCodec()

    def must_fall_back(payload):
        assert _parse_wav(payload) is None
        assert real.decode_features(payload) == fake.decode_features(payload)
        assert real.sample_frames(payload, 1000, 250) == fake.sample_frames(payload, 1000, 250)

    base = b"RIFF" + struct.pack("<I", 100) + b"WAVE"
    # fmt chunk claiming 16 bytes but truncated mid-struct, at every cut
    for cut in range(16):
        must_fall_back(base + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"[:cut] + b"\x00" * min(cut, 14))
    # odd-length data chunk (ragged int16 tail)
    odd = (
        b"RIFF" + struct.pack("<I", 60) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 5) + b"\x01\x02\x03\x04\x05"
    )
    got = _parse_wav(odd)  # parseable: clamps to 2 whole samples
    assert got is not None and len(got[0]) == 2
    # data size field far beyond the actual payload
    overrun = (
        b"RIFF" + struct.pack("<I", 60) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 1 << 30) + b"\x01\x02\x03\x04"
    )
    got = _parse_wav(overrun)
    assert got is not None and len(got[0]) == 2  # clamped to real bytes
    # zero sample rate must not divide-by-zero downstream
    zrate = (
        b"RIFF" + struct.pack("<I", 60) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
        + b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    )
    must_fall_back(zrate)


def _make_png(px_rows, filters=None):
    """Independent PNG builder for test fixtures: filters the rows with a
    naive per-spec implementation (so the codec's vectorized unfiltering
    is checked against straight-line reference code), then assembles
    IHDR/IDAT/IEND with stdlib struct+zlib."""
    import struct
    import zlib

    import numpy as np

    px = np.array(px_rows, dtype=np.uint8)
    h, w = px.shape[:2]
    filters = filters if filters is not None else [0] * h
    body = bytearray()
    prev = [0] * (w * 3)
    for r in range(h):
        row = [int(v) for v in px[r].reshape(-1)]
        f = filters[r]
        body.append(f)
        cur = []
        for i in range(w * 3):
            a = row[i - 3] if i >= 3 else 0  # RAW left (per spec)
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                enc = row[i]
            elif f == 1:
                enc = (row[i] - a) & 0xFF
            elif f == 2:
                enc = (row[i] - b) & 0xFF
            elif f == 3:
                enc = (row[i] - ((a + b) >> 1)) & 0xFF
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = (row[i] - pred) & 0xFF
            cur.append(enc)
        body.extend(cur)
        prev = row

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    """The zlib-backed PNG decode must invert every PNG row filter
    (none/sub/up/average/paeth), checked against an independently
    filtered fixture."""
    import numpy as np

    from epicsarchiver_spark.operators.multimodal import _parse_png

    rng = [
        [(13, 200, 7), (255, 0, 128), (1, 2, 3), (90, 91, 92)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)],
        [(200, 199, 198), (5, 250, 5), (128, 128, 128), (0, 255, 0)],
        [(33, 66, 99), (132, 165, 198), (231, 8, 41), (74, 107, 140)],
        [(255, 255, 255), (0, 0, 0), (17, 34, 51), (68, 85, 102)],
    ]
    for filters in ([0] * 5, [1] * 5, [0, 2, 2, 2, 2], [3] * 5, [4] * 5, [0, 1, 2, 3, 4]):
        got = _parse_png(_make_png(rng, filters))
        assert got is not None, filters
        assert np.array_equal(got, np.array(rng, dtype=np.uint8)), filters


def test_png_roundtrip_and_resize(spark):
    """Codec-encoded PNG parses back bit-exact, and resize_image on a PNG
    payload decodes, resamples the real pixel grid, and re-encodes a
    valid PNG of the requested dims."""
    import numpy as np

    from epicsarchiver_spark.operators.multimodal import (
        PurePythonCodec,
        _encode_png,
        _parse_png,
        resize_images,
    )

    quad = [
        [(10, 0, 0), (10, 0, 0), (0, 20, 0), (0, 20, 0)],
        [(10, 0, 0), (10, 0, 0), (0, 20, 0), (0, 20, 0)],
        [(0, 0, 30), (0, 0, 30), (40, 40, 40), (40, 40, 40)],
        [(0, 0, 30), (0, 0, 30), (40, 40, 40), (40, 40, 40)],
    ]
    arr = np.array(quad, dtype=np.uint8)
    assert np.array_equal(_parse_png(_encode_png(arr)), arr)

    media = spark.createDataFrame(
        [("img1", "image", "image/png", 4, 4, None, _make_png(quad, [4, 1, 2, 3]))],
        schema="media_id string, kind string, mime string, width int, height int, duration_ms int, payload binary",
    )
    row = resize_images(media, 2, 2, codec=PurePythonCodec()).head()
    out = bytes(row.payload)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"  # stays a PNG
    px = _parse_png(out)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (10, 0, 0) and tuple(px[0, 1]) == (0, 20, 0)
    assert tuple(px[1, 0]) == (0, 0, 30) and tuple(px[1, 1]) == (40, 40, 40)


def test_png_features_end_to_end(spark):
    """A compressed container flows through the Spark mapInPandas feature
    operator with REAL decoded pixel statistics."""
    from epicsarchiver_spark.operators.multimodal import PurePythonCodec, extract_features

    png = _make_png(
        [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]], [1, 4]
    )
    media = spark.createDataFrame(
        [("p1", "image", "image/png", 2, 2, None, png)],
        schema="media_id string, kind string, mime string, width int, height int, duration_ms int, payload binary",
    )
    feat = extract_features(media, codec=PurePythonCodec()).head().feature
    assert feat[0] == 1.0  # image branch, not the fake fallback
    assert feat[3] == pytest.approx(127.5 / 255)  # mean R from decoded pixels
    assert feat[4] == pytest.approx(127.5 / 255)
    assert feat[5] == pytest.approx(127.5 / 255)


def test_png_malformed_falls_back_never_raises():
    """Truncated chunks, corrupt zlib streams, unsupported color types →
    fake-feature fallback, no exception."""
    import struct
    import zlib

    from epicsarchiver_spark.operators.multimodal import (
        DeterministicFakeCodec,
        PurePythonCodec,
        _parse_png,
    )

    fake, real = DeterministicFakeCodec(), PurePythonCodec()
    good = _make_png([[(1, 2, 3)]])

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    sig = b"\x89PNG\r\n\x1a\n"
    bad = [
        good[: len(good) // 2],  # truncated mid-chunk
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"not zlib at all") + chunk(b"IEND", b""),
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)),  # palette
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)),  # 16-bit
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))  # undersized raster
        + chunk(b"IEND", b""),
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x09\x01\x02\x03"))  # filter type 9
        + chunk(b"IEND", b""),
    ]
    for i, payload in enumerate(bad):
        assert _parse_png(payload) is None, i
        assert real.decode_features(payload) == fake.decode_features(payload), i


def test_dedup_segments_line_mode(spark):
    """Default newline mode: repeated lines (boilerplate) drop, first
    occurrence and order preserved, empties ignored."""
    from epicsarchiver_spark.operators.text_ops import dedup_segments

    docs = spark.createDataFrame(
        [
            (1, "nav bar\ncontent one\nnav bar\nfooter\ncontent two\nfooter"),
            (2, "\n\nonly\n\n"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_segments(docs).collect()}
    assert out[1].text_dedup == "nav bar\ncontent one\nfooter\ncontent two"
    assert (out[1].n_segments, out[1].n_kept) == (6, 4)
    assert (out[2].n_segments, out[2].n_kept, out[2].text_dedup) == (1, 1, "only")


def test_dedup_segments_oracle_agrees_on_degenerate_docs(spark):
    """Empty and separator-only docs: the engine emits (0, 0, '') rows and
    the DuckDB oracle must keep them too (ADVICE r3: the old stats-JOIN
    oracle dropped such docs — masked because the sf corpus has none)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from epicsarchiver_spark.operators.text_ops import dedup_segments

    rows = [(1, ""), (2, "   "), (3, "a b a"), (4, " ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_segments, r.n_kept, r.text_dedup)
        for r in dedup_segments(docs, sep=" ").collect()
    )
    assert got == [(1, 0, 0, ""), (2, 0, 0, ""), (3, 3, 2, "a b"), (4, 0, 0, "")]

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = sorted(
        tuple(r) for r in con.execute(entrymod.oracle_sql()["doc_segment_dedup"]).fetchall()
    )
    con.close()
    assert oracle == got


def test_timehash_matches_reference_formula(spark):
    """C11 (ref util.py:357-362): hex(int(10000.*t))[2:-1] in Python 2
    — '0x' prefix and long-suffix 'L' stripped, i.e. all lower-hex
    digits of the truncated 0.1-ms timestamp."""
    from epicsarchiver_spark.functions.scalar import timehash

    ts = [1.7045e9, 1704067199.9999, 0.0002, 12345.6789]
    df = spark.createDataFrame([(t,) for t in ts], "t double")
    got = [r.h for r in df.select(timehash(F.col("t")).alias("h")).collect()]
    want = [hex(int(10000.0 * t))[2:] for t in ts]  # py3: no trailing L
    assert got == want
