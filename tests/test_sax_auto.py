"""Adaptive iSAX sizing (VERDICT r11 task 3): the sax_auto_params
derivation is pure driver arithmetic — pin its behavior across the
regimes SCALE r11f/r12b measured — and sax_index_health's occupancy
report is the guard that predicts the recall cliff."""

from __future__ import annotations

import pandas as pd

from epicsarchiver_spark.operators.timeseries import (
    sax_auto_params,
    sax_index_health,
)


def test_gate_corpus_resolves_to_fixed_constants():
    """750 series on the 15-instant gate grid must resolve to the r11
    fixed defaults — the ts_sax_topk_auto gate shares ts_sax_topk's
    oracle on exactly this equivalence."""
    p = sax_auto_params(750, n_grid=15)
    assert p["n_segments"] == 4
    assert p["n_candidates"] == 128
    assert p["n_words"] == 256
    assert p["expected_bucket"] == 3


def test_segments_grow_with_corpus():
    """The adaptive-cardinality move: ×10/×100 corpora get more word
    resolution so expected buckets stay fence-sized (r11f: fixed 4-seg
    words at 20k series → 2.5k-deep buckets → 0% recall)."""
    small = sax_auto_params(2_000, n_grid=64)
    big = sax_auto_params(20_000, n_grid=64)
    huge = sax_auto_params(2_000_000, n_grid=64)
    assert small["n_segments"] == 4  # 2000/256 ≈ 8 ≤ 64: default holds
    assert big["n_segments"] == 5  # 20000/1024 ≈ 20 ≤ 64
    assert huge["n_segments"] == 8  # 2M/65536 ≈ 31 ≤ 64
    for p in (small, big, huge):
        assert p["expected_bucket"] * 2 <= p["n_candidates"]


def test_grid_caps_segments_and_fence_grows_instead():
    """A short grid caps useful resolution; past the cap the FENCE
    absorbs the pressure (few-distinct-shapes corpora: more segments
    cannot split true mates, so truncating the bucket is the only
    silent-loss mode left)."""
    p = sax_auto_params(1_000_000, n_grid=15)
    assert p["n_segments"] == 7  # 64·4⁷ ≥ 1M: resolved inside the cap
    assert p["n_candidates"] == 128
    tiny_cap = sax_auto_params(100_000, n_grid=5)
    assert tiny_cap["n_segments"] == 4  # capped at n_grid - 1
    # 100k / 256 words = 391-deep buckets; fence = 2×391 = 782
    assert tiny_cap["n_candidates"] == 782
    clamped = sax_auto_params(10_000_000, n_grid=5)
    assert clamped["n_segments"] == 4
    assert clamped["n_candidates"] == 1024  # max_fence clamp


def test_degenerate_inputs():
    p = sax_auto_params(0)
    assert p["n_segments"] == 4 and p["n_candidates"] == 128
    p1 = sax_auto_params(1, n_grid=4)
    assert p1["n_segments"] == 4


def test_index_health_report(spark):
    """Occupancy rollup on a hand-built word table: 3 words with
    occupancies 1, 2, 5 against a fence of 4 — the 5-bucket overflows,
    carrying 5 of 8 series (6250 pct100); p99 rank = ceil(99·3/100) = 3
    → the largest bucket."""
    words = spark.createDataFrame(
        pd.DataFrame(
            {
                "pvname": [f"PV:{i}" for i in range(8)],
                "word": ["aa"] * 5 + ["bb"] * 2 + ["cc"],
            }
        )
    )
    row = sax_index_health(words, n_candidates=4).head()
    assert row.n_series == 8
    assert row.n_words == 3
    assert row.max_bucket == 5
    assert row.p99_bucket == 5
    assert row.overflow_words == 1
    assert row.overflow_series_pct100 == 6250


def test_index_health_no_overflow(spark):
    words = spark.createDataFrame(
        pd.DataFrame({"pvname": ["a", "b", "c"], "word": ["aa", "ab", "aa"]})
    )
    row = sax_index_health(words, n_candidates=128).head()
    assert row.overflow_words == 0
    assert row.overflow_series_pct100 == 0
    assert row.max_bucket == 2 and row.p99_bucket == 2
