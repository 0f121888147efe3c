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
    # the grid cap is a HARD ceiling — it beats the 4-segment floor
    # (a 4-instant grid supports at most 3 segments)
    p1 = sax_auto_params(1, n_grid=4)
    assert p1["n_segments"] == 3
    assert sax_auto_params(100, n_grid=2)["n_segments"] == 1


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


def _series(pv, pairs):
    return [(pv, float(t), float(v)) for t, v in pairs]


def test_sax_words_refresh_staleness_contract(spark):
    """The freshness contract (VERDICT r11 task 5): after an append,
    refresh must (a) re-word exactly the series with new points at or
    under the window horizon — including a BACKFILL landing below the
    series' max time, which only the point count detects — (b) READ
    BACK unchanged series from the artifact — proven by tampering an
    unchanged row's word and seeing the tamper survive — and (c) pick
    up series the artifact never saw. A new point PAST the horizon
    must not mark its series stale."""
    import pandas as pd

    from epicsarchiver_spark.operators.timeseries import (
        sax_words_build,
        sax_words_refresh,
    )

    t0, t1, step = 0.0, 90.0, 30.0  # grid instants 0, 30, 60, 90
    base_rows = (
        _series("PV:stale", [(0, 1), (30, 5), (60, 2)])
        + _series("PV:same", [(0, 9), (40, 1), (80, 4)])
        + _series("PV:backfill", [(0, 2), (60, 7)])
    )
    full_rows = (
        base_rows
        + _series("PV:stale", [(85, 99)])      # in-horizon append → stale
        + _series("PV:same", [(95, 123)])      # past horizon → NOT stale
        + _series("PV:backfill", [(30, 50)])   # BELOW max, in horizon → stale
        + _series("PV:new", [(0, 3), (50, 8)])  # never indexed → stale
    )
    cols = ["pvname", "time", "value"]
    base = spark.createDataFrame(pd.DataFrame(base_rows, columns=cols))
    full = spark.createDataFrame(pd.DataFrame(full_rows, columns=cols))

    art = sax_words_build(base, t0, t1, step, n_segments=2).toPandas()
    # tamper the unchanged series' artifact word: refresh must emit the
    # tampered value verbatim (read-back), never recompute it
    art.loc[art["pvname"] == "PV:same", "word"] = "ZZ"
    tampered = spark.createDataFrame(art)

    got = {
        r["pvname"]: (r["word"], r["wm"], r["np"])
        for r in sax_words_refresh(
            full, tampered, t0, t1, step, n_segments=2
        ).collect()
    }
    want_full = {
        r["pvname"]: (r["word"], r["wm"], r["np"])
        for r in sax_words_build(full, t0, t1, step, n_segments=2).collect()
    }
    assert set(got) == {"PV:stale", "PV:same", "PV:backfill", "PV:new"}
    # stale + backfilled + new series match the full rebuild exactly
    assert got["PV:stale"] == want_full["PV:stale"]
    assert got["PV:backfill"] == want_full["PV:backfill"]
    assert got["PV:new"] == want_full["PV:new"]
    # unchanged series: tampered word survives, watermark unmoved (the
    # 95.0 append sits past the horizon), count unmoved
    assert got["PV:same"] == ("ZZ", 80.0, 3)


def test_sax_words_refresh_equals_full_rebuild(spark):
    """Row-identical to a full rebuild on an untampered artifact — the
    property the ts_sax_words_incremental gate certifies against DuckDB
    at sf0.01."""
    import pandas as pd

    from epicsarchiver_spark.operators.timeseries import (
        sax_words_build,
        sax_words_refresh,
    )

    t0, t1, step = 0.0, 90.0, 30.0
    rows = []
    for i in range(6):
        rows += _series(f"PV:{i}", [(t, (i + 1) * t % 7) for t in range(0, 100, 10)])
    cols = ["pvname", "time", "value"]
    full = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    base = full.filter("time <= 45")
    art = sax_words_build(base, t0, t1, step, n_segments=3)
    got = sorted(
        map(tuple, sax_words_refresh(full, art, t0, t1, step, n_segments=3).collect())
    )
    want = sorted(map(tuple, sax_words_build(full, t0, t1, step, n_segments=3).collect()))
    assert got == want


def test_sax_words_refresh_accepts_maintained_stats(spark):
    """The production staleness path: ``stats=`` supplies the current
    (key, wm, np) frame from the ingest's maintained cache, and the
    refresh must equal the scan-derived one row-for-row (same corpus,
    same stats ⇒ same stale set ⇒ same output)."""
    import pandas as pd

    from epicsarchiver_spark.operators.timeseries import (
        sax_words_build,
        sax_words_refresh,
    )

    t0, t1, step = 0.0, 90.0, 30.0
    rows = []
    for i in range(4):
        rows += _series(f"PV:{i}", [(t, (i + 2) * t % 11) for t in range(0, 100, 10)])
    cols = ["pvname", "time", "value"]
    full = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    base = full.filter("time <= 45")
    art = sax_words_build(base, t0, t1, step, n_segments=3)
    from pyspark.sql import functions as F

    stats = (
        full.filter(F.col("time") <= t1 + 1e-4)
        .groupBy("pvname")
        .agg(F.max("time").alias("wm"), F.count(F.lit(1)).alias("np"))
    )
    got = sorted(map(tuple, sax_words_refresh(
        full, art, t0, t1, step, n_segments=3, stats=stats
    ).collect()))
    want = sorted(map(tuple, sax_words_refresh(
        full, art, t0, t1, step, n_segments=3
    ).collect()))
    assert got == want and got


def test_index_health_no_overflow(spark):
    words = spark.createDataFrame(
        pd.DataFrame({"pvname": ["a", "b", "c"], "word": ["aa", "ab", "aa"]})
    )
    row = sax_index_health(words, n_candidates=128).head()
    assert row.overflow_words == 0
    assert row.overflow_series_pct100 == 0
    assert row.max_bucket == 2 and row.p99_bucket == 2


def test_cusum_segments_regime_split(spark):
    """A series that steps from level ~10 to level ~60 must split into
    two segments at the crossing, each reporting its own exact stats;
    explicit-target lane so the expectation is hand-computable."""
    import pandas as pd

    from epicsarchiver_spark.operators.timeseries import cusum_segments

    rows = [("R:a", float(t), 10.0 + (t % 3)) for t in range(0, 50, 5)]
    rows += [("R:a", float(t), 60.0 + (t % 3)) for t in range(50, 100, 5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pvname", "time", "value"])
    )
    segs = {
        r.seg: r
        for r in cusum_segments(df, k=1.0, h=20.0, target=11.0).collect()
    }
    assert set(segs) == {0, 1}
    s0, s1 = segs[0], segs[1]
    # the step lands at t=50; S+ needs a couple of points past target+k
    # to clear h=20, so the boundary sits at/after the step, never before
    assert s0.t_start == 0.0 and s1.t_end == 95.0
    assert 50.0 <= s1.t_start <= 60.0
    assert s0.vmax <= 12.0 and s1.vmin >= 60.0
    assert 9.5 <= s0.mean <= 12.5 and 60.0 <= s1.mean <= 62.5
    assert s0.n_points + s1.n_points == 20


def test_stats_detector_never_poisons_artifact(spark):
    """An ALL-TIME stats cache (wm/np unbounded by the horizon) may
    over-report staleness — harmless rewords — but the artifact rows it
    produces must still carry HORIZON-BOUNDED (wm, np), identical to a
    full rebuild; otherwise a later scan-based refresh compares scan
    stats against poisoned values and can miss genuine staleness."""
    import pandas as pd

    from epicsarchiver_spark.operators.timeseries import (
        sax_words_build,
        sax_words_refresh,
    )

    t0, t1, step = 0.0, 90.0, 30.0
    rows = (
        _series("PV:a", [(0, 1), (40, 5), (80, 2), (200, 9), (300, 7)])
        + _series("PV:b", [(0, 4), (50, 6)])
    )
    cols = ["pvname", "time", "value"]
    full = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    art = sax_words_build(full.filter("time <= 45"), t0, t1, step, n_segments=2)
    # the unbounded cache: max/count over ALL points (200/300 included)
    from pyspark.sql import functions as F

    all_time = full.groupBy("pvname").agg(
        F.max("time").alias("wm"), F.count(F.lit(1)).alias("np")
    )
    got = sorted(map(tuple, sax_words_refresh(
        full, art, t0, t1, step, n_segments=2, stats=all_time
    ).collect()))
    want = sorted(map(tuple, sax_words_build(
        full, t0, t1, step, n_segments=2
    ).collect()))
    assert got == want  # horizon-bounded wm/np, not the cache's values
