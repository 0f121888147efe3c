"""Round-11 operator semantics: iSAX indexed series similarity
(sax_words / sax_topk) and HOT-SAX discord detection (sax_discords).
The gates ts_sax_topk(+_indexed) / ts_discords carry the full-oracle
checks; these pin the semantic edges — nomination really prunes by
shape, the planted anomaly really surfaces."""

from __future__ import annotations

import pytest

from epicsarchiver_spark.operators.timeseries import (
    sax_discords,
    sax_topk,
    sax_words,
)

SCHEMA = "pvname string, time double, value double"


def _series(rows, pv, values, t0=0.0, step=100.0):
    rows.extend((pv, t0 + i * step, float(v)) for i, v in enumerate(values))


def test_sax_words_one_word_per_series(spark):
    rows = []
    _series(rows, "Q", range(15))
    _series(rows, "C", range(14, -1, -1))
    df = spark.createDataFrame(rows, SCHEMA)
    words = {r.pvname: r.word for r in sax_words(df, 0.0, 1400.0, 100.0).collect()}
    assert set(words) == {"Q", "C"}
    assert len(words["Q"]) == 4
    # a descending ramp is the ascending ramp's word reversed
    assert words["C"] == words["Q"][::-1]


def test_sax_topk_nominates_by_shape_and_reranks_exact(spark):
    """Affine transforms of the query share its word (z-normalization
    kills offset/scale) and re-rank at r=1; the reversed series has a
    different word and is never nominated, however correlated it is."""
    rows = []
    _series(rows, "Q", range(15))
    _series(rows, "A", [2 * v + 5 for v in range(15)])  # same shape, r=1
    _series(rows, "B", [0.5 * v + 100 for v in range(15)])  # same shape, r=1
    _series(rows, "C", range(14, -1, -1))  # reversed: r=-1 but different word
    df = spark.createDataFrame(rows, SCHEMA)
    out = sax_topk(df, "Q", 0.0, 1400.0, 100.0, k=5).collect()
    assert [r.pvname for r in out] == ["A", "B"]  # |r| tie → name order
    assert all(r.r == 1.0 for r in out)
    assert all(r.n == 15 for r in out)


def test_sax_topk_index_lane_matches_inline(spark, tmp_path):
    rows = []
    _series(rows, "Q", range(15))
    _series(rows, "A", [3 * v - 7 for v in range(15)])
    df = spark.createDataFrame(rows, SCHEMA)
    words = sax_words(df, 0.0, 1400.0, 100.0)
    path = str(tmp_path / "sax_words")
    words.write.parquet(path)
    inline = sax_topk(df, "Q", 0.0, 1400.0, 100.0).collect()
    indexed = sax_topk(
        df, "Q", 0.0, 1400.0, 100.0, index=spark.read.parquet(path)
    ).collect()
    assert inline == indexed and len(inline) == 1


def test_sax_topk_unknown_query_is_empty(spark):
    rows = []
    _series(rows, "A", range(15))
    df = spark.createDataFrame(rows, SCHEMA)
    out = sax_topk(df, "NOPE", 0.0, 1400.0, 100.0)
    assert out.count() == 0
    assert out.columns == ["pvname", "word", "n", "r"]


def test_sax_topk_candidate_fence_is_deterministic(spark):
    """n_candidates caps the nomination pool by NAME order — the
    documented recall dial."""
    rows = []
    _series(rows, "Q", range(15))
    for i in range(6):
        _series(rows, f"S{i}", [(i + 1) * v for v in range(15)])
    df = spark.createDataFrame(rows, SCHEMA)
    out = sax_topk(df, "Q", 0.0, 1400.0, 100.0, k=10, n_candidates=3).collect()
    assert [r.pvname for r in out] == ["S0", "S1", "S2"]


def test_discords_surface_planted_anomaly(spark):
    """A period-8 pattern repeated 20 times gives every window a
    ~20-count word; perturbing ONE period makes the windows over it
    rare — the rank-1 discord must overlap the spike."""
    pattern = [0, 10, 20, 30, 40, 30, 20, 10]
    values = pattern * 20
    spike_at = 83
    values[spike_at] = 400.0
    rows = []
    _series(rows, "P", values, step=1.0)
    df = spark.createDataFrame(rows, SCHEMA)
    out = sax_discords(df, window=8, k=3).collect()
    assert len(out) == 3
    top = next(r for r in out if r.rank == 1)
    # a length-8 window starting in (spike-7 .. spike) covers the spike
    assert spike_at - 7 <= top.time <= spike_at
    assert top.word_count <= 3
    clean = sax_discords(
        spark.createDataFrame(
            [("P", float(i), float(v)) for i, v in enumerate(pattern * 20)],
            SCHEMA,
        ),
        window=8,
        k=1,
    ).collect()
    # without the spike even the RAREST window's word recurs ~20×
    assert clean[0].word_count >= 15


def test_discords_require_window_divisible_by_segments(spark):
    df = spark.createDataFrame([("P", 0.0, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="divisible"):
        sax_discords(df, window=10, n_segments=4)


def test_boilerplate_kills_headers_footers_and_link_farms(spark):
    """Line-mode jusText semantics: the stopword-dense prose line is
    the ONLY 'good' segment; the nav header (no stopwords), the link
    farm (link-dense), and the short footer are all rejected."""
    from epicsarchiver_spark.operators.text_ops import boilerplate_segments

    prose = (
        "the quick brown fox and the lazy dog ran over the hill to "
        "find a meal in the warm light of a long summer day"
    )
    doc = "\n".join(
        [
            "Home Products Pricing Blog Contact Careers Support Docs",  # header
            prose,
            "http://x.io/a http://x.io/b www.c.com http://d.net plus four more links here",
            "Copyright 2026",  # footer: short
        ]
    )
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    out = {r.seg: r for r in boilerplate_segments(df).collect()}
    assert [out[i].label for i in range(4)] == [
        "boilerplate",
        "good",
        "boilerplate",
        "short",
    ]
    assert out[2].n_links == 4
    assert out[1].n_stop >= 8


def test_boilerplate_window_mode_segments_by_word_count(spark):
    from epicsarchiver_spark.operators.text_ops import boilerplate_segments

    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 37)), (1, "")], "doc_id long, text string"
    )
    rows = boilerplate_segments(df, seg_words=16, min_words=8).collect()
    by_seg = {(r.doc_id, r.seg): r for r in rows}
    # 37 words → segments of 16/16/5; empty doc → no rows
    assert {k for k in by_seg} == {(0, 0), (0, 1), (0, 2)}
    assert by_seg[(0, 2)].n_words == 5 and by_seg[(0, 2)].label == "short"


def test_mojibake_flags_planted_corruption(spark):
    """Planted encoding damage: UTF-8 text double-decoded as Latin-1
    and as cp1252, plus replacement chars — all flagged; the clean
    twin is not."""
    from epicsarchiver_spark.operators.text_ops import mojibake_stats

    clean = "a perfectly ordinary sentence with café and naïve words " * 3
    latin1 = clean.encode("utf-8").decode("latin-1")  # é → Ã©, ï → Ã¯
    # NB ” (U+201D) ends on byte 0x9D, undefined in cp1252 — real-world
    # cp1252 mojibake comes from the chars whose trail bytes map
    cp1252 = (
        "it’s a “quoted dash — here "
        .encode("utf-8")
        .decode("cp1252")
    ) * 4  # ’ → â€™, “ → â€œ, — → â€”
    replaced = ("lost byte � here � and � there ") * 4
    df = spark.createDataFrame(
        [(0, clean), (1, latin1), (2, cp1252), (3, replaced)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in mojibake_stats(df).collect()}
    assert not out[0].flagged and out[0].mojibake_ppm == 0
    assert out[1].flagged and out[1].n_digraph >= 6
    assert out[2].flagged and out[2].n_digraph >= 12
    assert out[3].flagged and out[3].n_replacement == 12
    # the latin-1 double-decode also lands continuation bytes in C1
    assert out[1].n_c1 >= 0 and out[2].flagged


def _hw_mirror(values, m=4, span=12, a=None, b=None, g=None, quantum=0.01):
    """Independent textbook replay (direct recurrence on numbers, not
    coefficient vectors) of windowed additive Holt–Winters — the
    holt_linear _mirror discipline."""
    import math
    from fractions import Fraction

    a = a or Fraction(1, 2)
    b = b or Fraction(1, 2)
    g = g or Fraction(1, 2)

    def r6(x: float) -> float:
        return math.floor(abs(x) * 1e6 + 0.5) * (
            1.0 if x > 0 else -1.0 if x < 0 else 0.0
        ) / 1e6

    qs = [round(v / quantum) for v in values]
    out = []
    for t in range(len(qs)):
        if t + 1 < span:
            out.append((None, None, None, None))
            continue
        win = [Fraction(x) for x in qs[t - span + 1 : t + 1]]
        lvl = sum(win[:m]) / m
        trd = sum(win[m : 2 * m]) / (m * m) - sum(win[:m]) / (m * m)
        seas = [win[i] - lvl for i in range(m)]
        for i in range(m, span):
            slot = i % m
            nl = a * (win[i] - seas[slot]) + (1 - a) * (lvl + trd)
            nb = b * (nl - lvl) + (1 - b) * trd
            seas[slot] = g * (win[i] - nl) + (1 - g) * seas[slot]
            lvl, trd = nl, nb
        s_next = seas[span % m]
        out.append(
            (
                r6(float(lvl) * quantum),
                r6(float(trd) * quantum),
                r6(float(s_next) * quantum),
                r6(float(lvl + trd + s_next) * quantum),
            )
        )
    return out


def test_holt_winters_matches_fraction_mirror(spark):
    from epicsarchiver_spark.operators.timeseries import holt_winters

    rng = __import__("random").Random(43)
    values = [round(50 + 10 * ((i % 4) - 1.5) + rng.random() * 3, 2) for i in range(30)]
    rows = [("P", float(i), v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.time: (r.level, r.trend, r.season, r.forecast)
        for r in holt_winters(df).collect()
    }
    exp = _hw_mirror(values)
    for i, e in enumerate(exp):
        assert got[float(i)] == e, f"row {i}: {got[float(i)]} != {e}"


def test_holt_winters_forecasts_periodic_signal(spark):
    """A zero-trend perfectly periodic series: once the window is full,
    the one-step forecast converges onto the true next value."""
    from epicsarchiver_spark.operators.timeseries import holt_winters

    pattern = [10.0, 20.0, 30.0, 20.0]
    values = pattern * 10
    rows = [("P", float(i), v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sorted(
        (r.time, r.forecast)
        for r in holt_winters(df).collect()
        if r.forecast is not None
    )
    # each forecast at row t predicts x_{t+1} = pattern[(t+1) % 4]
    errs = [abs(f - pattern[int(t + 1) % 4]) for t, f in out[4:]]
    assert max(errs) < 0.75
    assert errs[-1] < 0.05


def test_holt_winters_rejects_short_span(spark):
    from epicsarchiver_spark.operators.timeseries import holt_winters

    df = spark.createDataFrame([("P", 0.0, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="two seasons"):
        holt_winters(df, period=4, span=7)


def test_forecast_eval_scores_periodic_series(spark):
    """On a perfectly periodic series the HW backtest error shrinks to
    near zero; a noisy series scores worse. n counts only rows with
    both a forecast and a next actual."""
    from epicsarchiver_spark.operators.timeseries import forecast_eval

    pattern = [10.0, 20.0, 30.0, 20.0]
    rows = [("P", float(i), v) for i, v in enumerate(pattern * 10)]
    rng = __import__("random").Random(7)
    rows += [("N", float(i), round(rng.random() * 100, 2)) for i in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.pvname: r for r in forecast_eval(df).collect()}
    # 40 rows, forecasts from row 11 (span 12), last row has no next
    assert out["P"].n == 28 and out["N"].n == 28
    assert out["P"].mae < 1.0 < out["N"].mae


def test_sax_recall_is_perfect_on_affine_family(spark):
    """The exact truth is SIGNED-r top-k (shape similarity — the notion
    the word index targets): the four affine transforms (r=1) fill it,
    the reversed series (r=−1, word distance 3) is in neither side →
    recall 100%."""
    from epicsarchiver_spark.operators.timeseries import sax_topk_recall

    rows = []
    _series(rows, "Q", range(15))
    for i in range(4):
        _series(rows, f"S{i}", [(i + 2) * v - i for v in range(15)])
    _series(rows, "C", range(14, -1, -1))
    df = spark.createDataFrame(rows, SCHEMA)
    out = sax_topk_recall(df, "Q", 0.0, 1400.0, 100.0, k=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k == 4 and r.n_exact == 4 and r.n_indexed == 4
    assert r.n_hit == 4 and r.recall_pct100 == 10000
