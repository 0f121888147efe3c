"""Round-10 operator semantics: windowed Holt linear smoothing. The
gate ts_holt_linear carries the full-oracle check; these pin the
recurrence against a python Fraction mirror and the semantic edges."""

from __future__ import annotations

from fractions import Fraction

from epicsarchiver_spark.operators.timeseries import holt_linear


def _r6(x: float) -> float:
    """The operator's explicit-IEEE 6-dp rounding (floor(|x|·1e6+0.5)·
    sign/1e6) — chosen over F.round/round() because engines disagree on
    the exact decimal .5 ties holt's power-of-two denominators hit."""
    import math

    return math.floor(abs(x) * 1e6 + 0.5) * (1.0 if x > 0 else -1.0 if x < 0 else 0.0) / 1e6


def _mirror(values, span=8, a=Fraction(1, 4), b=Fraction(1, 4), quantum=0.01,
            horizon=1):
    """Replay the textbook recurrence per trailing window on quantized
    integers — independent of the operator's coefficient-table path."""
    qs = [round(v / quantum) for v in values]
    out = []
    for t in range(len(qs)):
        win = qs[max(0, t - span + 1): t + 1]
        lvl, trd = Fraction(win[0]), Fraction(0)
        if len(win) >= 2:
            trd = Fraction(win[1] - win[0])
            for x in win[1:]:
                nl = a * x + (1 - a) * (lvl + trd)
                trd = b * (nl - lvl) + (1 - b) * trd
                lvl = nl
        out.append((
            _r6(float(lvl) * quantum),
            _r6(float(trd) * quantum),
            _r6(float(lvl + horizon * trd) * quantum),
        ))
    return out


def test_holt_matches_python_mirror(spark):
    vals = [5.0, 7.0, 7.0, 3.0, 10.0, 10.0, 10.0, 2.0, 2.0, 8.0, 1.0, 4.0]
    rows = [("pv", float(t), v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = [
        (r.level, r.trend, r.forecast)
        for r in holt_linear(df).orderBy("time").collect()
    ]
    assert got == _mirror(vals)


def test_holt_constant_series_has_zero_trend(spark):
    rows = [("pv", float(t), 42.0) for t in range(12)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    for r in holt_linear(df).collect():
        assert r.level == 42.0 and r.trend == 0.0 and r.forecast == 42.0


def test_holt_tracks_linear_ramp(spark):
    """On an exact ramp the recurrence is exact: level = current value,
    trend = slope, forecast extrapolates one step."""
    rows = [("pv", float(t), 10.0 + 3.0 * t) for t in range(12)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = holt_linear(df).orderBy("time").collect()
    # after the window fills with pure ramp, the fit is exact
    for r in out[2:]:
        assert abs(r.level - r.value) < 1e-6, r
        assert abs(r.trend - 3.0) < 1e-6, r
        assert abs(r.forecast - (r.value + 3.0)) < 1e-6, r
    # single-sample window: no trend, forecast = value
    assert out[0].trend == 0.0 and out[0].forecast == out[0].value


def test_sax_ramp_spells_ascending_word(spark):
    """A monotone ramp's PAA rises through the breakpoints: the 8-seg
    alphabet-4 word over a linear ramp is non-decreasing and spans a→d;
    a constant series collapses to the middle letter with paa 0."""
    from epicsarchiver_spark.operators.timeseries import sax_symbols

    rows = [("ramp", float(t), float(t)) for t in range(64)]
    rows += [("flat", float(t), 5.0) for t in range(64)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = sax_symbols(df).collect()
    ramp = [r for r in sorted(out, key=lambda r: r.segment) if r.pvname == "ramp"]
    word = "".join(r.symbol for r in ramp)
    assert len(ramp) == 8 and all(r.n == 8 for r in ramp)
    assert word == "".join(sorted(word))  # non-decreasing
    assert word[0] == "a" and word[-1] == "d"
    flat = [r for r in out if r.pvname == "flat"]
    assert all(r.paa == 0.0 and r.symbol == "c" for r in flat)


def test_sax_is_shift_and_scale_invariant(spark):
    """z-normalization makes the word invariant to affine value
    transforms — the property that makes SAX words comparable across
    series with different units."""
    from epicsarchiver_spark.operators.timeseries import sax_symbols

    base = [float(v) for v in [1, 5, 2, 9, 4, 7, 3, 8] * 8]
    rows = [("a", float(t), v) for t, v in enumerate(base)]
    rows += [("b", float(t), 100.0 + 25.0 * v) for t, v in enumerate(base)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = sax_symbols(df).collect()
    wa = "".join(r.symbol for r in sorted(out, key=lambda r: r.segment)
                 if r.pvname == "a")
    wb = "".join(r.symbol for r in sorted(out, key=lambda r: r.segment)
                 if r.pvname == "b")
    assert wa == wb


def test_sax_rejects_unknown_alphabet(spark):
    import pytest

    from epicsarchiver_spark.operators.timeseries import sax_symbols

    df = spark.createDataFrame([("a", 0.0, 1.0)], "pvname string, time double, value double")
    with pytest.raises(ValueError):
        sax_symbols(df, alphabet=7)


def test_sq8_rerank_recall_and_index_equivalence(spark):
    """SQ8 nomination + exact re-rank: ≥0.8 recall@10 vs brute force on
    clustered data, and the persisted-artifact lane returns EXACTLY the
    inline lane's rows."""
    import random

    from epicsarchiver_spark.operators.similarity import (
        brute_force_topk,
        quantize_embeddings,
        sq8_topk_rerank,
    )

    rng = random.Random(11)
    centers = [[rng.uniform(-5, 5) for _ in range(8)] for _ in range(4)]
    rows = [
        (i, [float(x + rng.gauss(0, 0.3)) for x in centers[i % 4]])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = [float(x + 0.1) for x in centers[0]]

    exact = [r.vec_id for r in brute_force_topk(df, query, k=10).collect()]
    inline = sq8_topk_rerank(df, query, k=10, n_candidates=50).collect()
    recall = len(set(exact) & {r.vec_id for r in inline}) / 10
    assert recall >= 0.8, f"recall@10 {recall}"

    idx = quantize_embeddings(df)
    via_index = sq8_topk_rerank(df, query, k=10, n_candidates=50, index=idx).collect()
    assert [(r.vec_id, r.cosine_sim) for r in inline] == [
        (r.vec_id, r.cosine_sim) for r in via_index
    ]


def test_sq8_stage1_key_udf_bit_exact_vs_bigint_fold(spark):
    """The Arrow stage-1 nomination key (r13) must equal the exact
    BIGINT fold cast to double for every code row — the float64 matrix
    products are exact because every partial of Σc·q and Σc² is an
    integer < 2⁵³ — and return −2.0 for all-zero codes."""
    import math
    import random

    from epicsarchiver_spark.operators.similarity import _sq8_key_udf

    rng = random.Random(13)
    qq = [rng.randint(-127, 127) for _ in range(16)]
    codes = [[rng.randint(-127, 127) for _ in range(16)] for _ in range(63)]
    codes.append([0] * 16)  # the codeless sentinel row
    rows = [(i, ",".join(str(c) for c in cs)) for i, cs in enumerate(codes)]
    df = spark.createDataFrame(rows, "vec_id long, qvec string")
    got = {
        r.vec_id: r.k
        for r in df.select(
            "vec_id", _sq8_key_udf(qq)("qvec").alias("k")
        ).collect()
    }
    for i, cs in enumerate(codes):
        ssq = sum(c * c for c in cs)  # exact python ints
        want = (
            sum(c * q for c, q in zip(cs, qq)) / math.sqrt(float(ssq))
            if ssq > 0
            else -2.0
        )
        assert got[i] == want, (i, got[i], want)


def test_rake_prefers_multiword_terms(spark):
    """RAKE's point: words living in multi-word terms (high degree)
    outrank ubiquitous singletons, so the recurring compound phrase
    tops the list; stopwords never appear inside a phrase; empty/NULL
    docs are survivable."""
    from epicsarchiver_spark.operators.text_ops import rake_keyphrases

    docs = spark.createDataFrame(
        [
            (1, "linear regression of the data"),
            (2, "linear regression and data"),
            (3, "the data"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = rake_keyphrases(docs, k=10).collect()
    assert out[0].phrase == "linear regression" and out[0].n == 2
    joined = " | ".join(r.phrase for r in out)
    for sw in ("the", "and", "of"):
        assert f" {sw} " not in f" {joined} "
    # hand-check the top score: freq(linear)=2, deg(linear)=4 → 2.0;
    # same for regression → phrase score 4.0
    assert out[0].score == 4.0


def test_rake_max_phrase_len_caps_candidates(spark):
    from epicsarchiver_spark.operators.text_ops import rake_keyphrases

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon and alpha beta")],
        "doc_id long, text string",
    )
    phrases = {r.phrase for r in rake_keyphrases(docs, k=10, max_phrase_len=2).collect()}
    assert "alpha beta" in phrases
    assert all(len(p.split()) <= 2 for p in phrases)


def test_holt_series_are_independent_and_null_guarded(spark):
    rows = [("a", 0.0, 1.0), ("a", 1.0, 2.0), ("b", 0.0, None), ("b", 1.0, 9.0)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = {(r.pvname, r.time): r for r in holt_linear(df).collect()}
    assert got[("b", 0.0)].level is None  # all-NULL window → NULL row
    assert got[("b", 1.0)].level == 9.0   # singleton support after the NULL
    assert got[("a", 1.0)].trend == 1.0   # b's NULL never leaks into a
