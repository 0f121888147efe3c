"""Round-9 operator semantics: span-bounded exact-integer EWMA. The
gate ts_ewma carries the full-oracle check; these pin the recurrence
against a python mirror and the renormalization/smoothing edges."""

from __future__ import annotations

from epicsarchiver_spark.operators.timeseries import ewma

WT = [3**a * 4 ** (7 - a) for a in range(8)]  # age 0..7, α=1/4, span 8


def _mirror(values: list[float], quantum: float = 0.01) -> list[float]:
    qs = [round(v / quantum) for v in values]
    out = []
    for i in range(len(qs)):
        lo = max(0, i - 7)
        window = qs[lo : i + 1]  # ascending time
        L = len(window)
        num = sum(window[j] * WT[L - 1 - j] for j in range(L))
        den = sum(WT[:L])
        out.append(round(num / den * quantum, 6))
    return out


def test_ewma_matches_python_mirror(spark):
    vals = [5.0, 7.0, 7.0, 3.0, 10.0, 10.0, 10.0, 2.0, 2.0, 8.0, 1.0, 4.0]
    rows = [("pv", float(t), v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = [r.ewma for r in ewma(df).orderBy("time").collect()]
    assert got == _mirror(vals)


def test_ewma_partial_window_renormalizes(spark):
    """Pick 1 has only itself in the frame: ewma == value exactly; a
    constant series stays constant at every prefix length."""
    rows = [("pv", float(t), 42.0) for t in range(12)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = [r.ewma for r in ewma(df).orderBy("time").collect()]
    assert got == [42.0] * 12


def test_ewma_lags_step_change_and_converges(spark):
    """After a 0→100 step, the smoothed value rises monotonically toward
    100 and reaches it once the window holds only post-step samples."""
    vals = [0.0] * 8 + [100.0] * 12
    rows = [("pv", float(t), v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = [r.ewma for r in ewma(df).orderBy("time").collect()]
    post = got[8:]
    assert all(b > a for a, b in zip(post, post[1:8]))
    assert got[7] == 0.0 and got[-1] == 100.0  # window fully post-step
    assert 0.0 < post[0] < 100.0


def test_ewma_series_are_independent(spark):
    rows = [("a", 0.0, 10.0), ("a", 1.0, 20.0), ("b", 0.5, 99.0)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = {(r.pvname, r.time): r.ewma for r in ewma(df).collect()}
    assert got[("b", 0.5)] == 99.0  # b's window never sees a's points
    assert got[("a", 0.0)] == 10.0
    exp = round((2000 * WT[0] + 1000 * WT[1]) / (WT[0] + WT[1]) * 0.01, 6)
    assert got[("a", 1.0)] == exp


def test_ewma_null_values_dont_crash(spark):
    """collect_list skips NULLs, so a leading all-NULL support window
    gives an empty _arr; the unguarded fold would hit the descending
    sequence(1, 0) / element_at(_, 0) crash. NULL value → NULL ewma at
    that row when nothing earlier exists, and later rows smooth over the
    non-NULL support only."""
    rows = [("pv", 0.0, None), ("pv", 1.0, None), ("pv", 2.0, 8.0), ("pv", 3.0, 4.0)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = [r.ewma for r in ewma(df).orderBy("time").collect()]
    assert got[0] is None and got[1] is None
    assert got[2] == 8.0
    exp = round((400 * WT[0] + 800 * WT[1]) / (WT[0] + WT[1]) * 0.01, 6)
    assert got[3] == exp


def test_rollup_cube_levels_are_consistent(spark):
    """ROLLUP invariants: the grand total equals the sum of per-key
    subtotals equals the sum of detail rows, for n and sum_value."""
    from epicsarchiver_spark.operators.timeseries import rollup_cube

    rows = [
        ("a", 0.0, 1.5), ("a", 3600.0, 2.5), ("a", 90000.0, 3.0),
        ("b", 0.0, -1.0), ("b", 90000.0, 4.0),
    ]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = rollup_cube(df).collect()
    detail = [r for r in out if r.level == 0]
    per_key = [r for r in out if r.level == 1]
    total = [r for r in out if r.level == 3]
    assert len(total) == 1 and total[0].n == 5
    assert sum(r.n for r in per_key) == 5 == sum(r.n for r in detail)
    assert round(sum(r.sum_value for r in per_key), 6) == total[0].sum_value == 10.0
    assert total[0].min_value == -1.0 and total[0].max_value == 4.0
    # per-key rows carry NULL day; the grand total NULLs both
    assert all(r.day is None for r in per_key)
    assert total[0].pvname is None and total[0].day is None


def test_rollup_cube_is_one_pass(spark):
    """The three grouping sets must ride ONE Expand over ONE scan —
    not three separate aggregates."""
    from epicsarchiver_spark.operators.timeseries import rollup_cube
    from epicsarchiver_spark.plans import explain_str
    from tests.conftest import SF_ORACLE

    pts = spark.read.parquet(f"{SF_ORACLE}/events.parquet").selectExpr(
        "event_type", "unix_micros(cast(ts as timestamp)) / 1e6 as time", "value"
    )
    plan = explain_str(rollup_cube(pts, key="event_type"))
    assert "Expand" in plan
    # one scan NODE and one exchange NODE — "(n) Scan parquet" is the
    # formatted detail entry (the same node also appears in the tree)
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:1500]
    assert plan.count("Exchange (") == 1, plan[:1500]
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_seasonal_profile_bands_track_the_cycle(spark):
    """A clean daily cycle: each hour's band collapses onto the cycle
    value (p10 == p50 == p90) and every hour has the same count."""
    from epicsarchiver_spark.operators.timeseries import seasonal_profile

    rows = [
        ("pv", float(d * 86400 + h * 3600), float(h * 10))
        for d in range(4)
        for h in range(24)
    ]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = seasonal_profile(df).collect()
    assert len(out) == 24
    for r in out:
        assert r.n == 4
        assert r.p10 == r.p50 == r.p90 == r.hour * 10.0


def test_seasonal_profile_approx_dial(spark):
    """exact=False (the 100 TB path) swaps the sorting percentile for a
    t-digest sketch: same schema, near-identical bands on a smooth
    distribution, and the plan carries the approx aggregate instead of
    the exact one."""
    from epicsarchiver_spark.operators.timeseries import seasonal_profile
    from epicsarchiver_spark.plans import explain_str

    rows = [
        ("pv", float(d * 86400 + h * 3600 + s), float((d * 37 + s) % 100))
        for d in range(3)
        for h in range(4)
        for s in range(50)
    ]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    ex = {(r.pvname, r.hour): r for r in seasonal_profile(df).collect()}
    ap = {(r.pvname, r.hour): r for r in seasonal_profile(df, exact=False).collect()}
    assert set(ex) == set(ap)
    for k in ex:
        assert ex[k].n == ap[k].n
        for c in ("p10", "p50", "p90"):
            assert abs(getattr(ex[k], c) - getattr(ap[k], c)) <= 2.0, (k, c)
    plan = explain_str(seasonal_profile(df, exact=False))
    assert "approx_percentile" in plan
    assert "approx_percentile" not in explain_str(seasonal_profile(df))
