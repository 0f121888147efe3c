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
