"""Semantics tests for the clickstream analytics operators
(operators/events.py) on hand-built frames — the ordering / null edge
cases the sf parity data cannot isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from epicsarchiver_spark.operators import events as ev


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts double, event_type string, props string"
    )


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 converts fully in order
        (1, 10.0, "view", None),
        (1, 20.0, "click", None),
        (1, 30.0, "purchase", None),
        # u2's only click precedes their first view -> stops at view
        (2, 50.0, "click", None),
        (2, 60.0, "view", None),
        (2, 40.0, "purchase", None),
        # u3 views only
        (3, 5.0, "view", None),
        # u4 never views: purchase without the first step counts nowhere
        (4, 1.0, "purchase", None),
    ]
    out = {
        r.step_name: r.n_users
        for r in ev.funnel(
            _events(spark, rows), ("view", "click", "purchase")
        ).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_uses_first_qualifying_event(spark):
    # the SECOND click (after the view) must qualify even though the
    # first click is too early
    rows = [
        (1, 10.0, "view", None),
        (1, 5.0, "click", None),
        (1, 15.0, "click", None),
        (1, 12.0, "purchase", None),  # before the qualifying click
    ]
    out = {
        r.step_name: r.n_users
        for r in ev.funnel(
            _events(spark, rows), ("view", "click", "purchase")
        ).collect()
    }
    assert out == {"view": 1, "click": 1, "purchase": 0}


def test_retention_offsets(spark):
    wk = ev.WEEK_S
    rows = [
        (1, 0.5 * wk, "view", None),  # cohort 0
        (1, 0.9 * wk, "view", None),  # same week, counted once
        (1, 2.5 * wk, "view", None),  # offset 2
        (2, 1.5 * wk, "view", None),  # cohort 1
    ]
    out = {
        (r.cohort_wk, r.week_offset): r.n_users
        for r in ev.retention_cohorts(_events(spark, rows)).collect()
    }
    assert out == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_props_rollup_null_and_malformed(spark):
    rows = [
        (1, 1.0, "click", '{"k": 10}'),
        (2, 2.0, "click", '{"k": 30}'),
        (3, 3.0, "click", None),  # null props
        (4, 4.0, "click", '{"j": 5}'),  # missing key
        (5, 5.0, "click", "not json"),  # malformed
    ]
    r = ev.props_rollup(_events(spark, rows)).collect()[0]
    assert (r.n_events, r.n_missing, r.avg_k, r.max_k) == (5, 3, 20.0, 30.0)


def test_rolling_dau_window(spark):
    d = ev.DAY_S
    rows = [
        (1, 0.1 * d, "view", None),
        (2, 0.2 * d, "view", None),  # day 0: dau 2
        (1, 1.1 * d, "view", None),  # day 1: dau 1
        (1, 9.0 * d, "view", None),  # day 9: window excludes days 0-2
    ]
    out = {r.day: (r.dau, r.dau_roll_avg) for r in ev.rolling_dau(_events(spark, rows)).collect()}
    assert out == {0: (2, 2.0), 1: (1, 1.5), 9: (1, 1.0)}


def test_gopher_rules_flags(spark):
    from epicsarchiver_spark.operators.text_ops import gopher_rules

    good = "the " + " ".join(f"word{i}" for i in range(30))
    short = "the cat sat"
    symbols = "the " + " ".join("####" for _ in range(30))
    nostop = " ".join(f"word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, nostop)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[1].keep
    assert not out[2].keep  # too few words
    assert not out[3].keep  # symbol ratio over cap
    assert not out[4].keep and out[4].n_stopwords == 0


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, pvname string, time double, value double"
    )


def test_time_weighted_avg_with_seed(spark):
    from epicsarchiver_spark.operators.timeseries import time_weighted_avg

    rows = [
        # seed before the window holds value 10 until t=40
        (1, "a", 5.0, 10.0),
        (2, "a", 40.0, 30.0),
        # window [20, 60): 10 for 20 s, 30 for 20 s -> twa 20
        (3, "b", 30.0, 8.0),  # no seed: coverage starts at first point
    ]
    out = {r.pvname: r for r in time_weighted_avg(_pts(spark, rows), 20.0, 60.0).collect()}
    assert out["a"].coverage_s == 40.0 and out["a"].twa == 20.0
    assert out["b"].coverage_s == 30.0 and out["b"].twa == 8.0


def test_time_weighted_avg_lookback_prunes_seed(spark):
    from epicsarchiver_spark.operators.timeseries import time_weighted_avg

    rows = [(1, "a", 5.0, 10.0)]  # only a stale seed outside lookback
    out = time_weighted_avg(_pts(spark, rows), 20.0, 60.0, lookback=10.0).collect()
    assert out == []  # seed pruned -> no coverage


def test_decimate_minmax_envelope(spark):
    from epicsarchiver_spark.operators.timeseries import decimate_minmax

    rows = [
        (1, "a", 1.0, 5.0),
        (2, "a", 2.0, 9.0),
        (3, "a", 3.0, 1.0),
        (4, "a", 4.0, 7.0),  # bucket [0,10): first 5, min 1, max 9, last 7
        (5, "a", 15.0, 2.0),  # bucket [10,20)
        (6, "a", 25.0, 3.0),  # outside [0,20) -> dropped
    ]
    out = {
        r.bucket_start: r
        for r in decimate_minmax(_pts(spark, rows), 0.0, 20.0, n_buckets=2).collect()
    }
    b0 = out[0.0]
    assert (b0.n_events, b0.v_first, b0.v_min, b0.v_max, b0.v_last) == (4, 5.0, 1.0, 9.0, 7.0)
    assert out[10.0].n_events == 1 and 20.0 not in out
