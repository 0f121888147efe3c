"""Cross-formulation consistency: independent formulations of the same
semantics must agree — the as-of window variant vs the union-tag-LOCF
join, and the lag deadband vs the sequential compressor under conditions
where they coincide."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from epicsarchiver_spark.operators.deadband import compress_sequential, deadband_lag
from epicsarchiver_spark.operators.timeseries import asof_join, value_at_time


def _random_points(spark, seed=7, n_series=6, n_rows=80):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for s in range(n_series):
        t = 0.0
        for _ in range(n_rows):
            t += rng.uniform(0.5, 30.0)
            rows.append((f"PV:{s}", t, round(rng.uniform(-50, 50), 3), eid))
            eid += 1
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["pvname", "time", "value", "event_id"])
    )


def test_asof_join_agrees_with_value_at_time(spark):
    pts = _random_points(spark)
    for t in (100.0, 555.5, 1200.0):
        via_window = {
            (r.pvname, r.time, r.value)
            for r in value_at_time(pts, t).select("pvname", "time", "value").collect()
        }
        probes = pts.select("pvname").distinct().withColumn("t", F.lit(t))
        via_join = {
            (r.pvname, r.asof_time, r.value)
            for r in asof_join(pts.select("pvname", "time", "value", "event_id"), probes)
            .filter(F.col("asof_time").isNotNull())
            .select("pvname", "asof_time", "value")
            .collect()
        }
        assert via_window == via_join, f"t={t}"


def test_lag_deadband_agrees_with_sequential_when_deadtime_zero(spark):
    """With deadtime=0 and strictly increasing times, 'compare to
    previous kept' and 'compare to previous row' coincide only when every
    change exceeds the band — use deadband=0 where both reduce to
    keep-on-change."""
    pts = _random_points(spark, seed=11)
    a = {
        (r.pvname, r.time)
        for r in deadband_lag(pts, deadtime=0.0, deadband=0.0).collect()
    }
    b = {
        (r.pvname, r.time)
        for r in compress_sequential(pts, deadtime=0.0, deadband=0.0).collect()
    }
    assert a == b
