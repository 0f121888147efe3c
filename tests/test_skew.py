"""Salted aggregation must be result-identical to the direct aggregate."""

from __future__ import annotations

import pandas as pd

from epicsarchiver_spark.operators.skew import skew_safe_counts
from epicsarchiver_spark.operators.timeseries import minmax_times


def test_skew_safe_counts_matches_direct(spark):
    # one hot key (90% of rows) + several cold ones
    rows = [("HOT", float(i), float(i % 5)) for i in range(9000)]
    rows += [(f"COLD:{j}", float(i), 1.0) for j in range(10) for i in range(100)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["pvname", "time", "value"]))
    df = df.withColumn("event_id", df["time"].cast("long"))

    direct = {
        (r.pvname): (r.t_first, r.t_last, r.n_points) for r in minmax_times(df).collect()
    }
    salted = {
        (r.pvname): (r.t_first, r.t_last, r.n_points)
        for r in skew_safe_counts(df).collect()
    }
    assert direct == salted
    assert salted["HOT"] == (0.0, 8999.0, 9000)
