"""Plot-decimation cull — SURVEY §2 W7/A7.

The reference reduces >30 000-point series for rendering by keeping every
3rd point plus all points outside the [15, 85] percentile band, looping
until under the limit (epicsarchiver/web_utils.py:131-161, threshold
webapp.py:396-401). Extremes always survive.

Spark formulation: exact `percentile` aggregate (matches SQL
percentile_cont interpolation) broadcast back over the frame + a
row_number-modulo sample — two narrow shuffles, no driver iteration for
the single-pass case; the rarely-needed repeat loop stays in the driver
exactly as the reference does it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cull_pass(
    frame: DataFrame,
    value_col: str = "value",
    key: str = "pvname",
    stride: int = 3,
    pct_lo: float = 0.15,
    pct_hi: float = 0.85,
) -> DataFrame:
    """One cull pass: keep rows with value outside the per-series
    [pct_lo, pct_hi] percentile band, plus every `stride`-th row in time
    order (ref epicsarchiver/web_utils.py:140-158)."""
    bands = frame.groupBy(key).agg(
        F.percentile(value_col, F.lit(pct_lo)).alias("_lo"),
        F.percentile(value_col, F.lit(pct_hi)).alias("_hi"),
    )
    w = Window.partitionBy(key).orderBy("time", "event_id")
    return (
        frame.join(bands, key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") % stride == 0)
            | (F.col(value_col) < F.col("_lo"))
            | (F.col(value_col) > F.col("_hi"))
        )
        .drop("_lo", "_hi", "_rn")
    )


def cull_data(frame: DataFrame, max_points: int = 30_000, max_iter: int = 16, **kw) -> DataFrame:
    """W7 — iterate cull_pass until the frame is ≤ max_points (ref loop
    epicsarchiver/webapp.py:396-401). Each iteration shrinks ~3×, so the
    driver loop runs O(log) times; counts use the cached frame."""
    out = frame
    for _ in range(max_iter):
        if out.count() <= max_points:
            break
        out = cull_pass(out, **kw)
    return out
