"""Plot-decimation cull — SURVEY §2 W7/A7.

The reference reduces >30 000-point series for rendering by keeping every
3rd point plus all points outside the [15, 85] percentile band, looping
until under the limit (epicsarchiver/web_utils.py:131-161, threshold
webapp.py:396-401). Extremes always survive.

Spark formulation: exact `percentile` aggregate (matches SQL
percentile_cont interpolation) broadcast back over the frame + a
row_number-modulo sample — two narrow shuffles, no driver iteration for
the single-pass case; the rarely-needed repeat loop stays in the driver
exactly as the reference does it, with each pass persisted so pass N
reads pass N-1's materialization rather than recomputing the whole
lineage from the scan (quadratic at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epicsarchiver_spark.operators.ordering import order_cols


def cull_pass(
    frame: DataFrame,
    value_col: str = "value",
    key: str = "pvname",
    stride: int = 3,
    pct_lo: float = 0.15,
    pct_hi: float = 0.85,
) -> DataFrame:
    """One cull pass: keep rows with value outside the per-series
    [pct_lo, pct_hi] percentile band, plus the reference's stride sample
    ``range(0, len-1, sample)`` (ref epicsarchiver/web_utils.py:140-158):
    0-based indices 0, stride, 2·stride, … with an EXCLUSIVE stop at the
    last index — the first point of every series always survives the
    sample; the last survives only via the percentile band."""
    bands = frame.groupBy(key).agg(
        F.percentile(value_col, F.lit(pct_lo)).alias("_lo"),
        F.percentile(value_col, F.lit(pct_hi)).alias("_hi"),
    )
    w = Window.partitionBy(key).orderBy(*order_cols(frame))
    n = Window.partitionBy(key)
    return (
        frame.join(bands, key)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        .filter(
            (((F.col("_rn") - 1) % stride == 0) & (F.col("_rn") < F.col("_n")))
            | (F.col(value_col) < F.col("_lo"))
            | (F.col(value_col) > F.col("_hi"))
        )
        .drop("_lo", "_hi", "_rn", "_n")
    )


def cull_data(frame: DataFrame, max_points: int = 30_000, max_iter: int = 16, **kw) -> DataFrame:
    """W7 — iterate cull_pass until the frame is ≤ max_points (ref loop
    epicsarchiver/webapp.py:396-401). Each iteration shrinks ~3×, so the
    driver loop runs O(log) times. Every pass is persisted and its
    predecessor unpersisted — without this, pass N's count() re-executes
    passes 1..N-1 from the raw scan (including their percentile
    aggregations), which is quadratic work in pass count and a real
    scale-killer at 100 TB. The returned frame is left persisted; callers
    that are done with it may ``unpersist()``."""
    from epicsarchiver_spark.operators.dedup import private_persist

    out = frame
    prev: DataFrame | None = None
    for _ in range(max_iter):
        if out.count() <= max_points:
            break
        # private: the pass frame derives from the caller's (typically
        # parquet-read) input — a session-global cache entry for it
        # would be served to later same-path plans (r13 hazard class)
        out = private_persist(cull_pass(out, **kw))
        if prev is not None:
            prev.unpersist()
        prev = out
    return out
