"""Batch deadtime/deadband change-compression — SURVEY §2 W1/W2 (batch
analogs) — plus the exact sequential reference semantics.

The reference's archiver records a point only when (a) enough time passed
since the last *saved* point (deadtime, epicsarchiver/archiver.py:390-414)
and (b) the value moved more than deadband from the last *saved* value
(archiver.py:392-398). Bursts inside the deadtime window collapse to their
final value, which keeps its original timestamp ("limbo",
archiver.py:404-414; doc/setup.rst:71-85).

Two formulations:

- ``deadband_lag`` — the *declarative* per-row variant: compare against the
  previous row (lag window). Fully SQL-expressible → oracle-checked. This
  is what you want for bulk re-compression where "previous row" ≈ "last
  saved" (true when most rows are kept).

- ``compress_sequential`` — the *exact* reference semantics; inherently a
  sequential scan per series (each decision depends on the previous
  *kept* row), implemented with applyInPandas keyed by series: state never
  leaves one partition, vectorized per series, linear time. This is also
  the batch twin used to verify the streaming operator.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epicsarchiver_spark.operators.ordering import order_cols


def deadband_lag(
    points: DataFrame,
    deadtime: float,
    deadband: float,
    key: str = "pvname",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """W2 (batch/lag analog) — keep a row iff it moved ≥ deadband from the
    previous row's value OR ≥ deadtime seconds passed; first row per series
    always kept. Declarative lag-window formulation (one shuffle on the
    series key)."""
    w = Window.partitionBy(key).orderBy(*order_cols(points, time_col))
    prev_t = F.lag(time_col).over(w)
    prev_v = F.lag(value_col).over(w)
    keep = (
        prev_t.isNull()
        | (F.col(time_col) - prev_t >= deadtime)
        | (F.abs(F.col(value_col) - prev_v) > deadband)
    )
    return points.withColumn("_keep", keep).filter(F.col("_keep")).drop("_keep")


def compress_reference(
    rows: Iterable[tuple[float, float]], deadtime: float, deadband: float
) -> list[tuple[float, float]]:
    """Pure-Python exact reference semantics on one series (time-sorted
    (t, v) rows) — the executable spec for tests and the pandas kernel.

    Mirrors the EXECUTED behavior of epicsarchiver/archiver.py:386-414
    (not just doc/setup.rst): a point saves immediately only when deadtime
    has passed since the last save AND the move exceeds deadband; every
    other change newer than 1 ms goes into the per-PV "limbo" slot —
    including sub-deadband moves, because the reference's ``elif ts >
    0.001 + last_ts`` limbo branch runs whenever ``do_save`` is false for
    EITHER reason. The limbo entry (most recent change, original
    timestamp) is archived once wall-clock passes ``last_ts + deadtime``
    (archiver.py:410-414) — so deadband *delays* small changes by up to
    one deadtime, it never suppresses them — and is discarded if a direct
    save happens first (archiver.py:401-403 pops limbo). In this batch
    twin the wall clock is advanced by event time: a pending entry flushes
    when a later event arrives past the window, and the tail flushes at
    end of stream. Saves update last_ts/last_value to the saved row
    (archiver.py:455-456), so the window restarts from a flushed limbo
    entry's original timestamp.
    """
    out: list[tuple[float, float]] = []
    last_t = last_v = None
    pending: tuple[float, float] | None = None
    for t, v in rows:
        if last_t is None:
            out.append((t, v))
            last_t, last_v = t, v
            continue
        if pending is not None and t > last_t + deadtime:
            out.append(pending)
            last_t, last_v = pending
            pending = None
        if t > last_t + deadtime and abs(v - last_v) > deadband:
            out.append((t, v))
            last_t, last_v = t, v
            pending = None
        elif t > last_t + 0.001:
            pending = (t, v)
    if pending is not None:
        out.append(pending)
    return out


def compress_sequential(
    points: DataFrame,
    deadtime: float,
    deadband: float,
    key: str = "pvname",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """W1/W2 exact semantics, distributed per series via applyInPandas.
    Each series is independent → perfect parallelism across series; within
    a series the scan is inherently sequential (every keep/drop depends on
    the last kept row), so a window/lag formulation cannot express it."""
    schema = f"{key} string, {time_col} double, {value_col} double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        kept = compress_reference(
            list(zip(pdf[time_col], pdf[value_col])), deadtime, deadband
        )
        return pd.DataFrame(
            {
                key: pdf[key].iloc[0],
                time_col: [t for t, _ in kept],
                value_col: [v for _, v in kept],
            }
        )

    return (
        points.select(key, time_col, value_col)
        .groupBy(key)
        .applyInPandas(kernel, schema=schema)
    )


def heartbeat_fill(
    points: DataFrame,
    max_silence: float = 86_400.0,
    key: str = "pvname",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """W3 (batch analog) — guarantee ≥1 point per series per `max_silence`
    seconds by repeating the held value: for every gap > max_silence
    between consecutive kept points, insert synthetic rows at
    prev_t + i*max_silence carrying the held value
    (ref epicsarchiver/archiver.py:419-440 forced heartbeat; jitter is an
    ingest-side anti-thundering-herd concern, dropped in batch).
    sequence() generates fill indices JVM-side — no driver loop; the
    index form (1..ceil(gap/ms)-1, integral sequence) is reproducible in
    ANSI SQL, unlike a double-stepped sequence."""
    w = Window.partitionBy(key).orderBy(*order_cols(points, time_col))
    nxt = F.lead(time_col).over(w)
    gaps = points.withColumn("_next_t", nxt).filter(
        F.col("_next_t").isNotNull() & (F.col("_next_t") - F.col(time_col) > max_silence)
    )
    n_fill = (
        F.ceil((F.col("_next_t") - F.col(time_col)) / F.lit(max_silence)).cast("int")
        - F.lit(1)
    )
    fills = gaps.select(
        key,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_fill),
                lambda i: F.col(time_col) + i.cast("double") * F.lit(max_silence),
            )
        ).alias(time_col),
        F.col(value_col),
        F.lit(True).alias("is_heartbeat"),
    )
    return (
        points.select(key, time_col, value_col, F.lit(False).alias("is_heartbeat"))
        .unionByName(fills.select(key, time_col, value_col, "is_heartbeat"))
    )
