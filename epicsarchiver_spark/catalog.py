"""Table loaders over the driver-generated test data.

The driver provides TPC-H-ish tables plus ``events``/``documents``/
``embeddings`` parquet at ``/root/testdata/sf*`` (TESTDATA.md). This module
is the single place that knows their physical layout; everything above
works on DataFrames.

Domain mapping: the reference's time-series model is
``points(pv_id, time DOUBLE-epoch-seconds, value)`` with a ``pv`` catalog
(epicsarchiver/schema.py:6-23). The driver's ``events`` table plays the
role of the point stream — we derive a canonical *points view* where each
``(user_id, event_type)`` pair is one series (one "PV"), and ``time`` is
DOUBLE epoch seconds exactly as the reference stores it
(epicsarchiver/schema.py:21).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# runtime-settable confs the engine depends on — applied defensively so
# externally-created SparkSessions (e.g. the driver's) work too
_REQUIRED_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",  # events.ts is TIMESTAMP(NANOS)
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_conf(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONF.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # static conf on some deployment — builder must set it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table. Scans stay columnar; filters and
    column pruning push down to the parquet reader (verified in
    tests/test_plans.py)."""
    ensure_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def points_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical time-series *points* frame derived from ``events``.

    Mirrors the reference point-table shape ``(pv_id, time, value)``
    (epicsarchiver/schema.py:21-23): one series per (user_id, event_type),
    DOUBLE epoch-second timestamps, and the reference's string-typed value
    column alongside the numeric one (schema.py:22 stores VARCHAR; numeric
    semantics are re-imposed by casting, archiver.py:34-44).

    ``time`` is integer-µs epoch seconds as a double — the same µs-count
    division on both engines (``epoch_us(ts) / 1e6`` in the oracle), so
    values are bit-identical. The physical ``ts`` type is
    schema-adaptive: the driver has shipped both TIMESTAMP(NANOS)
    (surfacing as int64 ns under the nanosAsLong conf — ``ts div 1000``)
    and timestamp[us] (surfacing as TIMESTAMP_NTZ — ``unix_micros`` after
    a UTC-session cast, which keeps the naive value as the instant,
    matching DuckDB's epoch_us on naive timestamps).
    """
    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType.simpleString()
    if ts_type in ("bigint", "long"):
        t_us = F.expr("ts div 1000")
    else:
        t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        F.col("event_id"),
        F.col("user_id").cast("long").alias("pv_id"),
        F.concat_ws(":", F.lit("EV"), F.col("user_id"), F.col("event_type")).alias("pvname"),
        (t_us.cast("double") / F.lit(1e6)).alias("time"),
        F.col("value").cast("double").alias("value"),
        F.col("value").cast("string").alias("value_str"),
        F.col("event_type"),
        F.col("props"),
    )


# DuckDB-side equivalent of points_view, for composing oracle SQL.
POINTS_ORACLE_CTE = """
points AS (
  SELECT event_id,
         CAST(user_id AS BIGINT)                        AS pv_id,
         'EV:' || user_id || ':' || event_type          AS pvname,
         epoch_us(ts) / 1e6                             AS time,
         CAST(value AS DOUBLE)                          AS value,
         CAST(value AS VARCHAR)                         AS value_str,
         event_type,
         props
  FROM events
)
"""
