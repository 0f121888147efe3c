"""The points store — the engine's 100 TB storage layout.

Reference layout: one archive *database per run*, 128 hash-bucket tables
per database (epicsarchiver/schema.py:21-23, cache.py:82-144), plus a
zarr columnar bolt-on (archiver.py:542-608). Engine layout: ONE parquet
dataset,

    points/run=<run>/bucket=<xxhash64(pvname) % N>/*.parquet

- ``run`` partition column  → the reference's run rotation becomes a
  metadata no-op; time-range queries prune runs via the runs dimension
  (J2 interval join done driver-side against a tiny table).
- ``bucket`` partition column → the reference's 128-table fan-out
  ("eliminating more than 99% of the data", doc/setup.rst:238-241):
  a single-series query scans 1/N of each run. Within a file, rows are
  sorted by (pvname, time) so parquet row-group min/max stats prune
  further and range reads are sequential.
- At cluster scale the same layout bucket-aligns the shuffle for
  per-series windows; local tests keep N small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 128


def bucket_of(name_col, n_buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64(name_col), F.lit(n_buckets)).cast("int")


def write_points(
    points: DataFrame,
    path: str,
    run: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "append",
) -> None:
    """S10/S15 — append a (pvname, time, value, ...) frame to the store.
    Adds run/bucket partition columns and sorts within partitions by
    (pvname, time) for row-group stat pruning + sequential range reads."""
    out = points.withColumn("bucket", bucket_of(F.col("pvname"), n_buckets))
    if run is not None:
        out = out.withColumn("run", F.lit(run))
    (
        out.repartition("run", "bucket")
        .sortWithinPartitions("pvname", "time")
        .write.mode(mode)
        .partitionBy("run", "bucket")
        .parquet(path)
    )


def read_points(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def series_filter(
    points: DataFrame, pvname: str, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Filter to one series with bucket pruning: the bucket equality is on
    a partition column (pruned at planning time), the pvname equality is
    pushed into the scan."""
    return points.filter(
        (F.col("bucket") == bucket_of(F.lit(pvname), n_buckets))
        & (F.col("pvname") == pvname)
    )


def runs_for_window(runs: DataFrame, t0: float, t1: float) -> DataFrame:
    """J2 — interval join: runs whose [start_time, stop_time] overlaps
    [t0, t1] (ref epicsarchiver/archiver.py:104-110 dbs_for_time).
    The runs dimension is tiny — collect + literal IN-list turns run
    pruning into static partition pruning."""
    return runs.filter((F.col("stop_time") > t0) & (F.col("start_time") < t1))


def range_read_store(
    spark: SparkSession,
    path: str,
    pvname: str,
    t0: float,
    t1: float,
    runs: DataFrame | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """get_data against the store: bucket-pruned, run-pruned, stat-pruned
    single-series range scan (the §3.2 read path, minus the early-point
    seed which operators.timeseries.get_data adds)."""
    pts = read_points(spark, path)
    pts = series_filter(pts, pvname, n_buckets)
    if runs is not None:
        run_names = [r.db for r in runs_for_window(runs, t0, t1).collect()]
        pts = pts.filter(F.col("run").isin(run_names))
    return pts.filter(F.col("time").between(t0, t1))
