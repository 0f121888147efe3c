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


# Data columns then partition columns in partition-spec order — the
# exact shape a live store read produces (write_points partitionBy
# ('run','bucket')). Caveat: parquet partition-value inference types a
# date-SHAPED run name (run=2026-07-31) as DATE on a live read; the
# canonical bootstrapped-empty frame declares string (rotation-style
# run_NNNNN names), so schema-sensitive callers should cast run to
# string as cmd_set_runinfo does.
POINTS_READ_SCHEMA = "pvname string, time double, value double, run string, bucket int"


def read_points(spark: SparkSession, path: str) -> DataFrame:
    """Read the store. A freshly-bootstrapped store (``pvarch init``)
    is an existing directory with no parquet yet — zero rows can't
    carry an inferred schema, so return an empty frame with the
    canonical layout instead; a nonexistent path still fails loudly
    (a typo'd --store must never read as an empty archive). The empty
    case rides the read's own failure (no extra FS round-trips on the
    every-query hot path)."""
    try:
        return spark.read.parquet(path)
    except Exception:
        jvm = spark._jvm
        P = jvm.org.apache.hadoop.fs.Path
        fs = P(path).getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(P(path)) and len(fs.listStatus(P(path))) == 0:
            return spark.createDataFrame([], POINTS_READ_SCHEMA)
        raise


def list_runs(spark: SparkSession, path: str) -> list[str]:
    """The store's run partitions, name-sorted (run names are zero-padded
    or date-stamped, so lexical order IS chronological order — the same
    invariant ``rotate_runs`` maintains)."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(path).getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(P(path)):
        return []
    return sorted(
        st.getPath().getName()[len("run="):]
        for st in fs.listStatus(P(path))
        if st.isDirectory() and st.getPath().getName().startswith("run=")
    )


def prune_runs(
    spark: SparkSession,
    path: str,
    keep_last: int | None = None,
    before: str | None = None,
) -> list[str]:
    """Retention: DROP old run partitions — the data-lifecycle op every
    archiver eventually needs (the reference rotates MySQL databases and
    ops teams drop old ones by hand; here a run is a partition
    directory, so retirement is an O(1)-metadata directory delete, no
    rewrite, no scan — the run-partitioned layout's whole point at
    100 TB). ``keep_last=N`` keeps the newest N runs by name;
    ``before='run_x'`` drops every run lexically below it. The newest
    run is never dropped (the open run must survive any retention
    setting). Returns the dropped run names.

    Safety rails: ``keep_last`` and ``before`` are mutually exclusive
    (silently ignoring one invites a false sense of what was retired);
    ``keep_last`` must be ≥ 1; and because "newest" is NAME order,
    ``keep_last`` refuses a store whose run names are heterogeneous
    (e.g. rotation's ``run_00001`` mixed with an ``import_ascii --run
    migrated`` run — lexical order is not chronological there, and a
    wrong guess deletes the newest data). For mixed-name stores use
    ``before``, which is an explicit caller-owned name bound."""
    if (keep_last is None) == (before is None):
        raise ValueError("pass exactly one of keep_last / before")
    if keep_last is not None and int(keep_last) < 1:
        raise ValueError("keep_last must be >= 1")
    runs = list_runs(spark, path)
    if not runs:
        return []
    victims: list[str] = []
    if keep_last is not None:
        import re as _re

        # Normalize ALL digit groups — keeping each group's WIDTH in the
        # stem. Zero-padded date stamps spanning a month/day boundary
        # (2026-07-31 vs 2026-08-01 → '#4-#2-#2' both) stay lexically
        # chronological and must pass; but equal-shape names with
        # UNPADDED digits ('2026-9-30' vs '2026-10-01') or a rotation
        # counter that outgrew its padding ('run_99999' vs 'run_100000')
        # are lexically misordered — width-sensitive stems differ there,
        # so the guard refuses instead of deleting the newest run.
        stems = {
            _re.sub(r"\d+", lambda m: f"#{len(m.group())}", r) for r in runs
        }
        if len(stems) > 1:
            raise ValueError(
                f"heterogeneous run names {sorted(stems)}: lexical order is "
                "not chronological — use before= with an explicit bound"
            )
        victims = runs[: -int(keep_last)]
    elif before is not None:
        victims = [r for r in runs[:-1] if r < before]
    if not victims:
        return []
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(path).getFileSystem(spark._jsc.hadoopConfiguration())
    for r in victims:
        fs.delete(P(f"{path}/run={r}"), True)
    return victims


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


def compact_store(
    spark: SparkSession,
    path: str,
    runs: list[str] | None = None,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> dict[str, int]:
    """Small-file compaction for the points store. Streaming append (S15)
    commits one parquet file per micro-batch per bucket — after months of
    ingest a run's bucket dir holds thousands of KB-sized files and the
    scan cost is dominated by file-open overhead, the classic streaming
    small-file problem. Compaction rewrites each (run, bucket) partition
    as ~size/target_file_bytes files, re-sorted by (pvname, time) so
    row-group min/max stats prune again (appends interleave series).

    Runs one partition-dir at a time with the same crash-safe two-rename
    swap as the cache upsert: rewrite to ``<dir>.tmp``, park the old dir at
    ``<dir>.bak``, swap, delete. A crash leaves the partition either old,
    old-at-.bak (restored by the next compaction pass), or new — never
    half-written, and readers of OTHER partitions are never disturbed.
    The hot (currently-appended) run should be skipped via ``runs``:
    compact only rotated runs, which are immutable.

    Returns {partition: files_after} for the partitions rewritten."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(path).getFileSystem(conf)

    result: dict[str, int] = {}
    for run_status in fs.listStatus(P(path)):
        run_name = run_status.getPath().getName()
        if not run_name.startswith("run="):
            continue
        if runs is not None and run_name.removeprefix("run=") not in runs:
            continue
        names = {st.getPath().getName() for st in fs.listStatus(run_status.getPath())}
        # recover a previous half-swap first: a parked .bak whose live dir
        # is missing goes back; stale .bak/.tmp next to a live dir are junk
        for name in sorted(names):
            if name.endswith(".bak"):
                base = name.removesuffix(".bak")
                if base not in names:
                    fs.rename(P(f"{path}/{run_name}/{name}"), P(f"{path}/{run_name}/{base}"))
                    names.add(base)
                else:
                    fs.delete(P(f"{path}/{run_name}/{name}"), True)
            elif name.endswith(".tmp"):
                fs.delete(P(f"{path}/{run_name}/{name}"), True)
        for bk_name in sorted(names):
            if not bk_name.startswith("bucket=") or bk_name.endswith((".bak", ".tmp")):
                continue
            part_dir = f"{path}/{run_name}/{bk_name}"
            files = [st for st in fs.listStatus(P(part_dir)) if st.isFile()]
            size = sum(st.getLen() for st in files)
            n_out = max(1, -(-size // target_file_bytes))
            if len(files) <= n_out:
                continue  # already compact
            (
                spark.read.parquet(part_dir)
                .repartition(int(n_out))
                .sortWithinPartitions("pvname", "time")
                .write.mode("overwrite")
                .parquet(part_dir + ".tmp")
            )
            fs.delete(P(part_dir + ".bak"), True)
            fs.rename(P(part_dir), P(part_dir + ".bak"))
            fs.rename(P(part_dir + ".tmp"), P(part_dir))
            fs.delete(P(part_dir + ".bak"), True)
            result[f"{run_name}/{bk_name}"] = int(n_out)
    return result


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


def write_points_bucketed(
    points: DataFrame,
    table: str,
    path: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Hive-bucketed variant of the store — the SHUFFLE-FREE lane for
    per-series operators. ``bucketBy(n, pvname).sortBy(pvname, time)``
    records the hash distribution in the catalog, so every downstream
    ``groupBy("pvname")`` / ``Window.partitionBy("pvname")`` is
    satisfied by the SCAN's layout and Catalyst plans NO Exchange — at
    100 TB that deletes the single biggest shuffle in the per-series
    operator family (deadband, compression report, latest, as-of). The
    directory-partitioned ``write_points`` store keeps the same key
    bucketing but only as a pruning layout; this lane additionally
    registers it as table metadata the planner can consume (the
    SCALE.md "a future bucketBy layout makes them shuffle-free" note,
    implemented). An Iceberg/Delta deployment gets the same effect from
    a sorted bucket transform.

    ``path`` makes it an external table (tests point it at a tmp dir);
    the catalog entry is what carries the bucket spec either way."""
    w = (
        points.repartition(F.col("pvname"))
        .sortWithinPartitions("pvname", "time")
        .write.mode(mode)
        .bucketBy(n_buckets, "pvname")
        .sortBy("pvname", "time")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_points_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read the bucketed store THROUGH the catalog — reading the parquet
    path directly would lose the bucket spec and reintroduce the
    shuffle."""
    return spark.table(table)


def _day_col():
    return F.date_format(F.timestamp_seconds(F.col("time")), "yyyy-MM-dd").alias(
        "day"
    )


def rollup_partials(
    points: DataFrame,
    key: str = "pvname",
    quantum: float = 0.01,
    run_col: str | None = None,
) -> DataFrame:
    """Per-(key, day) MERGEABLE daily-rollup partials — ``(key, day, n,
    sum_q, min_q, max_q)`` with the value moments as exact integer
    ``quantum`` units. Mergeable means a union of partials from any
    run split re-aggregates (sum n, sum sum_q, min min_q, max max_q)
    to exactly the one-shot answer — the property that makes the
    artifact MAINTAINABLE: each new run appends its own partials and
    :func:`merge_rollup` folds them in without touching old points.

    ``run_col`` keeps the partials SPLIT by that column (appended
    after the moments, partition-spec position) — the per-run artifact
    layout ``pvarch rollup`` maintains, where refreshing a run is a
    directory swap and :func:`read_rollup`'s merge-on-read folds the
    run split back out."""
    q = F.round(F.col("value") / quantum).cast("long")
    keys = [F.col(key), _day_col()] + (
        [F.col(run_col)] if run_col is not None else []
    )
    agg = points.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sum_q"),
        F.min(q).alias("min_q"),
        F.max(q).alias("max_q"),
    )
    if run_col is not None:
        # data cols first, partition col last — the on-disk shape
        return agg.select(
            key, "day", "n", "sum_q", "min_q", "max_q", run_col
        )
    return agg


def merge_rollup(partials: DataFrame) -> DataFrame:
    """Fold unioned rollup partials (existing artifact + a new run's
    :func:`rollup_partials`) back to one row per (key, day)."""
    key = partials.columns[0]
    return partials.groupBy(key, "day").agg(
        F.sum("n").alias("n"),
        F.sum("sum_q").alias("sum_q"),
        F.min("min_q").alias("min_q"),
        F.max("max_q").alias("max_q"),
    )


def write_rollup(
    points: DataFrame,
    path: str,
    key: str = "pvname",
    quantum: float = 0.01,
    mode: str = "overwrite",
) -> None:
    """Materialize the daily-rollup artifact — the long-horizon plot
    lane: a year-scale dashboard reads (key × days) rows from here
    instead of scanning raw points (the reduced-data store every
    production archiver grows; the reference serves year plots from
    raw, epicsarchiver/web_utils.py, which is exactly what stops
    scaling first). Bytes per series-day; rebuilt per release or
    maintained incrementally (``mode="append"`` a new run's
    :func:`rollup_partials`, then compact with :func:`merge_rollup` —
    appends never reread old points)."""
    rollup_partials(points, key=key, quantum=quantum).write.mode(mode).parquet(
        path
    )


def read_rollup(
    spark: SparkSession, path: str, quantum: float = 0.01
) -> DataFrame:
    """Finalized rollup from the artifact: merge any appended partials,
    then ``(key, day, n, sum_value, min_value, max_value)`` — the
    :func:`merge_rollup` pass makes reads correct even before a
    compaction has folded freshly-appended run partials."""
    m = merge_rollup(spark.read.parquet(path))
    key = m.columns[0]
    return m.select(
        key,
        "day",
        "n",
        F.round(F.col("sum_q").cast("double") * F.lit(quantum), 2).alias(
            "sum_value"
        ),
        F.round(F.col("min_q").cast("double") * F.lit(quantum), 2).alias(
            "min_value"
        ),
        F.round(F.col("max_q").cast("double") * F.lit(quantum), 2).alias(
            "max_value"
        ),
    )
