"""Points-store layout tests: write → read round-trip, bucket/run
partition pruning visible in the physical plan, and time-predicate
pushdown — the 100 TB design assertions."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epicsarchiver_spark.plans import (
    pushed_filters,
    read_schema_columns,
    scan_partition_filters,
)
from epicsarchiver_spark.sources.points_store import (
    bucket_of,
    range_read_store,
    read_points,
    runs_for_window,
    series_filter,
    write_points,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("points") / "store")
    rows = []
    for run_i, trange in ((1, range(0, 1000, 10)), (2, range(1000, 2000, 10))):
        for pv in ("PV:A", "PV:B", "PV:C", "PV:D"):
            rows += [(pv, float(t), float(t % 13)) for t in trange]
        pdf = pd.DataFrame(rows, columns=["pvname", "time", "value"])
        write_points(spark.createDataFrame(pdf), path, run=f"run_{run_i:03d}", n_buckets=N_BUCKETS)
        rows = []
    return path


def test_round_trip(spark, store):
    pts = read_points(spark, store)
    assert pts.count() == 800
    assert {r.run for r in pts.select("run").distinct().collect()} == {"run_001", "run_002"}


def test_series_filter_prunes_bucket_partitions(spark, store):
    pts = read_points(spark, store)
    q = series_filter(pts, "PV:A", N_BUCKETS)
    pf = scan_partition_filters(q)
    assert any("bucket" in f for f in pf), f"no bucket partition filter in {pf}"
    got = q.select("pvname").distinct().collect()
    assert [r.pvname for r in got] == ["PV:A"]


def test_time_filter_pushed_to_scan(spark, store):
    pts = read_points(spark, store)
    q = pts.filter(F.col("time").between(100.0, 200.0)).select("pvname", "time")
    filters = pushed_filters(q)
    assert any("time" in f for f in filters), f"time not pushed: {filters}"


def test_column_pruning(spark, store):
    pts = read_points(spark, store)
    q = pts.select("pvname").distinct()
    cols = read_schema_columns(q)
    assert "value" not in cols and "time" not in cols, f"over-read: {cols}"


def test_range_read_with_run_pruning(spark, store):
    runs = spark.createDataFrame(
        pd.DataFrame(
            {
                "db": ["run_001", "run_002"],
                "start_time": [0.0, 1000.0],
                "stop_time": [1000.0, 2147483647.0],
            }
        )
    )
    q = range_read_store(spark, store, "PV:B", 100.0, 500.0, runs=runs, n_buckets=N_BUCKETS)
    rows = q.collect()
    assert len(rows) == 41  # t = 100,110,...,500
    assert {r.run for r in rows} == {"run_001"}
    pf = scan_partition_filters(q)
    assert any("run" in f for f in pf) and any("bucket" in f for f in pf), pf


def test_runs_interval_join():
    import pandas as pd

    from epicsarchiver_spark.session import get_spark

    spark = get_spark("t")
    runs = spark.createDataFrame(
        pd.DataFrame(
            {
                "db": ["r1", "r2", "r3"],
                "start_time": [0.0, 100.0, 200.0],
                "stop_time": [100.0, 200.0, 300.0],
            }
        )
    )
    got = {r.db for r in runs_for_window(runs, 150.0, 250.0).collect()}
    assert got == {"r2", "r3"}


def test_bucket_of_is_deterministic(spark):
    df = spark.range(1).select(
        bucket_of(F.lit("PV:A"), 8).alias("b1"), bucket_of(F.lit("PV:A"), 8).alias("b2")
    )
    r = df.head()
    assert r.b1 == r.b2 and 0 <= r.b1 < 8


def test_compact_store_merges_small_files(spark, tmp_path):
    """N micro-batch appends → N files per (run,bucket); compaction folds
    them to ~1 without changing a row, skips the hot run when excluded,
    and recovers a partition parked at .bak by a crashed previous pass."""
    import glob
    import os

    from epicsarchiver_spark.sources.points_store import (
        compact_store,
        read_points,
        write_points,
    )

    path = str(tmp_path / "store")
    for i in range(6):  # six tiny appends = six files per partition
        df = spark.createDataFrame(
            [("PV:a", float(i * 10 + j), float(j)) for j in range(4)],
            "pvname string, time double, value double",
        )
        write_points(df, path, run="run_001", n_buckets=4)
    before = read_points(spark, path)
    rows_before = sorted((r.pvname, r.time, r.value) for r in before.collect())
    part = glob.glob(f"{path}/run=run_001/bucket=*")[0]
    assert len(glob.glob(f"{part}/part-*.parquet")) == 6

    done = compact_store(spark, path)
    assert done and all(n == 1 for n in done.values())
    assert len(glob.glob(f"{part}/part-*.parquet")) == 1
    rows_after = sorted(
        (r.pvname, r.time, r.value) for r in read_points(spark, path).collect()
    )
    assert rows_after == rows_before

    # excluded run untouched
    write_points(
        spark.createDataFrame([("PV:a", 1.0, 1.0)], "pvname string, time double, value double"),
        path, run="run_002", n_buckets=4,
    )
    assert compact_store(spark, path, runs=["run_999"]) == {}

    # crash recovery: partition parked at .bak, live dir missing
    os.rename(part, part + ".bak")
    compact_store(spark, path, runs=["run_001"])
    assert os.path.isdir(part) and not os.path.exists(part + ".bak")
    rows_rec = sorted(
        (r.pvname, r.time, r.value)
        for r in read_points(spark, path).filter(F.col("run") == "run_001").collect()
    )
    assert rows_rec == rows_before


def test_bucketed_store_removes_per_series_exchange(spark, tmp_path):
    """The bucketBy lane's whole point: a per-series window AND a
    per-series aggregate over the catalog-read table must plan with ZERO
    Exchange — the scan's bucket layout satisfies the distribution
    (SCALE.md's 'a future bucketBy layout makes them shuffle-free',
    implemented). Reading the same files as plain parquet loses the
    bucket spec and reintroduces the shuffle, so both paths are pinned."""
    from pyspark.sql import Window

    from epicsarchiver_spark.plans import explain_str
    from epicsarchiver_spark.sources.points_store import (
        read_points_bucketed,
        write_points_bucketed,
    )

    pts = spark.createDataFrame(
        [(f"PV:{i % 7}", float(t), float(i)) for i, t in enumerate(range(200))],
        "pvname string, time double, value double",
    )
    table = "pvarch_test_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_points_bucketed(pts, table, path=str(tmp_path / "bucketed"), n_buckets=8)
    try:
        t = read_points_bucketed(spark, table)

        w = Window.partitionBy("pvname").orderBy("time")
        windowed = t.select("pvname", "time", F.lag("value").over(w).alias("prev"))
        plan_w = explain_str(windowed)
        assert "Exchange" not in plan_w, plan_w[:2000]

        agged = t.groupBy("pvname").agg(F.max_by("value", F.col("time")).alias("v"))
        plan_a = explain_str(agged)
        assert "Exchange" not in plan_a, plan_a[:2000]

        # same rows, read as bare parquet: the bucket spec is catalog
        # metadata, so the shuffle comes back — the pin that explains WHY
        # read_points_bucketed goes through spark.table()
        bare = spark.read.parquet(str(tmp_path / "bucketed"))
        plan_bare = explain_str(
            bare.groupBy("pvname").agg(F.max_by("value", F.col("time")).alias("v"))
        )
        assert "Exchange" in plan_bare

        # and the data survives the round trip
        assert t.count() == 200
        got = {r.pvname: r.v for r in agged.collect()}
        assert got["PV:0"] == 196.0  # last multiple of 7 below 200 is 196
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_read_family_plan_shapes(spark, tmp_path):
    """VERDICT r7 #7 — the rest of the high-traffic per-series read
    family over the bucketed catalog table: get_data (range + as-of
    seed) and sessionize plan with ZERO Exchange; locf_grid plans with
    exactly ONE (the points∪grid-probe merge — the union of a bucketed
    scan with a generated frame has no recognizable distribution), with
    the keys-distinct satisfied by the scan."""
    from epicsarchiver_spark.operators import timeseries
    from epicsarchiver_spark.plans import explain_str
    from epicsarchiver_spark.sources.points_store import (
        read_points_bucketed,
        write_points_bucketed,
    )

    pts = spark.createDataFrame(
        [
            (i, f"PV:{i % 5}", float(t), float(i))
            for i, t in enumerate(range(0, 4000, 20))
        ],
        "event_id long, pvname string, time double, value double",
    )
    table = "pvarch_test_bucketed_family"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_points_bucketed(pts, table, path=str(tmp_path / "bucketed_fam"), n_buckets=4)
    try:
        t = read_points_bucketed(spark, table)

        gd = timeseries.get_data(t, 1000.0, 2000.0)
        assert "Exchange" not in explain_str(gd), "get_data must be shuffle-free"

        ses = timeseries.sessionize(t, gap_s=100.0)
        assert "Exchange" not in explain_str(ses), "sessionize must be shuffle-free"

        ew = timeseries.ewma(t)
        assert "Exchange" not in explain_str(ew), "ewma must be shuffle-free"

        locf = timeseries.locf_grid(t, 1000.0, 2000.0, 250.0)
        plan = explain_str(locf)
        # one Exchange NODE — "Exchange (n)" is the tree entry; the same
        # node repeats in the formatted detail section as "(n) Exchange"
        assert plan.count("Exchange (") == 1, plan[:2000]

        # the plans still compute the right thing
        assert gd.count() > 0
        assert ses.count() == 5  # one session per series at this spacing
        assert locf.filter(F.col("value").isNull()).count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_rollup_artifact_is_mergeable_and_incremental(spark, tmp_path):
    """The daily-rollup artifact: partials from any run split union +
    merge to exactly the one-shot rollup — appends never reread old
    points (the merge_components cadence for the plot lane)."""
    import pandas as pd

    from epicsarchiver_spark.sources.points_store import (
        read_rollup,
        rollup_partials,
        write_rollup,
    )

    rows = []
    for pv in ("R:a", "R:b"):
        for i in range(200):
            rows.append((pv, 86_400.0 * (i % 7) + i, round((i % 13) * 1.5, 2)))
    pdf = pd.DataFrame(rows, columns=["pvname", "time", "value"])
    df = spark.createDataFrame(pdf)

    one_shot = str(tmp_path / "one")
    write_rollup(df, one_shot)
    want = sorted(map(tuple, read_rollup(spark, one_shot).collect()))

    # incremental: first half overwrite, second half APPEND partials
    inc = str(tmp_path / "inc")
    half = df.filter("time < 300")
    rest = df.filter("time >= 300")
    write_rollup(half, inc)
    rollup_partials(rest).write.mode("append").parquet(inc)
    got = sorted(map(tuple, read_rollup(spark, inc).collect()))
    assert got == want
    # n totals match the raw row count
    assert sum(r[2] for r in got) == 400
