"""Streaming ingest pipeline — SURVEY §2.9 / §3.1.

The reference runs two daemons around a MySQL mailbox: a cache process
upserting latest values (epicsarchiver/cache.py:433-462) and an archiver
applying deadtime/deadband/limbo compression before appending points
(epicsarchiver/archiver.py:362-472). Here both collapse into Structured
Streaming queries over one event stream:

- ``compressed_stream``   : the stateful deadtime/deadband/limbo operator
  (W1/W2) via ``applyInPandasWithState`` keyed by series — Spark has no
  built-in debounce, this is the one genuinely custom operator.
- ``latest_value_query``  : last-per-key cache upsert via ``foreachBatch``
  merge into a parquet "cache" table (S14).
- ``archive_query``       : compressed stream appended to the points
  store (S15).

Semantics contract: on the same finite event set, ``compressed_stream``
output == ``operators.deadband.compress_reference`` (the executable spec);
the pending ("limbo") tail flushes on processing-time timeout, or when a
later event arrives past the deadtime window (tested in
tests/test_streaming.py with sentinel tail events).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("pvname", StringType()),
        StructField("time", DoubleType()),
        StructField("value", DoubleType()),
    ]
)

OUT_SCHEMA = EVENT_SCHEMA

# state: last emitted (t, v) + pending limbo entry (t, v) — exactly the
# per-PV fields the reference keeps (epicsarchiver/archiver.py:79-81)
STATE_SCHEMA = StructType(
    [
        StructField("last_t", DoubleType()),
        StructField("last_v", DoubleType()),
        StructField("pend_t", DoubleType()),
        StructField("pend_v", DoubleType()),
    ]
)


def ingest_state_partitions(
    input_bytes: int, bytes_per_partition: int = 64 * 1024 * 1024, floor: int = 4
) -> int:
    """Size the stateful operator's partition count from DATA VOLUME,
    not core count. A streaming query pins its state-store partition
    count to ``spark.sql.shuffle.partitions`` at first start (it is
    written into the checkpoint), and every micro-batch then pays a
    fixed cost PER state partition (store open + delta commit + Arrow
    setup for the applyInPandasWithState kernel) regardless of how many
    rows it carries. With partitions = cores (the batch default), a
    bounded backfill on a 32-core box paid 32 of those fixed costs per
    micro-batch for data that filled four — the r13 driver measured the
    ingest bench FASTER at 8 cores than at 32 (scaling 0.54) purely on
    this. One partition per ~64 MB of input (floor 4) keeps partitions
    in the guide §2.2 size band at any scale: a 100 TB/day feed gets
    ~10⁶ partitions' worth of daily volume spread over its real
    parallelism, a bench-sized backfill gets the floor. Override with
    $SPARK_GRAFT_INGEST_STATE_PARTITIONS where the deployment knows
    better (e.g. sizing for a future volume on day one — the count is
    fixed for the checkpoint's lifetime)."""
    import os

    env = os.environ.get("SPARK_GRAFT_INGEST_STATE_PARTITIONS")
    if env:
        return max(1, int(env))
    return max(int(floor), int(input_bytes) // int(bytes_per_partition))


def ingest_session(spark, input_bytes: int, **kw):
    """A sibling SparkSession (shared SparkContext, own SQL conf) whose
    ``spark.sql.shuffle.partitions`` is sized by
    :func:`ingest_state_partitions` — the supported way to give ONE
    streaming query a data-derived state-partition count without
    mutating the caller's session (the conf is read at stream start and
    pinned into the checkpoint; batch queries on the original session
    keep their own setting). Build the ``readStream`` on the returned
    session."""
    s2 = spark.newSession()
    s2.conf.set(
        "spark.sql.shuffle.partitions",
        str(ingest_state_partitions(input_bytes, **kw)),
    )
    return s2


def _heartbeat_jitter(pvname: str, heartbeat_s: float) -> float:
    """Deterministic per-key jitter (±25%) — the reference randomizes each
    PV's force_time over 13-21 h to spread load (util.py:348-354); a
    replayable stream needs the jitter derived from the key, not an RNG
    (SURVEY §7 'hard parts')."""
    import hashlib

    frac = int(hashlib.md5(pvname.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
    return heartbeat_s * (0.75 + 0.5 * frac)


def _compress_step(
    last_t, last_v, pend_t, pend_v, times, values, deadtime: float, deadband: float
):
    """One pass of the reference compression over time-sorted events given
    incoming per-series state; returns (out_t, out_v, new state 4-tuple).
    The single copy of the W1 branch logic — the applyInPandasWithState
    kernel wraps it, and tests/test_compress_kernel.py drives it
    directly for batching-invariance proofs."""
    out_t: list = []
    out_v: list = []
    for t, v in zip(times, values):
        if last_t is None:
            out_t.append(t), out_v.append(v)
            last_t, last_v = t, v
            continue
        if pend_t is not None and t > last_t + deadtime:
            out_t.append(pend_t), out_v.append(pend_v)
            last_t, last_v = pend_t, pend_v
            pend_t = pend_v = None
        # executed-reference order (archiver.py:386-414): deadtime gate
        # first, then deadband; any non-saved change newer than 1 ms
        # becomes the limbo entry — sub-deadband moves are DELAYED, not
        # dropped
        if t > last_t + deadtime and abs(v - last_v) > deadband:
            out_t.append(t), out_v.append(v)
            last_t, last_v = t, v
            pend_t = pend_v = None
        elif t > last_t + 0.001:
            pend_t, pend_v = t, v
    return out_t, out_v, last_t, last_v, pend_t, pend_v


def _compress_kernel(
    deadtime: float,
    deadband: float,
    flush_ms: int | None,
    heartbeat_s: float | None = None,
    seeds=None,
    seed_col: str | None = None,
):
    """Build the applyInPandasWithState kernel closed over the config.

    ``seeds`` — optional {pvname: (last_t, last_v)} warm-start map (plain
    dict, or a ``pyspark.Broadcast`` of one — the broadcast ships once
    per executor instead of pickling into every task closure): a series
    with no checkpointed state starts from its last ARCHIVED point
    instead of cold (see compressed_stream).

    ``seed_col`` — name of a boolean column marking IN-STREAM seed rows:
    the fully distributed warm start (no driver dict at any size). Seed
    rows carry each series' last archived (time, value); on a series
    with no checkpointed state the newest seed row becomes (last_t,
    last_v) and is NOT emitted; with existing state seed rows are
    ignored (checkpoint wins). Seed rows never reach the compressor as
    events."""

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pvname = key[0]
        seed_map = seeds.value if hasattr(seeds, "value") else seeds
        if state.exists:
            last_t, last_v, pend_t, pend_v = state.get
        else:
            last_t = last_v = pend_t = pend_v = None
            if seed_map is not None and pvname in seed_map:
                # warm start: continue the deadtime window from the last
                # archived point; the seed itself is NOT re-emitted
                last_t, last_v = seed_map[pvname]

        out_t: list[float] = []
        out_v: list[float] = []

        def arm_timer(has_pending: bool) -> None:
            if flush_ms is not None and has_pending:
                state.setTimeoutDuration(flush_ms)
            elif heartbeat_s is not None and last_t is not None:
                state.setTimeoutDuration(int(_heartbeat_jitter(pvname, heartbeat_s) * 1000))

        if state.hasTimedOut:
            if pend_t is not None:
                # flush the limbo tail (ref archiver.py:404-414: pending
                # entry becomes a real point once the window elapses)
                out_t.append(pend_t)
                out_v.append(pend_v)
                last_t, last_v = pend_t, pend_v
                pend_t = pend_v = None
            elif heartbeat_s is not None and last_t is not None:
                # W3 forced heartbeat: silent series re-emits its held
                # value at the current processing time, guaranteeing the
                # staleness floor (ref archiver.py:419-440)
                now_s = state.getCurrentProcessingTimeMs() / 1000.0
                out_t.append(now_s)
                out_v.append(last_v)
                last_t = now_s
            state.update((last_t, last_v, pend_t, pend_v))
            arm_timer(False)
        else:
            chunks = list(pdfs)
            rows = (
                chunks[0]
                if len(chunks) == 1
                else (pd.concat(chunks) if chunks else pd.DataFrame())
            )
            if seed_col is not None and len(rows) and seed_col in rows.columns:
                is_seed = rows[seed_col].fillna(False).astype(bool)
                seed_rows = rows[is_seed]
                rows = rows[~is_seed]
                if last_t is None and len(seed_rows):
                    srow = seed_rows.sort_values("time").iloc[-1]
                    last_t, last_v = float(srow["time"]), float(srow["value"])
            if len(rows):
                # numpy argsort + bulk .tolist(): the per-group python
                # cost IS this lane's scale cost (one fn call per key per
                # batch); iterating pandas Series pays ~3× per element,
                # and .tolist() yields plain floats so the state tuple
                # never carries numpy scalars into Arrow serialization
                t_arr = rows["time"].to_numpy()
                order = t_arr.argsort(kind="stable")
                out_t, out_v, last_t, last_v, pend_t, pend_v = _compress_step(
                    last_t, last_v, pend_t, pend_v,
                    t_arr[order].tolist(),
                    rows["value"].to_numpy()[order].tolist(),
                    deadtime, deadband,
                )
            state.update((last_t, last_v, pend_t, pend_v))
            arm_timer(pend_t is not None)

        if out_t:
            yield pd.DataFrame({"pvname": pvname, "time": out_t, "value": out_v})

    return fn


def compressed_stream(
    events: DataFrame,
    deadtime: float = 5.0,
    deadband: float = 0.0,
    flush_ms: int | None = 1000,
    heartbeat_s: float | None = None,
    seeds=None,
    seed_col: str | None = None,
) -> DataFrame:
    """W1/W2 — stateful deadtime/deadband/limbo compression of a streaming
    ``(pvname, time, value)`` frame. Keyed state per series; bursts inside
    the deadtime window collapse to the final value carrying its original
    event timestamp.

    ``flush_ms`` — processing-time timer that flushes a pending limbo
    entry after quiet time. Use it for CONTINUOUS deployments. For bounded
    runs (``trigger(availableNow=True)`` backfills, benchmarks) pass
    ``None``: once any group registers a processing-time timeout, Spark's
    availableNow executor keeps scheduling empty micro-batches and the
    query never terminates (observed on 4.1: endless 0-row batches). With
    ``None`` the pending tail simply stays in state — the same outcome as
    stopping the reference's archiver mid-deadtime-window; a later event
    past the window still flushes it with its original timestamp.

    ``heartbeat_s`` — W3 forced heartbeat (continuous mode only): a
    series silent longer than ~heartbeat_s re-emits its held value at
    the current processing time, with deterministic ±25% per-key jitter
    replacing the reference's random 13-21 h spread (util.py:348-354) so
    replays are reproducible.

    ``seeds`` — {pvname: (last_t, last_v)} warm-start map, e.g. from
    ``latest_per_key(read_points(...))`` collected: the reference
    archiver's RESTART behavior (startup reloads last_ts/last_value from
    the cache so the deadtime window continues across the restart). A
    new query with a fresh checkpoint then does not re-emit each
    series' first event or reset its window. A plain dict rides the
    kernel closure (re-pickled into every task — fine to ~10⁴ series);
    pass ``spark.sparkContext.broadcast(the_dict)`` instead to ship it
    once per executor (~10⁶ series, driver-memory-bound). Checkpointed
    state always wins over a seed; pending limbo entries are not
    recoverable from the store (the reference loses them on restart
    too).

    ``seed_col`` — the FULLY DISTRIBUTED warm start, no driver
    materialization at any scale: name a boolean column on ``events``
    that marks in-stream seed rows (build them with ``seed_frame(
    latest_per_key(read_points(...)))`` and place them in the stream
    source ahead of the first trigger — the first file of a file-stream
    directory, a bootstrap topic, etc.; real event rows carry false/
    null). The newest seed row per cold series becomes its (last_t,
    last_v) without being emitted; series with checkpointed state
    ignore seed rows, so replaying the seed file after a
    checkpoint-backed restart is harmless. Seed rows that arrive only
    AFTER a series' first real event are ignored too (the series has
    state by then) — ordering them first is the caller's contract.
    Composable with ``seeds`` (explicit map wins per key).

    ``seeds``/``seed_col`` are THE supported new-query resume paths. A
    transformWithStateInPandas twin (``compressed_stream_resumable``,
    RocksDB ``initialState`` seeding) shipped r5–r11 but its runtime
    state-server protocol needs protobuf, which cannot be vendored into
    this container — after two rounds as the repo's only untestable
    code it was retired in r12 (VERDICT r11 task 2; git history has it
    at 9cef6bf for an environment where TWS runs). The seed lanes cover
    the same contract — restart continuity without re-emitting first
    events — fully distributed via ``seed_col`` at any series count.
    """
    use_timers = flush_ms is not None or heartbeat_s is not None
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if use_timers else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("pvname").applyInPandasWithState(
        _compress_kernel(deadtime, deadband, flush_ms, heartbeat_s, seeds, seed_col),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def seed_frame(latest: DataFrame, seed_col: str = "is_seed") -> DataFrame:
    """(pvname, time, value) latest-per-series batch frame → in-stream
    seed rows for ``compressed_stream(seed_col=...)``: the events schema
    plus ``seed_col = true``. Write this into the stream source BEFORE
    the first trigger; event rows must carry ``seed_col`` false/null."""
    return latest.select("pvname", "time", "value", F.lit(True).alias(seed_col))


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """At-least-once source → effectively-once stream: drop re-delivered
    (pvname, time) events within the watermark horizon. The streaming
    analog of the reference's W10 overlap re-read (restart re-reads a
    window of already-archived points and relies on downstream dedup);
    here the state is bounded by the watermark instead of a fixed 1-day
    overlap, and eviction is automatic. Per-key state = one boolean per
    (pvname, time) seen inside the horizon."""
    ev = events.withColumn("_ts", F.timestamp_seconds(F.col("time"))).withWatermark(
        "_ts", watermark
    )
    return ev.dropDuplicatesWithinWatermark(["pvname", "time"]).drop("_ts")


def rate_stream(
    events: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Streaming per-series event-rate metric: tumbling event-time
    windows with a watermark bounding state (late events inside the
    horizon still count; beyond it the window is finalized and emitted).
    Exactly the ops dashboard the reference reads from its cache counts
    (cache.py:208-223) — here it is a first-class windowed aggregate.

    Append-mode semantics: a window row is emitted ONLY once the
    watermark passes its end — the tail windows of a bounded replay stay
    in state (same as any watermark aggregate). Continuous deployments
    flush them as later events advance the watermark; bounded
    backfills/tests either append a watermark-advancing sentinel or read
    the tail from state via outputMode('update'/'complete').
    Batch twin: ``operators.timeseries.rate_windowed`` (same epoch-aligned
    windows; equivalence tested in tests/test_streaming.py)."""
    ev = events.withColumn("_ts", F.timestamp_seconds(F.col("time"))).withWatermark(
        "_ts", watermark
    )
    return (
        ev.groupBy("pvname", F.window("_ts", window).alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "pvname",
            F.col("_w.start").cast("double").alias("win_start"),
            "n_events",
        )
    )


def session_stream(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming gap-based sessionization via Structured Streaming's
    native ``session_window``: consecutive events per series closer than
    ``gap`` merge into one growing session; a session is finalized and
    emitted once the watermark passes its close. State is bounded by the
    watermark (open sessions only). Returns (pvname, session_start,
    session_end, n_events) — the live twin of
    ``operators.timeseries.sessionize`` (same (key, gap) semantics;
    closed-session equivalence tested in tests/test_streaming.py).

    Note the window-end convention: ``session_window``'s end is
    last_event + gap; to agree with the batch operator (end = last event
    time) the emitted ``session_end`` is ``max(_ts)``, not the window
    end."""
    ev = events.withColumn("_ts", F.timestamp_seconds(F.col("time"))).withWatermark(
        "_ts", watermark
    )
    return (
        ev.groupBy("pvname", F.session_window("_ts", gap).alias("_w"))
        .agg(
            F.min("_ts").cast("double").alias("session_start"),
            F.max("_ts").cast("double").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_w")
    )


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), jvm


def upsert_latest(batch: DataFrame, cache_path: str, buckets: int = 64) -> None:
    """S14 — merge a micro-batch into the latest-value cache table
    (ref epicsarchiver/cache.py:454-462's per-batch UPDATE transaction).

    The cache is parquet partitioned by ``bucket = pmod(xxhash64(pvname),
    buckets)`` and the merge is **partition-pruned**: only the buckets
    whose keys appear in the micro-batch are read (Spark prunes the scan
    to ``bucket IN touched``) and only those bucket directories are
    rewritten — per-batch work is O(batch ∪ touched buckets), not
    O(cache). A batch touching 100 of 10⁶ series reads and writes ~2 of
    64 buckets, while the untouched 62 directories are never opened.

    Crash-safe write-temp + per-bucket atomic swap: merged buckets are
    FULLY written to ``<path>.tmp`` while the live cache is untouched (so
    the merge can re-read it safely — no cache()/count() materialization
    dance, which is not a durability guarantee: an evicted block between
    count() and an in-place overwrite recomputes from the path
    mid-overwrite and corrupts the cache). Then each touched bucket dir is
    swapped with two renames: live/bucket=k → .bak/bucket=k, tmp/bucket=k
    → live/bucket=k. A crash mid-sequence leaves every bucket either old
    (possibly parked in .bak — restored by the recovery step at the top of
    the next batch / ``read_cache``) or fully merged; a mixed old/new
    cache is safe because the merge is idempotent (max_by time) and the
    checkpointed stream replays the interrupted batch. At production scale
    the same contract is one Delta/Iceberg MERGE; this is the
    filesystem-parquet equivalent.

    Beside (value, time) each row carries ``np`` — the running COUNT of
    events merged for the series (VERDICT r12 task 3): one more
    mergeable BIGINT that turns the cache into the O(1) staleness feed
    for ``sax_words_refresh(stats=...)`` (via :func:`read_cache_stats`),
    decoupling an incremental word-index refresh from corpus size. The
    count is a staleness DETECTOR, not an audit figure: a foreachBatch
    replay after a crash may re-count the interrupted batch (the
    (value, time) merge is idempotent, the count is not), and replays
    only ever INFLATE it — an inflated count marks a series stale and
    costs one harmless re-word, while under-reporting would need the
    count to stand still across a real append, which a monotone counter
    cannot do for writes that flow through this cache. Caches written
    before ``np`` existed merge as count-so-far 0."""
    spark = batch.sparkSession
    tmp, bak = cache_path + ".tmp", cache_path + ".bak"
    fs, jvm = _hadoop_fs(spark, cache_path)
    P = jvm.org.apache.hadoop.fs.Path
    _recover_cache_swap(fs, P, cache_path)

    bucket_of = F.pmod(F.xxhash64("pvname"), F.lit(buckets)).cast("int")
    order = F.struct(F.col("time"))
    fresh = batch.groupBy("pvname").agg(
        F.max_by("value", order).alias("value"),
        F.max("time").alias("time"),
        F.count(F.lit(1)).alias("np"),
    )
    # tiny driver list (≤ buckets ints) — names which partitions this
    # batch touches; everything downstream is pruned to them
    touched = sorted(r[0] for r in fresh.select(bucket_of.alias("b")).distinct().collect())
    if fs.exists(P(cache_path)):
        old = spark.read.parquet(cache_path).filter(F.col("bucket").isin(touched))
        if "np" not in old.columns:  # pre-np cache: counts start now
            old = old.withColumn("np", F.lit(0).cast("long"))
        fresh = (
            old.drop("bucket")
            .unionByName(fresh)
            .groupBy("pvname")
            .agg(
                F.max_by("value", order).alias("value"),
                F.max("time").alias("time"),
                F.sum("np").alias("np"),
            )
        )
    # one output file per bucket dir (repartition on the partition column),
    # not tasks × buckets small files — the cache stays ≤ `buckets` files
    # total no matter how many batches have merged into it
    fresh.withColumn("bucket", bucket_of).repartition(
        max(len(touched), 1), "bucket"
    ).write.mode("overwrite").partitionBy("bucket").parquet(tmp)

    fs.delete(P(bak), True)
    if not fs.exists(P(cache_path)):
        fs.rename(P(tmp), P(cache_path))
        return
    fs.mkdirs(P(bak))
    for k in touched:
        part = f"bucket={k}"
        if fs.exists(P(f"{cache_path}/{part}")):
            fs.rename(P(f"{cache_path}/{part}"), P(f"{bak}/{part}"))
        fs.rename(P(f"{tmp}/{part}"), P(f"{cache_path}/{part}"))
    fs.delete(P(bak), True)
    fs.delete(P(tmp), True)


def _recover_cache_swap(fs, P, cache_path: str) -> None:
    """If a previous swap died mid-rename, old state sits under .bak —
    restore whatever the live tree is missing before merging (whole cache
    dir, or individual bucket dirs), never overwriting a live entry that
    already received its merged replacement. The half-finished .tmp is
    discarded; its batch will be reprocessed by the checkpointed stream."""
    tmp, bak = cache_path + ".tmp", cache_path + ".bak"
    if fs.exists(P(bak)):
        if not fs.exists(P(cache_path)):
            fs.rename(P(bak), P(cache_path))
        else:
            for st in fs.listStatus(P(bak)):
                name = st.getPath().getName()
                if name.startswith("bucket=") and not fs.exists(P(f"{cache_path}/{name}")):
                    fs.rename(st.getPath(), P(f"{cache_path}/{name}"))
            fs.delete(P(bak), True)
    fs.delete(P(tmp), True)


def upsert_latest_jdbc(
    batch: DataFrame,
    url: str,
    table: str = "cache",
    ensure_table: bool = True,
    n_shards: int = 1,
) -> None:
    """S14, JDBC lane — merge a micro-batch into a latest-value cache
    TABLE over JDBC, one transaction per batch. BASELINE.md's stated
    deployment shape for the reference's cache daemon is "Structured
    Streaming + JDBC sink" (ref epicsarchiver/cache.py:454-462: a
    per-batch UPDATE loop inside one MySQL transaction); this is that
    sink for deployments with a real SQL cache consumer, alongside the
    file-native ``upsert_latest``.

    Scale shape: the per-key reduction (max_by over the micro-batch)
    runs DISTRIBUTED; only the reduced frame — one row per touched
    series, the same bounded artifact as the reference's cache table
    (~#PVs rows, not #events) — crosses to the driver's JDBC
    connection, exactly like the reference daemon. Rows only advance
    (``UPDATE … WHERE time <= ?``), so replaying a batch after a crash
    (foreachBatch is at-least-once) is a no-op and out-of-order batches
    never regress a newer value — the same idempotence contract the
    parquet lane gets from max_by. Each shard's rows commit or roll
    back atomically; a duplicate-key race on INSERT (SQLState 23505)
    means a newer row exists and is skipped.

    ``n_shards > 1`` is the SCALE.md:97 escape hatch for ≥10⁵ active
    series: the reduced rows are hashed ``pmod(xxhash64(pvname),
    n_shards)`` (the same bucketing as the parquet cache lane) and each
    shard runs its own connection + transaction concurrently. Shard key
    sets are disjoint, so per-shard transactions preserve the only
    invariant that matters — per-key monotonicity. A shard failure
    raises after the others finish; already-committed shards replay as
    no-ops when foreachBatch retries the batch (monotone upsert)."""
    spark = batch.sparkSession
    order = F.struct(F.col("time"))
    fresh = batch.groupBy("pvname").agg(
        F.max_by("value", order).alias("value"), F.max("time").alias("time")
    )
    if n_shards > 1:
        fresh = fresh.withColumn(
            "_shard", F.pmod(F.xxhash64("pvname"), F.lit(int(n_shards))).cast("int")
        )
    rows = fresh.collect()
    if not rows:
        return

    jvm = spark._jvm
    if ensure_table:
        # create once, up front — concurrent per-shard CREATEs would race
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            _jdbc_ensure_table(conn, table)
        finally:
            conn.close()

    if n_shards <= 1:
        _jdbc_upsert_rows(jvm, url, table, rows)
        return

    shards: dict[int, list] = {}
    for r in rows:
        shards.setdefault(r["_shard"], []).append(r)
    from concurrent.futures import ThreadPoolExecutor

    # py4j is thread-safe (one gateway connection per Python thread);
    # each shard holds a private JDBC connection for its transaction
    with ThreadPoolExecutor(max_workers=len(shards)) as pool:
        futs = [
            pool.submit(_jdbc_upsert_rows, jvm, url, table, part)
            for part in shards.values()
        ]
        for f in futs:
            f.result()


def _jdbc_merge_stmt(table: str, staging: str, dialect: str) -> str:
    """The set-based monotone upsert for ``upsert_latest_jdbc_distributed``,
    per backend family. ``merge`` is ANSI MERGE (Derby ≥10.11, PostgreSQL
    ≥15, Oracle, DB2, SQL Server — parity-tested on Derby). ``mysql`` is
    INSERT … ON DUPLICATE KEY UPDATE with the same ``old.time <= new.time``
    guard (MySQL has no MERGE; the reference's own cache store is MySQL,
    ref cache.py:454-462). The mysql form uses the 8.0.19+ row alias and
    assigns ``value`` BEFORE ``time`` — ON DUPLICATE KEY assignments
    evaluate left-to-right, so the time guard must still see the OLD
    ``{table}.time`` when value is decided. Untestable in this container
    (no MySQL); the statement shape is unit-pinned."""
    if dialect == "merge":
        return (
            f"MERGE INTO {table} t USING {staging} s ON t.pvname = s.pvname "
            "WHEN MATCHED AND t.time <= s.time "
            "THEN UPDATE SET value = s.value, time = s.time "
            "WHEN NOT MATCHED THEN "
            "INSERT (pvname, value, time) VALUES (s.pvname, s.value, s.time)"
        )
    if dialect == "mysql":
        return (
            f"INSERT INTO {table} (pvname, value, time) "
            f"SELECT pvname, value, time FROM {staging} AS new "
            "ON DUPLICATE KEY UPDATE "
            f"value = IF({table}.time <= new.time, new.value, {table}.value), "
            f"time = IF({table}.time <= new.time, new.time, {table}.time)"
        )
    raise ValueError(f"unknown dialect {dialect!r} (use 'merge' or 'mysql')")


def upsert_latest_jdbc_distributed(
    batch: DataFrame,
    url: str,
    table: str = "cache",
    ensure_table: bool = True,
    n_shards: int = 4,
    staging: str | None = None,
    dialect: str = "merge",
) -> None:
    """S14, JDBC lane at scale — the DISTRIBUTED merge: executor-side
    parallel staging write + one set-based MERGE, with **zero data rows
    through the driver** (vs ``upsert_latest_jdbc``'s per-row driver
    loop, which funnels every active series through one python process
    — fine for the reference's ~10³ PVs, the bottleneck at 10⁵–10⁶).

    Shape per micro-batch:

    1. the per-key reduction (``max_by`` over the batch) runs
       distributed, exactly as in the driver lane;
    2. the reduced frame is written ``repartition(n_shards, pvname)``
       → ``DataFrameWriter.jdbc(mode="append")`` into a staging table —
       this IS the executor-side ``foreachPartition`` write: Spark's
       JDBC sink opens one connection per partition ON THE EXECUTORS
       and batch-inserts its partition's rows, so ``n_shards``
       connections load concurrently and the driver never materializes
       a row (the staging table is pre-created driver-side with
       VARCHAR keys — Spark's Derby dialect would otherwise map
       StringType to CLOB, which Derby cannot compare in a MERGE ON
       clause);
    3. one driver-side ``MERGE INTO cache USING staging`` statement —
       constant-size SQL text, no rows — applies the monotone upsert
       set-wise: ``WHEN MATCHED AND t.time <= s.time THEN UPDATE,
       WHEN NOT MATCHED THEN INSERT``. The staging table is dropped in
       the same transaction's wake; a crash between write and MERGE
       leaves only a stale staging table that the next batch drops and
       rewrites (the checkpointed stream replays the batch).

    Idempotence/monotonicity contract is identical to the driver lane:
    keys within the staging table are unique (groupBy), the MERGE guard
    ``t.time <= s.time`` makes replays no-ops and late batches unable
    to regress a newer value, and the MERGE is one transaction so a
    shard-load failure aborts before any cache mutation (the driver
    lane's savepoint fencing exists because its inserts race row-wise;
    the set-based MERGE has no such race to fence). Parity with both
    other lanes is asserted in tests/test_streaming.py.

    ``dialect`` selects the upsert statement: ``'merge'`` (ANSI MERGE —
    Derby/PostgreSQL≥15/Oracle/DB2/SQL Server; the parity-tested
    default) or ``'mysql'`` (INSERT … ON DUPLICATE KEY UPDATE with the
    same monotone guard — the reference's own cache store is MySQL,
    which has no MERGE; see ``_jdbc_merge_stmt``). The row-wise driver
    lane (``upsert_latest_jdbc``) remains the fully portable fallback."""
    spark = batch.sparkSession
    staging = staging or f"{table}_staging"
    merge_stmt = _jdbc_merge_stmt(table, staging, dialect)  # validate BEFORE the staging load
    order = F.struct(F.col("time"))
    fresh = (
        batch.groupBy("pvname")
        .agg(F.max_by("value", order).alias("value"), F.max("time").alias("time"))
        .filter(F.col("time").isNotNull())  # unorderable; all lanes drop it
    )

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        if ensure_table:
            _jdbc_ensure_table(conn, table)
        _jdbc_drop_table(conn, staging)  # stale leftover from a crashed batch
        st = conn.createStatement()
        try:
            st.executeUpdate(
                f"CREATE TABLE {staging} "
                "(pvname VARCHAR(255), value DOUBLE, time DOUBLE)"
            )
        finally:
            st.close()
    finally:
        conn.close()

    (
        fresh.repartition(max(int(n_shards), 1), "pvname")
        .write.mode("append")
        .jdbc(url, staging)
    )

    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            st.executeUpdate(merge_stmt)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            st.close()
        conn.setAutoCommit(True)  # the staging DROP must itself commit
        _jdbc_drop_table(conn, staging)
    finally:
        conn.close()


def _jdbc_drop_table(conn, table: str) -> None:
    st = conn.createStatement()
    try:
        st.executeUpdate(f"DROP TABLE {table}")
    except Exception as ex:  # noqa: BLE001 — 42Y55/42S02/42P01: doesn't exist
        if _jdbc_sqlstate(ex) not in ("42Y55", "42S02", "42P01"):
            raise
    finally:
        st.close()


def _jdbc_sqlstate(ex) -> str:
    je = getattr(ex, "java_exception", None)
    try:
        return je.getSQLState() if je is not None else ""
    except Exception:
        return ""


def _jdbc_ensure_table(conn, table: str) -> None:
    st = conn.createStatement()
    try:
        st.executeUpdate(
            f"CREATE TABLE {table} "
            "(pvname VARCHAR(255) PRIMARY KEY, value DOUBLE, time DOUBLE)"
        )
    except Exception as ex:  # noqa: BLE001 — X0Y32/42S01: already exists
        if _jdbc_sqlstate(ex) not in ("X0Y32", "42S01", "42P07"):
            raise
    finally:
        st.close()


def _jdbc_upsert_rows(jvm, url: str, table: str, rows) -> None:
    """One connection, one transaction: monotone upsert of ``rows``
    (update-where-older, savepoint-fenced insert on miss)."""
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        upd = conn.prepareStatement(
            f"UPDATE {table} SET value = ?, time = ? WHERE pvname = ? AND time <= ?"
        )
        ins = conn.prepareStatement(
            f"INSERT INTO {table} (pvname, value, time) VALUES (?, ?, ?)"
        )
        double_t = jvm.java.sql.Types.DOUBLE
        try:
            for r in rows:
                if r["time"] is None:
                    continue  # unorderable; parquet lane's max(time) drops it too
                t = float(r["time"])
                v = r["value"]
                if v is None:
                    upd.setNull(1, double_t)  # parity: max_by can carry a null value
                else:
                    upd.setDouble(1, float(v))
                upd.setDouble(2, t)
                upd.setString(3, r["pvname"])
                upd.setDouble(4, t)
                if upd.executeUpdate() == 0:
                    # On PostgreSQL any statement error aborts the whole
                    # transaction (every later statement fails 25P02), so a
                    # benign 23505 here must be fenced with a savepoint —
                    # rollback TO the savepoint, not the transaction.
                    sp = conn.setSavepoint()
                    try:
                        ins.setString(1, r["pvname"])
                        if v is None:
                            ins.setNull(2, double_t)
                        else:
                            ins.setDouble(2, float(v))
                        ins.setDouble(3, t)
                        ins.executeUpdate()
                        conn.releaseSavepoint(sp)
                    except Exception as ex:  # noqa: BLE001
                        if _jdbc_sqlstate(ex) != "23505":
                            raise  # only a newer-row duplicate key is benign
                        conn.rollback(sp)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            upd.close()
            ins.close()
    finally:
        conn.close()


def latest_value_query_jdbc(
    events: DataFrame,
    url: str,
    checkpoint: str,
    table: str = "cache",
    distributed: bool = False,
    n_shards: int = 4,
    dialect: str = "merge",
    staging: str | None = None,
) -> Any:
    """The cache daemon against a SQL store: ``latest_value_query`` with
    the JDBC merge lane (north-star shape "Structured Streaming + JDBC
    sink"). ``distributed=True`` selects the executor-side staging +
    MERGE lane (``upsert_latest_jdbc_distributed``) — the production
    shape at ≥10⁵ active series; the default driver lane remains the
    small-deployment path (reference parity: one connection, row-wise
    savepoint-fenced upsert).

    ``dialect``/``staging`` are the distributed lane's knobs, plumbed
    through so the MySQL form (the reference's actual cache backend)
    and a per-query staging name are reachable from the streaming entry
    point. The staging default is ``{table}_staging_{hash(checkpoint)}``
    — two streaming queries targeting one database/table each get a
    deterministic, distinct staging table (checkpoints are per-query by
    construction), so neither drops the other's staging mid-batch;
    crash recovery still works because a replay of the SAME query
    re-derives the SAME name and drops only its own stale staging."""
    if distributed:
        dialect_stmt_check = _jdbc_merge_stmt(table, "s", dialect)  # fail fast
        del dialect_stmt_check
        if staging is None:
            import hashlib as _hl

            suffix = _hl.md5(checkpoint.encode()).hexdigest()[:8]
            staging = f"{table}_staging_{suffix}"
        fn = lambda b, _id: upsert_latest_jdbc_distributed(  # noqa: E731
            b, url, table=table, n_shards=n_shards, dialect=dialect, staging=staging
        )
    else:
        fn = lambda b, _id: upsert_latest_jdbc(b, url, table=table)  # noqa: E731
    return (
        events.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(fn)
    )


def read_cache(spark, cache_path: str) -> DataFrame:
    """Read the latest-value cache, recovering a half-swapped state first."""
    fs, jvm = _hadoop_fs(spark, cache_path)
    _recover_cache_swap(fs, jvm.org.apache.hadoop.fs.Path, cache_path)
    return spark.read.parquet(cache_path)


def read_cache_stats(spark, cache_path: str) -> DataFrame:
    """The cache as the O(stale) staleness feed for
    ``timeseries.sax_words_refresh(stats=...)`` — ``(pvname, wm, np)``,
    each series' latest event time and running event count, bytes per
    series, read WITHOUT touching raw points (VERDICT r12 task 3; wired
    as ``pvarch index_words --refresh --stats-from-cache``).

    Contract (the refresh docstring's fine print): the stats lane can
    only see writes that flowed THROUGH this cache — a direct store
    import (``pvarch import_ascii`` / ``import_zarr`` writing parquet
    behind the daemon's back) moves neither ``wm`` nor ``np`` and would
    under-report; run a no-stats refresh (full staleness scan) after
    such imports. Counts are all-time, so use a refresh horizon at or
    past the newest data (the archiver cadence) — a series whose only
    new points sit PAST the horizon is harmlessly re-worded. Raises on
    a pre-``np`` cache (no counts to detect staleness with)."""
    c = read_cache(spark, cache_path)
    if "np" not in c.columns:
        raise ValueError(
            "cache at %r predates per-series event counts (np); "
            "re-ingest or refresh without --stats-from-cache" % cache_path
        )
    return c.select("pvname", F.col("time").alias("wm"), F.col("np"))


def latest_value_query(
    events: DataFrame, cache_path: str, checkpoint: str, buckets: int = 64
) -> Any:
    """The cache daemon as one streaming query: last-per-key upsert."""
    return (
        events.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda b, _id: upsert_latest(b, cache_path, buckets=buckets))
    )


def archive_query(
    compressed: DataFrame, points_path: str, checkpoint: str, buckets: int = 128
) -> Any:
    """S15 — append the compressed stream to the points store, hashed into
    series buckets (the reference's 128 pvdat tables as a partition
    column, epicsarchiver/schema.py:21-23)."""
    bucketed = compressed.withColumn(
        "bucket", F.pmod(F.xxhash64("pvname"), F.lit(buckets)).cast("int")
    )
    return (
        bucketed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", points_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("bucket")
    )
