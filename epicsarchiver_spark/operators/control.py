"""Control-plane / lifecycle operators — SURVEY §2.9 control plane, §3.3
pvarch CLI surface, A8 status metrics, J6 description join.

The reference's control plane is a MySQL mailbox polled by the cache
daemon (requests add/drop/suspend/ignore, epicsarchiver/cache.py:705-752),
run rotation creating a new DB + copying the pv dimension forward
(cache.py:82-144), and usage-incremented pair scores (cache.py:804-880).
Here: small-DataFrame transforms over the catalog dimensions — every one
broadcastable, none touching the fact table."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_EPOCH = 2147483647.0
MAX_PAIR_SCORE = 500_000  # ref epicsarchiver/cache.py:30


def apply_requests(pv: DataFrame, requests: DataFrame) -> DataFrame:
    """Process the request queue against the pv catalog: the *latest*
    request per pvname wins (the daemon drains the whole queue each pass,
    ref cache.py:705-752). add → ensure row active; drop → remove;
    suspend → active='no'; ignore → no-op."""
    w = Window.partitionBy("pvname").orderBy(F.col("ts").desc(), F.col("id").desc())
    latest = (
        requests.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("action") != "ignore"))
        .select("pvname", "action")
    )
    joined = pv.join(latest, "pvname", "left")
    kept = joined.filter((F.col("action").isNull()) | (F.col("action") != "drop"))
    updated = kept.select(
        *[c for c in pv.columns if c != "active"],
        F.when(F.col("action") == "suspend", F.lit("no"))
        .when(F.col("action") == "add", F.lit("yes"))
        .otherwise(F.col("active"))
        .alias("active"),
    )
    additions = (
        latest.filter(F.col("action") == "add")
        .join(pv.select("pvname"), "pvname", "left_anti")
        .select("pvname", F.lit("yes").alias("active"))
    )
    return updated.unionByName(additions, allowMissingColumns=True)


ALERT_EDIT_COLS = ("name", "mailto", "mailmsg", "trippoint", "timeout", "active")


def upsert_alerts(alerts: DataFrame, edits: DataFrame) -> DataFrame:
    """Alert-rule CRUD — the reference's `/editalert` + `submit_alertedits`
    surface (ref epicsarchiver/webapp.py:163-227: add_alert on copy,
    update_alert on submit; alerts table ref schema.py:29-41) as a
    MERGE over the tiny alerts dimension.

    ``edits`` rows carry ``(id, ts, action, pvname, compare, *rule
    columns)`` with action ∈ {'add', 'edit', 'drop'}. The LATEST edit
    per rule key ``(pvname, compare)`` wins — the daemon re-reads the
    whole alerts table every alert period (ref cache.py:754
    read_alert_table), so last-write-wins is the observable semantics.
    'add' upserts; 'edit' updates an EXISTING rule only — an edit whose
    key matches nothing is a no-op, never a new row (the reference's
    update_alert updates by id; silently creating a rule from a typo'd
    edit would mint a dead NULL-trippoint rule). An edit column left
    NULL keeps the existing value (the webapp form posts the full row,
    a CLI patch may set one field); 'drop' deletes the rule. New rules
    get the schema defaults (timeout 30, active 'yes') and
    engine-managed ``status='ok'`` (ref schema.py:38-40). Both sides
    are rule-sized dimensions — no fact-table contact, broadcastable
    everywhere."""
    key = ["pvname", "compare"]
    w = Window.partitionBy(*key).orderBy(F.col("ts").desc(), F.col("id").desc())
    latest = (
        edits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *key,
            "action",
            *[F.col(c).alias(f"_e_{c}") for c in ALERT_EDIT_COLS],
        )
    )
    # a literal flag stamped on the alerts side BEFORE the join marks a
    # key with an existing rule (a data column like status can be NULL
    # in an externally-imported dimension, which would silently delete
    # the row on edit): drops delete, and edits of a missing key fall
    # through as no-ops instead of minting a new row
    merged = (
        alerts.withColumn("_exists", F.lit(True))
        .join(latest, key, "full_outer")
        .filter(
            (F.col("action").isNull() | (F.col("action") != "drop"))
            & (
                F.col("action").isNull()
                | (F.col("action") != "edit")
                | F.col("_exists").isNotNull()
            )
        )
    )
    defaults = {"timeout": F.lit(30.0), "active": F.lit("yes")}
    updated = [
        F.coalesce(F.col(f"_e_{c}"), F.col(c), defaults.get(c, F.lit(None))).alias(c)
        for c in ALERT_EDIT_COLS
    ]
    return merged.select(
        *key, *updated, F.coalesce(F.col("status"), F.lit("ok")).alias("status")
    )


def rotate_runs(runs: DataFrame, now: float, next_db: str) -> DataFrame:
    """Run rotation as pure metadata (ref cache.py:82-144
    create_next_archive: new DB, runs row, stop_time of the old current
    run set to now). The engine's partitioned store makes the data move a
    no-op; only the runs dimension changes."""
    spark = runs.sparkSession
    closed = runs.select(
        "db",
        "start_time",
        F.when(F.col("stop_time") >= MAX_EPOCH, F.lit(now)).otherwise(
            F.col("stop_time")
        ).alias("stop_time"),
    )
    new_row = spark.createDataFrame(
        [(next_db, float(now), MAX_EPOCH)], schema="db string, start_time double, stop_time double"
    )
    return closed.unionByName(new_row)


def increment_pair_scores(pairs: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Merge usage increments into the pairs graph (ref cache.py:836-880
    increment_pair_score: +1 per co-use, capped at MAX_PAIR_SCORE,
    canonical order). Both frames are (pv1, pv2[, score]) edges."""
    canon = lambda df, s: df.select(  # noqa: E731
        F.least("pv1", "pv2").alias("pv1"),
        F.greatest("pv1", "pv2").alias("pv2"),
        s.alias("score"),
    )
    base = canon(pairs, F.col("score"))
    incr = canon(new_edges, F.coalesce(F.col("score"), F.lit(1)) if "score" in new_edges.columns else F.lit(1))
    return (
        base.unionByName(incr)
        .groupBy("pv1", "pv2")
        .agg(F.least(F.sum("score"), F.lit(MAX_PAIR_SCORE)).alias("score"))
    )


def status_activity(points: DataFrame, since: float, by: str = "event_type") -> DataFrame:
    """A8 — pvarch status/activity: totals, recent counts, and newest
    timestamp per group (ref epicsarchiver/pvarch.py:172-177,225-229,
    cache.py:225-252) in one hash aggregate."""
    return (
        points.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("time") > since, 1).otherwise(0)).alias("n_recent"),
            F.max("time").alias("t_last"),
        )
        .orderBy(by)
    )


def desc_join(cache: DataFrame) -> DataFrame:
    """J6 — description join: each PV's label is the cached value of its
    ``.DESC`` sibling row (ref epicsarchiver/web/WebStatus.py:73-83;
    ingest pairing cache.py:533-541). Self-join on the derived key."""
    descs = cache.filter(F.col("pvname").endswith(".DESC")).select(
        F.regexp_replace("pvname", r"\.DESC$", ".VAL").alias("pvname"),
        F.col("value").alias("description"),
    )
    return cache.filter(~F.col("pvname").endswith(".DESC")).join(descs, "pvname", "left")


def instrument_restore(
    points: DataFrame, members: DataFrame | list[str], t: float, tol: float = 1e-4
) -> DataFrame:
    """J8 — instrument position restore: for each PV in an instrument's
    member list, its value as of timestamp ``t`` (ref
    epicsarchiver/web/WebInstruments.py:255-259; doc/setup.rst:214-220 —
    a saved "position" is just a timestamp, restore = as-of lookup per
    member).

    ``members`` is either a Python list of pvnames — compiled to an
    ``isin`` predicate that *pushes down to the parquet scan* (the best
    plan for the typical tens-of-PVs instrument: no join at all, row
    groups without the members never leave storage) — or a members
    DataFrame ``(pvname, ...)``, broadcast so membership filtering
    happens map-side before the per-series as-of window; either way only
    the instrument's series shuffle."""
    from epicsarchiver_spark.operators.timeseries import value_at_time

    if isinstance(members, (list, tuple)):
        scoped = points.filter(F.col("pvname").isin(list(members)))
    else:
        scoped = points.join(F.broadcast(members.select("pvname").distinct()), "pvname")
    return value_at_time(scoped, t, tol=tol)


POSITION_SCHEMA = "instrument string, position string, ts double"


def save_position(
    positions: DataFrame | None,
    spark,
    instrument: str,
    position: str,
    ts: float,
) -> DataFrame:
    """Create/overwrite a named instrument position (ref
    epicsarchiver/web/WebInstruments.py:79-84: saving a position stores
    only (instrument, name, timestamp) — the member PVs' values are NOT
    copied; restore re-reads them as of ``ts``). Returns the updated
    positions dimension with the latest save of a (instrument, position)
    name winning — re-saving a name moves it, matching the reference's
    REPLACE semantics. Pure tiny-dimension transform; caller persists
    (e.g. ``write_positions``)."""
    row = spark.createDataFrame([(instrument, position, float(ts))], POSITION_SCHEMA)
    if positions is None:
        return row
    return (
        positions.join(
            row.select("instrument", "position"), ["instrument", "position"], "left_anti"
        )
        .unionByName(row)
    )


def restore_position(
    points: DataFrame,
    positions: DataFrame,
    members: DataFrame | list[str],
    instrument: str,
    position: str,
    tol: float = 1e-4,
) -> DataFrame:
    """Instrument position restore by NAME: look up the saved timestamp
    in the positions dimension (tiny — one driver lookup, exactly the
    reference's position query, WebInstruments.py:255-259) and as-of
    read every member PV at it via ``instrument_restore``."""
    row = (
        positions.filter(
            (F.col("instrument") == instrument) & (F.col("position") == position)
        )
        .select("ts")
        .head()
    )
    if row is None:
        raise KeyError(f"no saved position {instrument!r}/{position!r}")
    return instrument_restore(points, members, float(row.ts), tol=tol)


def write_positions(positions: DataFrame, path: str) -> None:
    """Persist the positions dimension (single tiny parquet — coalesce(1)
    keeps it one file; it is metadata, not data)."""
    positions.coalesce(1).write.mode("overwrite").parquet(path)


def check_liveness(
    points: DataFrame, now: float, cadence_s: float = 600.0, by: str | None = None
) -> DataFrame:
    """``pvarch check`` watchdog (ref doc/setup.rst:40-42: cron verifies
    the archiver saved ≥1 point in the last 10 min and restarts it
    otherwise). Returns one row (or one per ``by`` group): n_recent and
    an ``alive`` boolean; the CLI turns the global row into an exit
    code."""
    recent = points.filter(F.col("time") > now - cadence_s)  # pushes to scan
    if by is None:
        agg = recent.agg(F.count(F.lit(1)).alias("n_recent"))
    else:
        # groups with no recent point simply don't appear — compare
        # against the expected name list to find dead series
        agg = recent.groupBy(by).agg(F.count(F.lit(1)).alias("n_recent"))
    return agg.withColumn("alive", F.col("n_recent") >= 1)


def alert_eval(cache: DataFrame, rules: DataFrame, rule_key: str = "event_type") -> DataFrame:
    """C16 batch — evaluate threshold alert rules against the latest-value
    cache (ref epicsarchiver/cache.py:601-630: `value <op> trippoint`,
    op ∈ {eq,ne,le,lt,ge,gt}, numeric compare when both sides cast else
    string compare). Rules are a tiny broadcast dimension; the cache is
    the A5 latest-per-key aggregate, so the whole evaluation is one
    broadcast join + a codegen'd conditional — no shuffle beyond the
    cache aggregation itself. Streaming twin: streaming/alerts.py
    (ok→alarm transitions with timeout state)."""
    from epicsarchiver_spark.functions.scalar import alert_fires

    joined = cache.join(F.broadcast(rules), rule_key)
    return joined.filter(
        alert_fires(
            F.col("value").cast("string"),
            F.col("compare"),
            F.col("trippoint").cast("string"),
        )
    )
