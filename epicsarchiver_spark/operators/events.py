"""Clickstream / product-analytics operators over the raw ``events``
table ``(event_id, ts, user_id, event_type, value, props)``.

The archiver reference exposes its event log only through the points
view; a complete analytics engine over the same log also needs the
classic user-behavior queries — ordered funnels, cohort retention,
semi-structured property rollups, rolling active-user counts. Each is
expressed as a shuffle-minimal DataFrame plan with an exact ANSI-SQL
oracle.

Scale notes (100 TB posture):
- ``funnel``: ONE shuffle (groupBy user); the ordered-step cascade is an
  array-local fold over each user's (ts, type) list — no per-step
  re-scan of the event log, no self-joins. Event rows are pre-filtered
  to the funnel's step types before the shuffle, bounding per-user
  lists by the user's funnel-relevant activity.
- ``retention_cohorts``: ONE user-keyed shuffle (min-period + period
  set per user in a single aggregate), then a tiny (cohort, offset)
  aggregate. No join back to the raw log.
- ``props_rollup``: JSON extraction is the JVM builtin
  ``get_json_object`` inside a map-side partial aggregate; only
  (event_type, partials) move.
- ``rolling_dau``: the distinct + daily aggregate distribute; only the
  final rolling window runs single-partition — over the per-DAY frame,
  whose cardinality is the calendar, not the data (30 rows/month at any
  corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_S = 86400.0
WEEK_S = 604800.0


def _epoch_s(df: DataFrame, ts_col: str):
    """Epoch-seconds double from a schema-adaptive timestamp column —
    the same µs-count division as ``catalog.points_view`` (the driver
    has shipped the events ``ts`` as TIMESTAMP(NANOS)-as-long and as
    timestamp[us]; DuckDB oracles use ``epoch(ts)`` = the identical
    instant, so comparisons are bit-exact cross-engine)."""
    t = df.schema[ts_col].dataType.simpleString()
    c = F.col(ts_col)
    if t in ("bigint", "long"):
        return (F.expr(f"{ts_col} div 1000").cast("double")) / F.lit(1e6)
    if t.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp")).cast("double") / F.lit(1e6)
    return c.cast("double")


def _funnel_step_times(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str,
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-user step-arrival times ``(user, t0..tN)`` for the strict
    funnel cascade t_i = min{t : type = s_i, t > t_{i-1}} — the frame
    both ``funnel`` and ``funnel_times`` aggregate. One user-keyed
    shuffle (collect_list); the cascade itself is array-local, each
    step time its own projection attribute so the expression tree stays
    linear in step count."""
    grouped = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("user"),
            _epoch_s(events, ts_col).alias("t"),
            F.col(type_col).alias("et"),
        )
        .groupBy("user")
        .agg(F.collect_list(F.struct("t", "et")).alias("evs"))
    )
    cur = grouped
    for i, s in enumerate(steps):
        if i == 0:
            t = F.array_min(
                F.transform(
                    F.filter(F.col("evs"), lambda e: e["et"] == F.lit(s)),
                    lambda e: e["t"],
                )
            )
        else:
            prev = F.col(f"t{i - 1}")
            # comparing against a NULL previous step nulls the predicate,
            # filter drops it, array_min of empty = NULL: dropout cascades
            t = F.array_min(
                F.transform(
                    F.filter(
                        F.col("evs"),
                        lambda e: (e["et"] == F.lit(s)) & (e["t"] > prev),
                    ),
                    lambda e: e["t"],
                )
            )
        cur = cur.select("*", t.alias(f"t{i}"))
    return cur


def funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: ``(step, step_name, n_users)`` where a
    user reaches step i when an event of type ``steps[i]`` occurs
    STRICTLY AFTER their step i-1 arrival time (step 0 = the user's
    first event of that type). The cascade t_i = min{t : type = s_i,
    t > t_{i-1}} is the standard funnel definition; a user whose events
    arrive out of order does not convert.

    Each step time is materialized as its own projection attribute —
    t_i references t_{i-1}, and chaining attributes (not inline
    expressions) keeps the expression tree linear in the number of
    steps instead of exponential (CollapseProject would clone the whole
    upstream cascade into every reference otherwise)."""
    cur = _funnel_step_times(events, steps, user_col, type_col, ts_col)
    counts = cur.agg(
        *[F.count(F.col(f"t{i}")).alias(f"c{i}") for i in range(len(steps))]
    )
    return counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step"),
                        F.lit(s).alias("step_name"),
                        F.col(f"c{i}").alias("n_users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("x")
    ).select("x.*")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_s: float = WEEK_S,
) -> DataFrame:
    """Cohort retention: ``(cohort_wk, week_offset, n_users)`` — users
    whose FIRST activity fell in epoch-period ``cohort_wk`` and who were
    active again ``week_offset`` periods later. Period index =
    floor(epoch_seconds / period_s), deterministic across engines
    (calendar-week variants differ by locale; the epoch grid does not).

    One user-keyed shuffle: min-period and the distinct period set come
    from a single aggregate, so no join back to the raw log and a user's
    cohort never re-shuffles with the full event volume."""
    wk = F.floor(_epoch_s(events, ts_col) / F.lit(period_s)).cast("long")
    per_user = (
        events.select(F.col(user_col).alias("user"), wk.alias("wk"))
        .groupBy("user")
        .agg(F.min("wk").alias("cohort_wk"), F.collect_set("wk").alias("wks"))
    )
    return (
        per_user.select("cohort_wk", F.explode("wks").alias("wk"))
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        # per_user rows are distinct (user, wk) with one cohort per user,
        # so count(*) here IS distinct users — no count_distinct shuffle
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def props_rollup(
    events: DataFrame,
    json_path: str = "$.k",
    type_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """Semi-structured rollup: extract a numeric property from the JSON
    ``props`` payload (JVM ``get_json_object`` — no Python, stays in
    whole-stage codegen) and aggregate per event type:
    ``(event_type, n_events, n_missing, avg_k, max_k)``. Missing /
    non-numeric properties count in ``n_missing`` and drop out of the
    numeric aggregates (SQL null semantics)."""
    k = F.get_json_object(F.col(props_col), json_path).cast("double")
    return events.groupBy(F.col(type_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k.isNull().cast("long")).alias("n_missing"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


def transitions(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order behavior model of the event log: the Markov
    transition matrix over consecutive event types within each user's
    timeline — ``(src, dst, n, p)`` with p = P(next = dst | current =
    src). The sequence step is ONE user-keyed sort window (lag); the
    matrix aggregate and the row-normalizing window both run on the
    |types|² count frame, whose size is the vocabulary, not the log.
    p is an exact-integer ratio (long / window-sum of longs), so any
    engine reproduces it bit-for-bit."""
    e = events.select(
        F.col(user_col),
        F.col(type_col).alias("dst"),
        _epoch_s(events, ts_col).alias("_t"),
        F.col("event_id"),
    )
    w = Window.partitionBy(user_col).orderBy("_t", "event_id")
    pairs = e.select(F.lag("dst").over(w).alias("src"), "dst").filter(
        F.col("src").isNotNull()
    )
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n", (F.col("n") / F.sum("n").over(wn)).alias("p")
    )


def top_paths(
    events: DataFrame,
    n: int = 3,
    k: int = 10,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Most common length-``n`` event paths across user timelines
    (view>click>purchase and friends) — the sequence-mining staple
    behind funnel discovery. Returns the top ``k``
    ``(path, n_occurrences)`` rows, ties broken by path for a
    deterministic top-k.

    One user-keyed aggregate collects each timeline as a SORTED struct
    array (sort_array over (t, event_id, type) — deterministic, unlike
    raw collect_list order); n-grams explode array-locally; the count
    aggregate runs map-side partials and the top-k is
    TakeOrderedAndProject. Nothing but (path, partial count) shuffles
    after the one per-user exchange."""
    e = events.select(
        F.col(user_col),
        F.struct(
            _epoch_s(events, ts_col).alias("t"),
            F.col("event_id"),
            F.col(type_col).alias("typ"),
        ).alias("s"),
    )
    seqs = e.groupBy(user_col).agg(
        F.transform(F.sort_array(F.collect_list("s")), lambda x: x["typ"]).alias("seq")
    )
    # Guard short timelines: for a user with < n events, sequence(1, size-(n-1))
    # would have stop < start, which Spark evaluates as a DESCENDING array
    # ([1,0]) — slice(seq, 0, n) then throws INVALID_PARAMETER_VALUE.START and
    # index 1 emits a truncated gram. Emit no grams for those users instead.
    grams = seqs.select(
        F.explode(
            F.when(
                F.size("seq") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("seq") - (n - 1)),
                    lambda i: F.array_join(F.slice(F.col("seq"), i, n), ">"),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("path")
    )
    return (
        grams.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("path"))
        .limit(k)
    )


def rolling_dau(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Daily active users with a trailing ``window_days``-day rolling
    mean: ``(day, dau, dau_roll_avg)``, day = floor(epoch/86400).

    The distinct (day, user) reduction and the per-day count distribute
    normally; only the final rolling window is a single-partition sort —
    over the per-day frame, whose row count is the calendar span (365
    rows/year regardless of event volume), the one case where a global
    window is the right plan."""
    day = F.floor(_epoch_s(events, ts_col) / F.lit(DAY_S)).cast("long")
    dau = (
        events.select(day.alias("day"), F.col(user_col).alias("user"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
    )
    w = Window.orderBy("day").rangeBetween(-(window_days - 1), 0)
    return dau.select(
        "day", "dau", F.round(F.avg("dau").over(w), 6).alias("dau_roll_avg")
    )


def inter_arrival_stats(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-event-type inter-arrival latency profile: for each type, the
    median/p90/max gap (seconds) between a user's CONSECUTIVE events of
    that type, plus the gap count — the engagement-cadence view behind
    session-timeout tuning and anomaly alerts (a type whose p90 gap
    suddenly halves is being spammed; one that doubles is dying).

    One (user, type)-keyed sort window produces the lag deltas, then a
    type-keyed exact-percentile aggregate: the percentile reduces
    map-side per type and only the per-type digest moves. Exact
    ``percentile()`` (linear interpolation) matches DuckDB's
    quantile_cont bit-for-bit on these µs-quantized doubles."""
    t = _epoch_s(events, ts_col)
    w = Window.partitionBy("user_id", "event_type").orderBy(t, "event_id")
    gaps = (
        events.withColumn("_t", t)
        .withColumn("_gap", F.col("_t") - F.lag("_t").over(w))
        .filter(F.col("_gap").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(_gap, 0.5)"), 6).alias("p50_gap_s"),
        F.round(F.expr("percentile(_gap, 0.9)"), 6).alias("p90_gap_s"),
        F.round(F.max("_gap"), 6).alias("max_gap_s"),
    )


def cohort_value_curves(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cohort value (LTV) curves: users grouped by first-activity week,
    then for every week offset since joining — active users, total event
    value, and value per ORIGINAL cohort member (the denominator every
    LTV chart divides by, so churned users keep dragging the curve).
    The revenue twin of ``retention_cohorts``.

    One user-keyed aggregate computes (cohort, per-offset value map) —
    min-week and the offset breakdown in a single pass, no join back to
    the raw log; the cohort-level rollup is calendar² sized. Value sums
    quantize to integer cents before aggregation, so cross-engine float
    summation order cannot move a curve point."""
    t = _epoch_s(events, ts_col)
    wk = F.floor(t / F.lit(WEEK_S)).cast("long")
    vc = F.round(F.col("value") * 100).cast("long")
    per_user_wk = (
        events.select(F.col("user_id"), wk.alias("_wk"), vc.alias("_vc"))
        .groupBy("user_id", "_wk")
        .agg(F.sum("_vc").alias("_wv"))
    )
    w_user = F.min("_wk")
    per_user = per_user_wk.groupBy("user_id").agg(
        w_user.alias("_cohort"),
        F.collect_list(F.struct("_wk", "_wv")).alias("_weeks"),
    )
    cohort_sizes = per_user.groupBy("_cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    offsets = per_user.select(
        "_cohort",
        F.explode("_weeks").alias("_e"),
    ).select(
        "_cohort",
        (F.col("_e._wk") - F.col("_cohort")).alias("week_offset"),
        F.col("_e._wv").alias("_wv"),
    )
    curve = offsets.groupBy("_cohort", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum("_wv").alias("_tv"),
    )
    return (
        curve.join(F.broadcast(cohort_sizes), "_cohort")
        .select(
            F.col("_cohort").alias("cohort_week"),
            F.col("week_offset").cast("int").alias("week_offset"),
            "n_active",
            "cohort_users",
            (F.col("_tv") / F.lit(100.0)).alias("total_value"),
            F.round(F.col("_tv") / F.lit(100.0) / F.col("cohort_users"), 6).alias(
                "value_per_user"
            ),
        )
    )


def last_touch_attribution(
    events: DataFrame, conversion: str = "purchase", ts_col: str = "ts"
) -> DataFrame:
    """Last-touch conversion attribution: every ``conversion`` event
    credits the user's IMMEDIATELY PRECEDING event (any type); a
    conversion with no prior activity credits ``(direct)``. Returns per
    touch type: conversions attributed and total converted value — the
    baseline attribution model every marketing funnel starts from.

    One user-keyed lag window over the log (the same exchange every
    sessionization/path operator takes), then a |event-types|-sized
    aggregate. Value quantizes to integer cents before summing so
    cross-engine float order cannot move a total."""
    t = _epoch_s(events, ts_col)
    w = Window.partitionBy("user_id").orderBy("_t", "event_id")
    vc = F.round(F.col("value") * 100).cast("long")
    return (
        events.select(
            "user_id", "event_id", "event_type", vc.alias("_vc"), t.alias("_t")
        )
        .withColumn("_touch", F.lag("event_type").over(w))
        .filter(F.col("event_type") == conversion)
        .groupBy(F.coalesce(F.col("_touch"), F.lit("(direct)")).alias("touch"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            (F.sum("_vc").cast("double") / 100.0).alias("converted_value"),
        )
    )


def session_stats(
    events: DataFrame, gap_s: float = 1800.0, ts_col: str = "ts"
) -> DataFrame:
    """Corpus-level session summary after per-user inactivity-gap
    sessionization (a new session starts when a user's gap exceeds
    ``gap_s``): session count, exact p50/p90 session duration, mean
    events per session, and the bounce share (single-event sessions) —
    the dashboard row behind every session-timeout decision.

    Two user-keyed windows (lag → session index via running sum of
    boundary flags) that share ONE exchange, a per-session aggregate,
    then a one-row reduction. Nothing bigger than the session frame
    ever aggregates, and exact ``percentile()`` matches DuckDB's
    quantile_cont on these µs-quantized doubles."""
    t = _epoch_s(events, ts_col)
    w = Window.partitionBy("user_id").orderBy("_t", "event_id")
    gap = F.col("_t") - F.lag("_t").over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("_t", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = (
        events.select("user_id", "event_id", t.alias("_t"))
        .withColumn("_new", is_new)
        .withColumn("_sid", F.sum("_new").over(run))
        .groupBy("user_id", "_sid")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            (F.max("_t") - F.min("_t")).alias("_dur"),
        )
    )
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.expr("percentile(_dur, 0.5)"), 6).alias("p50_duration_s"),
        F.round(F.expr("percentile(_dur, 0.9)"), 6).alias("p90_duration_s"),
        F.round(F.avg(F.col("_n").cast("double")), 6).alias("mean_events"),
        F.round(F.avg((F.col("_n") == 1).cast("double")), 6).alias("bounce_share"),
    )


def dau_anomalies(
    events: DataFrame,
    window_days: int = 7,
    threshold: float = 0.25,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily-active-user anomaly days: every day whose DAU deviates from
    the TRAILING ``window_days``-day median by more than ``threshold``
    (relative) — the pager rule behind "traffic fell off a cliff" /
    "bot spike" alerts. The median (not the mean of ``rolling_dau``)
    so a single spike day doesn't poison its own baseline. Days without
    a full trailing window report a null baseline and never flag.

    Same scale shape as ``rolling_dau``: the distinct-(day, user)
    reduction and per-day count distribute; the only global window runs
    over the per-day frame — calendar-sized (365 rows/year regardless
    of event volume), the one case where a single-partition window is
    the right plan. Exact windowed ``percentile`` matches DuckDB's
    windowed quantile_cont on these integer counts."""
    day = F.floor(_epoch_s(events, ts_col) / F.lit(DAY_S)).cast("long")
    dau = (
        events.select(day.alias("day"), F.col(user_col).alias("user"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
    )
    w = Window.orderBy("day").rangeBetween(-window_days, -1)
    base = dau.select(
        "day",
        "dau",
        F.round(F.expr("percentile(dau, 0.5)").over(w), 6).alias("trailing_med"),
        F.count(F.lit(1)).over(w).alias("_nwin"),
    )
    rel = F.round(
        F.abs(F.col("dau") - F.col("trailing_med")) / F.col("trailing_med"), 6
    )
    return base.select(
        "day",
        "dau",
        F.when(F.col("_nwin") >= window_days, F.col("trailing_med")).alias(
            "trailing_med"
        ),
        F.when(
            (F.col("_nwin") >= window_days) & (F.col("trailing_med") > 0), rel
        ).alias("rel_dev"),
    ).withColumn(
        "is_anomaly",
        F.coalesce(F.col("rel_dev") > F.lit(threshold), F.lit(False)),
    )


def funnel_times(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-to-convert between adjacent funnel steps: for each step
    i ≥ 1, the latency distribution ``t_i − t_{i−1}`` over users who
    reached step i — ``(step, step_name, n_converted, p50_s, p90_s,
    mean_s)``. The companion view to ``funnel``'s headcounts: WHERE
    users stall is the counts, HOW LONG converters take is this.

    Same scale shape as ``funnel`` (shared ``_funnel_step_times``
    cascade): one user-keyed shuffle, array-local step times, then ONE
    global aggregate producing a |steps|-wide single row that explodes
    into the output — the exact ``percentile()`` reduction matches
    DuckDB's ``quantile_cont`` interpolation, and a step nobody reaches
    yields nulls, not a missing row."""
    if len(steps) < 2:
        # no adjacent pair → no latency rows, mirroring funnel's shape
        return events.sparkSession.createDataFrame(
            [],
            "step int, step_name string, n_converted bigint, "
            "p50_s double, p90_s double, mean_s double",
        )
    cur = _funnel_step_times(events, steps, user_col, type_col, ts_col)
    aggs = []
    for i in range(1, len(steps)):
        lat = F.col(f"t{i}") - F.col(f"t{i - 1}")
        aggs += [
            F.count(F.col(f"t{i}")).alias(f"n{i}"),
            F.round(F.expr(f"percentile(t{i} - t{i - 1}, 0.5)"), 6).alias(f"p50_{i}"),
            F.round(F.expr(f"percentile(t{i} - t{i - 1}, 0.9)"), 6).alias(f"p90_{i}"),
            F.round(F.avg(lat), 6).alias(f"mean_{i}"),
        ]
    one = cur.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step"),
                        F.lit(steps[i]).alias("step_name"),
                        F.col(f"n{i}").alias("n_converted"),
                        F.col(f"p50_{i}").alias("p50_s"),
                        F.col(f"p90_{i}").alias("p90_s"),
                        F.col(f"mean_{i}").alias("mean_s"),
                    )
                    for i in range(1, len(steps))
                ]
            )
        ).alias("x")
    ).select("x.*")


def linear_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    lookback_s: float = 7 * 86400.0,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Linear multi-touch attribution — every conversion's value splits
    EQUALLY across the user's touchpoints in the ``lookback_s`` window
    before it (the standard companion to ``last_touch_attribution``:
    last-touch over-credits the final click, linear shows the whole
    path). Returns ``(event_type, touches, conversions, credit)`` —
    per touch type, how many touchpoint rows earned credit, how many
    distinct conversions they participated in, and the credited value.

    Exactness: a conversion's per-touch share is
    ``(value_cents · 10⁶) DIV n_touches`` in int64 micro-cents —
    integer division TRUNCATING TOWARD ZERO, which is what both Spark's
    ``DIV`` and DuckDB's ``//`` do (verified empirically; they agree
    for negative values too, so refund rows don't diverge from the
    oracle — but note truncation credits a negative conversion slightly
    MORE than true floor would). The rollup is summation-order
    independent and engine-exact (the ≤n_touches·10⁻⁸ |remainder| is
    deliberately dropped, documented here). Touch order ties break on
    (time, event_id) strict precedence.

    Scale shape: the touch expansion is the user-keyed equi-join of
    conversions against their own user's events with the range
    predicate as residual — pair volume is conversions × touches-in-
    window, the bound every attribution system chooses with its
    lookback, NEVER all-pairs. The per-conversion denominator is one
    window count over that same joined frame; the rollup reduces
    map-side to the \\|types\\|-sized result."""
    pairs = _touch_pairs(
        events, conversion, lookback_s, user_col, type_col, time_col, value_col
    )
    w = Window.partitionBy("_cid")
    shared = pairs.withColumn("_k", F.count(F.lit(1)).over(w)).select(
        "_ty",
        "_cid",
        F.expr("_cents * 1000000 DIV _k").alias("_micros"),
    )
    return _attribution_rollup(shared)


def _touch_pairs(
    events: DataFrame,
    conversion: str,
    lookback_s: float,
    user_col: str,
    type_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Shared head of the multi-touch models: each conversion joined to
    its user's strictly-preceding events inside the lookback window —
    the correctness-critical fence ((time, event_id) strict precedence,
    cent quantization, lookback bound) lives ONCE. Pair volume =
    conversions × touches-in-window, the bound the lookback chooses."""
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col("event_id").alias("_eid"),
        _epoch_s(events, time_col).alias("_t"),
        F.col(type_col).alias("_ty"),
    )
    conv = events.filter(F.col(type_col) == conversion).select(
        F.col(user_col).alias("_cu"),
        F.col("event_id").alias("_cid"),
        _epoch_s(events, time_col).alias("_ct"),
        F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    strictly_before = (F.col("_t") < F.col("_ct")) | (
        (F.col("_t") == F.col("_ct")) & (F.col("_eid") < F.col("_cid"))
    )
    return conv.join(ev, F.col("_cu") == F.col("_u")).filter(
        strictly_before & (F.col("_t") >= F.col("_ct") - float(lookback_s))
    )


def _attribution_rollup(shared: DataFrame) -> DataFrame:
    """Shared tail of the multi-touch models: (type, conversion)
    partials first, so the distinct-conversion count is a plain count —
    no count-distinct Expand doubling the pair frame."""
    per_conv = shared.groupBy("_ty", "_cid").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_micros").alias("_m")
    )
    return (
        per_conv.groupBy(F.col("_ty").alias("event_type"))
        .agg(
            F.sum("_n").alias("touches"),
            F.count(F.lit(1)).alias("conversions"),
            F.round(F.sum("_m") / 1e8, 6).alias("credit"),
        )
        .orderBy("event_type")
    )


def position_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    lookback_s: float = 7 * 86400.0,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — first and
    last touchpoints earn 40% each, the middles split the remaining
    20%: the model that values discovery AND closing over the path's
    middle. Degenerate paths follow the standard convention — a single
    touch takes 100%, a two-touch path splits 50/50.

    Same exact micro-cent discipline and touch-pair fence as
    ``linear_attribution`` (truncate-toward-zero int64 ``DIV`` shares —
    matching DuckDB ``//`` for negatives too — lookback-bounded pair
    volume, (time, event_id) strict precedence); position comes
    from ONE row_number window over the same conversion-keyed frame the
    denominator count already uses."""
    pairs = _touch_pairs(
        events, conversion, lookback_s, user_col, type_col, time_col, value_col
    )
    w = Window.partitionBy("_cid")
    wo = Window.partitionBy("_cid").orderBy("_t", "_eid")
    ranked = pairs.select(
        "_ty",
        "_cid",
        "_cents",
        F.count(F.lit(1)).over(w).alias("_k"),
        F.row_number().over(wo).alias("_rn"),
    )
    micros = (
        F.when(F.col("_k") == 1, F.expr("_cents * 1000000"))
        .when(F.col("_k") == 2, F.expr("_cents * 1000000 DIV 2"))
        .when(
            (F.col("_rn") == 1) | (F.col("_rn") == F.col("_k")),
            F.expr("_cents * 1000000 * 40 DIV 100"),
        )
        .otherwise(F.expr("_cents * 1000000 * 20 DIV (100 * (_k - 2))"))
    )
    shared = ranked.select("_ty", "_cid", micros.alias("_micros"))
    return _attribution_rollup(shared)
