"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(plus the training-data-pipeline extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for EVERY query — including the LSH/IVF plane
families (deterministic LCG planes embedded as SQL list literals) and,
as of r4, the MinHash/SimHash families: their gate queries run on the
SQL-portable ``basis="md5"`` (60-bit md5 shingle hashes + affine-mod-p
signature family), which DuckDB reproduces bit-for-bit. The production
default remains the faster xxhash64 basis, covered by the quantified
recall/precision cross-check in tests/test_operator_consistency.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epicsarchiver_spark.catalog import POINTS_ORACLE_CTE, load_table, points_view
from epicsarchiver_spark.functions import scalar
from epicsarchiver_spark.functions.scalar import clean_value_num, hformat
from epicsarchiver_spark.sources import points_store, sinks
from epicsarchiver_spark.operators import (
    bpe,
    control,
    cull,
    curation,
    dedup,
    deadband,
    events as ev,
    multimodal,
    related,
    relational,
    search,
    similarity,
    skew,
    text_ops,
    timeseries,
)

from epicsarchiver_spark.gate_constants import (  # noqa: F401 — re-exported; shared with oracles
    ALARM_TRIP,
    ALERT_RULES,
    ASOF_LOOKBACK,
    BLOCKWORDS,
    BOILER_MIN_WORDS,
    BOILER_SEG_WORDS,
    BOILER_STOPWORDS,
    BLOCK_MAX_RATIO,
    BM25_QUERY,
    COMPRESS_DEADBAND,
    COMPRESS_DEADTIME,
    CORR_MIN_R,
    DEADBAND,
    DEADTIME,
    DISCORD_K,
    DISCORD_WINDOW,
    ENUM_LABELS,
    FUNNEL_STEPS,
    GRID_STEP,
    HEARTBEAT,
    HH_MIN_COUNT,
    HIST_BINS,
    INSTRUMENT,
    KEYWORD_TAXONOMY,
    MAIL_LOOKUP_PV,
    MAIL_TEMPLATE,
    MULTI_QUERIES,
    OUTLIER_K,
    PROJ_DIM,
    RAMP_MIN_STEPS,
    RECENT_RUNS_LIMIT,
    RELATED_NODE,
    SAX_ADAPT_FENCE,
    SAX_ALPHABET,
    SAX_COARSE_STEP,
    SAX_GROW_FENCE,
    CUSUM_H,
    CUSUM_K,
    CUSUM_TARGET,
    CUSUM_TH,
    CUSUM_TK,
    CUSUM_WARM_CUT,
    CUSUM_WH,
    CUSUM_WK,
    SAX_CUT,
    SAX_EXPAND,
    SAX_NCAND,
    SAX_QUERY_PV,
    SAX_SEGMENTS,
    SAX_TOPK,
    SESSION_GAP,
    SHIFT_THRESHOLD,
    SHIFT_WINDOW,
    T0,
    T1,
    T_ASOF,
    WINNOW_MAX_DF,
    WINNOW_MIN_SHARED,
    _EDGES_CTE,
    _XCORR_PAIRS,
)
from epicsarchiver_spark.oracles import oracle_sql  # noqa: F401 — the driver imports it from here

def _enum_label_col():
    """C13 enum mapping applied to the numeric value (floor → 0..3 →
    label). Lazy: Column construction needs an active SparkContext."""
    return F.element_at(
        F.array(*[F.lit(x) for x in ENUM_LABELS]),
        (F.pmod(F.floor(F.col("value")).cast("int"), F.lit(4)) + F.lit(1)).cast("int"),
    )

_PTS = "event_id", "pvname", "time", "value"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return points_view(spark, sf_dir).select(*_PTS)



def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related-item edge list derived from lineitem: part↔supplier edges
    weighted by quantity (plays the reference's pairs table,
    epicsarchiver/schema.py:71-78)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.concat_ws(":", F.lit("P"), F.col("l_partkey")).alias("pv1"),
        F.concat_ws(":", F.lit("S"), F.col("l_suppkey")).alias("pv2"),
        F.col("l_quantity").alias("score"),
    )



def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's get_data() spine — run-pruned range scan
    + early-point seed per series (SURVEY §3.2) on sf0.001."""
    pts = _points(spark, "/root/testdata/sf0.001")
    return timeseries.get_data(pts, T0, T1).orderBy("pvname", "time")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

# The driver certifies the FIRST 50 keys of queries() each round. With
# every registry key driver-certified at least once (union of
# CORRECTNESS_r01..r08), the window's job changes from "certify the
# new" to a ROLLING REGRESSION GUARD: each round's front 50 = any keys
# NEW this round (certify in the round they land), then the keys whose
# last driver certification is OLDEST (recomputed per round from the
# CORRECTNESS_r*.json union — many were last driver-checked in r01-r03
# and only the local mirror has re-run them since). Every key cycles
# back through driver certification every ~4-5 rounds. THE LIST BELOW
# IS GENERATED — regenerate it at the start of each round with
#     python tools/rotate_front.py --write
# (never-certified keys first, then oldest green driver row first).
_R13_FRONT: list[str] = [
    "ts_cusum_warm",
    "ts_discords_confirmed",
    "ts_sax_topk_auto_adaptive",
    "ts_sax_topk_auto_fence",
    "ts_sax_words_refresh_only",
    "doc_split_leakage",
    "doc_tokenizer_fertility",
    "doc_winnow_indexed",
    "emb_cell_quality",
    "emb_cell_sample",
    "emb_kmeans_refine",
    "emb_pipeline_verdicts",
    "emb_prototype_scores",
    "emb_semantic_dedup",
    "ev_attribution",
    "ev_cohort_value",
    "ev_dau_anomalies",
    "ev_inter_arrival",
    "ev_session_stats",
    "rel_idle_customers",
    "rel_late_suppliers",
    "rel_market_share",
    "rel_nation_trade",
    "rel_order_count_dist",
    "rel_part_value_share",
    "rel_product_profit",
    "rel_ship_delay_dist",
    "rel_small_qty_revenue",
    "rel_top_supplier",
    "ts_health_report",
    "ts_largest_gaps",
    "ts_latest_bucketed",
    "ts_lttb",
    "ts_rolling_outliers",
    "ctl_alert_upsert",
    "doc_bm25_indexed",
    "doc_bm25_topk",
    "doc_bpe_pairs",
    "doc_ccnet_indexed",
    "doc_component_splits",
    "doc_graph_profile",
    "doc_graph_profile_indexed",
    "doc_keyword_labels",
    "doc_minhash_quality",
    "doc_nb_audit",
    "doc_quality_survivors",
    "doc_soft_dedup",
    "doc_splits_indexed",
    "doc_survivors_indexed",
    "emb_corpus_drift",
]

# per-(corpus dir, name) cache of written parquet artifacts — the
# build-once / query-many deployment cadence: the expensive basis (a
# connected-components labeling, a winnowing fingerprint table, an
# IVF-PQ index) is written once per corpus release and every later
# query is a read-back against the artifact
_ARTIFACTS: dict[tuple[str, str], str] = {}

# build-once must stay once when gates run from concurrent driver
# threads (Spark job submission is thread-safe and overlapping
# independent gates is how the parity suite fills the executor tail —
# guide §2.6); the lock only serializes the one-time builds
import threading

_ARTIFACTS_LOCK = threading.RLock()


def _artifact_path(d: str, name: str, build) -> str:
    """Return the parquet path of artifact ``name`` for corpus dir
    ``d``, invoking ``build(path)`` to write it on first use."""
    key = (d, name)
    with _ARTIFACTS_LOCK:
        path = _ARTIFACTS.get(key)
        if path is None:
            import tempfile

            path = tempfile.mkdtemp(prefix=f"pvarch_q_{name}_") + f"/{name}"
            build(path)
            _ARTIFACTS[key] = path
    return path


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- time-series surface (SURVEY §2.1/2.3/2.4/2.5) ---
    q["ts_range_read"] = lambda s, d: timeseries.range_read(_points(s, d), T0, T1)
    q["ts_get_data"] = lambda s, d: timeseries.get_data(_points(s, d), T0, T1)
    q["ts_value_at"] = lambda s, d: timeseries.value_at_time(_points(s, d), T_ASOF)
    q["ts_latest"] = lambda s, d: timeseries.latest_per_key(_points(s, d)).select(*_PTS)

    # ...and the same question answered from the BUCKETED catalog store
    # (points_store.write_points_bucketed): the bucketBy(pvname) table
    # metadata lets the per-series max_by aggregate plan with no
    # Exchange — the layout-level shuffle deletion, certified end-to-end
    # here. Oracle identical to ts_latest (same rows, same reduction).
    def _bucketed_points(s, d):
        """The per-corpus-dir bucketBy(pvname) catalog table, written once
        (build lane) and read back through the catalog by every bucketed
        gate variant — the steady state of the highest-traffic per-series
        reads at 100 TB."""
        import re
        import tempfile

        from epicsarchiver_spark.sources.points_store import (
            read_points_bucketed,
            write_points_bucketed,
        )

        key = (d, "bucketed_points")
        with _ARTIFACTS_LOCK:
            tbl = _ARTIFACTS.get(key)
            if tbl is None:
                tbl = "pvarch_bucketed_" + re.sub(r"[^0-9a-zA-Z]+", "_", d).strip("_")
                tmp = tempfile.mkdtemp(prefix="pvarch_q_bucketed_")
                write_points_bucketed(
                    _points(s, d), tbl, path=f"{tmp}/points", n_buckets=8
                )
                _ARTIFACTS[key] = tbl
        return read_points_bucketed(s, tbl)

    q["ts_latest_bucketed"] = lambda s, d: timeseries.latest_per_key(
        _bucketed_points(s, d)
    ).select(*_PTS)

    # ...and the rest of the high-traffic per-series read family answered
    # from the same catalog table (VERDICT r7 #7): get_data (range +
    # as-of seed — ZERO Exchange: both scans and the seed window are
    # satisfied by the bucket layout), sessionize (ZERO Exchange), and
    # locf_grid (exactly ONE Exchange — the points∪grid-probe merge;
    # the union of a bucketed scan with a generated frame has no
    # recognizable distribution, while the keys-distinct and everything
    # else stays scan-satisfied). Plan pins in tests/test_points_store.py;
    # oracles identical to the unbucketed twins.
    q["ts_get_data_bucketed"] = lambda s, d: timeseries.get_data(
        _bucketed_points(s, d), T0, T1
    )
    q["ts_locf_bucketed"] = lambda s, d: timeseries.locf_grid(
        _bucketed_points(s, d), T0, T1, GRID_STEP
    ).select("pvname", "t", "value")
    q["ts_sessions_bucketed"] = lambda s, d: timeseries.sessionize(
        _bucketed_points(s, d), gap_s=SESSION_GAP
    )
    # ...and the r9 smoother: the EWMA frame window is per-series too,
    # so the bucket layout deletes its one Exchange (plan pin in
    # tests/test_points_store.py); oracle identical to ts_ewma
    q["ts_ewma_bucketed"] = lambda s, d: timeseries.ewma(_bucketed_points(s, d))
    q["ts_minmax"] = lambda s, d: timeseries.minmax_times(_points(s, d))
    q["ts_nchanged"] = lambda s, d: timeseries.n_changed(
        points_view(s, d), T1, by="event_type"
    )
    q["ts_cull_band"] = lambda s, d: cull.cull_pass(_points(s, d))
    q["ts_deadband"] = lambda s, d: deadband.deadband_lag(_points(s, d), DEADTIME, DEADBAND)
    q["ts_locf_grid"] = lambda s, d: timeseries.locf_grid(
        _points(s, d), T0, T1, GRID_STEP
    ).select("pvname", "t", "value")
    # heartbeat-bounded as-of variants (r3 VERDICT task 6): the seed scan
    # reads [T0 - 2·HEARTBEAT, ...) instead of all history — the scan
    # shape a 100 TB store requires (exact under the W3 heartbeat floor;
    # on this raw data some series legitimately lose their seed, which
    # the oracle mirrors)
    q["ts_get_data_bounded"] = lambda s, d: timeseries.get_data(
        _points(s, d), T0, T1, lookback=ASOF_LOOKBACK
    )
    q["ts_locf_grid_bounded"] = lambda s, d: timeseries.locf_grid(
        _points(s, d), T0, T1, GRID_STEP, lookback=ASOF_LOOKBACK
    ).select("pvname", "t", "value")
    # gap-based sessionization (batch twin of streaming session_window;
    # same strict-merge boundary). 2-day gap on ~1.5-day median spacing
    # → real burst/quiet segmentation, not one-session-per-series
    q["ts_sessions"] = lambda s, d: timeseries.sessionize(
        _points(s, d), gap_s=SESSION_GAP
    )
    q["ts_heartbeat_fill"] = lambda s, d: deadband.heartbeat_fill(
        _points(s, d), max_silence=HEARTBEAT
    )
    q["ts_status_activity"] = lambda s, d: control.status_activity(
        points_view(s, d), T1
    )
    q["ts_enum_labels"] = lambda s, d: points_view(s, d).groupBy(
        _enum_label_col().alias("label")
    ).agg(F.count(F.lit(1)).alias("n"))

    def _alarm_transitions(s, d):
        """C16/§2.9 batch analog — ok→alarm crossings of a per-type
        threshold: value > trip while the previous sample was <= trip
        (the transition-only core of the alert engine; timeout gating is
        the stateful streaming variant, streaming/alerts.py)."""
        from pyspark.sql import Window

        w = Window.partitionBy("pvname").orderBy("time", "event_id")
        prev = F.lag("value").over(w)
        return (
            points_view(s, d)
            .withColumn("_prev", prev)
            .filter(
                (F.col("value") > ALARM_TRIP)
                & F.col("_prev").isNotNull()
                & (F.col("_prev") <= ALARM_TRIP)
            )
            .select("event_id", "pvname", "time", "value")
        )

    q["ts_alarm_transitions"] = _alarm_transitions

    def _with_current(s, d):
        """W9 — range read + early seed + live cache value appended
        (ref archiver.py:212-218); the 'cache' is latest_per_key."""
        pts = _points(s, d)
        cache = timeseries.latest_per_key(pts).select(*_PTS)
        return timeseries.with_current(timeseries.get_data(pts, T0, T1), cache)

    q["ts_with_current"] = _with_current

    def _instrument_restore(s, d):
        """J8 — instrument 'position' restore: each member PV's value as of
        T_ASOF (ref WebInstruments.py:255-259); literal member list → isin
        predicate pushed to the scan."""
        return control.instrument_restore(_points(s, d), INSTRUMENT, T_ASOF).select(*_PTS)

    q["ts_instrument_restore"] = _instrument_restore

    def _alert_eval(s, d):
        """C16 — threshold alert evaluation over the latest-value cache
        (ref cache.py:601-630); rules keyed by event_type, broadcast."""
        rules = s.createDataFrame(ALERT_RULES, "event_type string, compare string, trippoint double")
        cache = timeseries.latest_per_key(
            points_view(s, d).select("event_id", "pvname", "event_type", "time", "value")
        )
        return control.alert_eval(cache, rules).select(
            "pvname", "event_type", "time", "value", "compare", "trippoint"
        )

    q["ts_alert_eval"] = _alert_eval
    def _ts_cvalue(s, d):
        """C6 — hformat parity against vectors produced by EXECUTING the
        reference formatter (ref epicsarchiver/util.py:426-491; generated
        by tools/gen_hformat_vectors.py). The engine formats the raw
        inputs with the vectorized pandas UDF; the oracle is the
        reference's own recorded output — a true cross-implementation
        check, not Spark-vs-Spark."""
        from epicsarchiver_spark.functions.hformat_vectors import CVALUE_VECTORS

        src = s.createDataFrame(
            [(i, v) for i, v, _ in CVALUE_VECTORS], "vec_id long, value double"
        )
        return src.select("vec_id", hformat(F.col("value")).alias("cvalue"))

    q["ts_cvalue"] = _ts_cvalue
    # max_points sits above the cull's per-series floor (~3 rows/series:
    # first point + band extremes always survive a pass → ~2146 rows at
    # sf0.01's 750 series), so the loop terminates: 10000 → 5670 → 3500 →
    # 2402 ≤ 2500 in exactly 3 passes
    q["ts_cull_full"] = lambda s, d: cull.cull_data(_points(s, d), max_points=2500)
    q["ts_daily_rollup"] = lambda s, d: (
        points_view(s, d)
        .groupBy(
            F.col("event_type"),
            F.date_format(
                F.timestamp_seconds(F.col("time")), "yyyy-MM-dd"
            ).alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("event_type", "day")
    )
    def _ts_rollup_indexed(s, d):
        """Daily rollup through the PRODUCTION artifact: mergeable
        per-(type, day) integer partials persisted once per release,
        the year-scale dashboard reads bytes per series-day instead of
        raw points. Oracle identical to ts_daily_rollup (exact-cent
        finalization agrees with the double-sum lane on 2-dp data)."""
        from epicsarchiver_spark.sources.points_store import (
            read_rollup,
            write_rollup,
        )

        def _build(path):
            write_rollup(points_view(s, d), path, key="event_type")

        return read_rollup(
            s, _artifact_path(d, "daily_rollup", _build)
        ).orderBy("event_type", "day")

    q["ts_rollup_indexed"] = _ts_rollup_indexed
    # one-pass ROLLUP(type, day): detail + per-type + grand total via a
    # single Expand aggregate; BIGINT cent sums so the grand total is
    # reduce-order-exact
    q["ts_rollup_cube"] = lambda s, d: timeseries.rollup_cube(
        points_view(s, d), key="event_type"
    )
    q["ts_clean_values"] = lambda s, d: (
        points_view(s, d)
        .select("event_type", clean_value_num(F.col("value_str")).alias("v"))
        .groupBy("event_type")
        .agg(
            F.count("v").alias("n_numeric"),
            F.round(F.avg("v"), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )
    q["ts_meta_join"] = lambda s, d: (
        points_view(s, d)
        .join(
            F.broadcast(load_table(s, d, "customer")),
            F.col("pv_id") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )
    q["ts_percentiles"] = lambda s, d: (
        points_view(s, d)
        .groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.01)).alias("p01"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        .orderBy("event_type")
    )
    # hour-of-day percentile envelope — the band seasonal_anomalies'
    # residuals are measured against, as a plottable artifact
    q["ts_seasonal_profile"] = lambda s, d: timeseries.seasonal_profile(_points(s, d))
    q["ts_time_format"] = lambda s, d: points_view(s, d).select(
        "event_id",
        F.date_format(F.timestamp_seconds(F.col("time")), "yyyy-MM-dd HH:mm:ss").alias("iso"),
    )
    # C11 timehash (ref util.py:357-362) applied to each event's own
    # timestamp — deterministic in t, unlike the wall-clock call site
    q["ts_timehash"] = lambda s, d: points_view(s, d).select(
        "event_id", scalar.timehash(F.col("time")).alias("thash")
    )
    # S12 plot-JSON data plane: per-series aligned (x-ISO, y) arrays,
    # string-encoded so the driver canon can lexsort them
    q["ts_plot_traces"] = lambda s, d: (
        sinks.plot_traces(
            points_view(s, d).filter(F.col("pv_id") < 3).select("pvname", "time", "value")
        )
        .select(
            "pvname",
            F.concat_ws("|", "x").alias("x_iso"),
            F.concat_ws(
                "|", F.transform("y", lambda v: F.format_string("%.6f", v))
            ).alias("y_fmt"),
        )
        .orderBy("pvname")
    )

    # --- related-pairs graph (SURVEY §2.3 J5 / §2.4 A3-A4) ---
    q["rel_pair_scores"] = lambda s, d: related.canonical_pairs(_edges(s, d))
    q["rel_related_topk"] = lambda s, d: related.related_topk(_edges(s, d), RELATED_NODE, k=20)
    q["rel_score_sums"] = lambda s, d: related.score_sums(_edges(s, d), ["S:1", "S:2"])
    q["rel_orders_no_lineitem"] = lambda s, d: (
        load_table(s, d, "orders")
        .join(
            load_table(s, d, "lineitem").select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_anti",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )

    # --- catalog / search (SURVEY §2.2 F4, §2.4 A6) ---
    q["cat_wildcard"] = lambda s, d: search.wildcard_search(
        load_table(s, d, "customer"), "Customer#0000001*", name_col="c_name"
    ).select("c_custkey", "c_name", "c_mktsegment")
    q["cat_distinct_series"] = lambda s, d: search.distinct_names(_points(s, d))

    # --- relational bench queries ---
    q["rel_pricing_summary"] = lambda s, d: relational.pricing_summary(
        load_table(s, d, "lineitem")
    )
    q["rel_top_orders"] = lambda s, d: relational.top_unshipped_orders(
        load_table(s, d, "customer"), load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )
    q["rel_regional_revenue"] = lambda s, d: relational.regional_revenue(
        *[load_table(s, d, t) for t in ("region", "nation", "customer", "orders", "lineitem")]
    )
    q["rel_order_priority"] = lambda s, d: relational.order_priority_counts(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )

    # --- documents: dedup + text analysis ---
    q["doc_fingerprints"] = lambda s, d: text_ops.text_stats(
        load_table(s, d, "documents")
    ).select(
        "doc_id",
        # long on both sides: DuckDB length()/len() are BIGINT and the
        # driver hash is pandas-dtype-sensitive
        F.col("n_chars_actual").cast("long").alias("n_chars_actual"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        "mean_token_len",
        "fingerprint",
    )
    q["doc_exact_dups"] = lambda s, d: dedup.exact_duplicates(load_table(s, d, "documents"))
    q["doc_dedup_exact"] = lambda s, d: dedup.dedup_exact(
        load_table(s, d, "documents")
    ).select("doc_id", "lang", "source")
    q["doc_quality"] = lambda s, d: text_ops.quality_scores(load_table(s, d, "documents"))
    q["doc_gopher_rules"] = lambda s, d: text_ops.gopher_rules(load_table(s, d, "documents"))
    # clickstream analytics over the RAW events table (funnel / cohort /
    # JSON-props / rolling-DAU) — the product-analytics verbs a complete
    # engine over the same event log needs; see operators/events.py
    q["ev_funnel"] = lambda s, d: ev.funnel(
        load_table(s, d, "events"), FUNNEL_STEPS
    )
    q["ev_funnel_times"] = lambda s, d: ev.funnel_times(
        load_table(s, d, "events"), FUNNEL_STEPS
    )
    q["ev_retention"] = lambda s, d: ev.retention_cohorts(load_table(s, d, "events"))
    q["ev_props_rollup"] = lambda s, d: ev.props_rollup(load_table(s, d, "events"))
    q["ev_rolling_dau"] = lambda s, d: ev.rolling_dau(load_table(s, d, "events"))
    q["doc_tfidf_top_terms"] = lambda s, d: text_ops.tfidf_top_terms(
        load_table(s, d, "documents"), k=3
    )
    # BM25 keyword retrieval — the search lane over the corpus; one
    # query term ('quantum') is deliberately absent from the synthetic
    # vocabulary to exercise the zero-df path
    q["doc_bm25_topk"] = lambda s, d: text_ops.bm25_topk(
        load_table(s, d, "documents"), BM25_QUERY, k=20
    )

    # ...and the standing-search shape: term-sorted postings + stats
    # written once per corpus (artifact lane), each query a pruned read
    def _doc_bm25_indexed(s, d):
        def _build(path):
            text_ops.build_bm25_index(load_table(s, d, "documents"), path)

        return text_ops.bm25_topk_indexed(
            s, _artifact_path(d, "bm25_index", _build), BM25_QUERY, k=20
        )

    q["doc_bm25_indexed"] = _doc_bm25_indexed

    # hybrid search: the BM25 lexical lane and the exact-cosine semantic
    # lane (doc_id ≡ vec_id on this corpus) fused by reciprocal rank —
    # integer contributions make the fusion engine-exact; each lane is a
    # bounded top-50 frame, so fusion itself never rescans the corpus
    def _doc_hybrid_rrf(s, d):
        lex = text_ops.bm25_topk(load_table(s, d, "documents"), BM25_QUERY, k=50)
        sem = text_ops.ranked_lane(
            similarity.brute_force_topk(
                load_table(s, d, "embeddings"), _query_vec(s, d), k=50
            ),
            score_col="cosine_sim",
            id_col="vec_id",
        ).withColumnRenamed("vec_id", "doc_id")
        return text_ops.rrf_fuse(
            {"lex": lex.select("doc_id", "rank"), "sem": sem.select("doc_id", "rank")},
            k=20,
        )

    q["doc_hybrid_rrf"] = _doc_hybrid_rrf

    # three-lane fusion: BM25 + Dirichlet QLD + cosine — the n_lanes>2
    # path of rrf_fuse, still exact-integer (3 BIGINT quotients sum
    # order-free)
    def _doc_hybrid_rrf3(s, d):
        docs = load_table(s, d, "documents")
        # both keyword lanes start from the SAME (id, _dl, _hit)
        # projection — build it once, persist, share (r14, guide §2.4;
        # previously bm25 re-tokenized the corpus twice next to qld's
        # persisted copy of the identical frame)
        base = dedup.private_persist(
            text_ops.query_match_base(docs, BM25_QUERY)
        )
        lex = text_ops.bm25_topk(docs, BM25_QUERY, k=50, base=base)
        qld = text_ops.qld_topk(docs, BM25_QUERY, k=50, base=base)
        sem = text_ops.ranked_lane(
            similarity.brute_force_topk(
                load_table(s, d, "embeddings"), _query_vec(s, d), k=50
            ),
            score_col="cosine_sim",
            id_col="vec_id",
        ).withColumnRenamed("vec_id", "doc_id")
        return text_ops.rrf_fuse(
            {
                "lex": lex.select("doc_id", "rank"),
                "qld": qld.select("doc_id", "rank"),
                "sem": sem.select("doc_id", "rank"),
            },
            k=20,
        )

    q["doc_hybrid_rrf3"] = _doc_hybrid_rrf3

    # standing-query BM25: four queries, one corpus pass — per-query
    # scores contractually identical to bm25_topk's
    q["doc_bm25_multi"] = lambda s, d: text_ops.bm25_multi(
        load_table(s, d, "documents"), MULTI_QUERIES, k=10
    )

    # result-page highlighting: the width-10 token window holding the
    # most query terms per doc (earliest tie), zero-shuffle projection
    q["doc_snippets"] = lambda s, d: text_ops.snippet_window(
        load_table(s, d, "documents"), BM25_QUERY, width=10
    )

    # "related searches": windowed co-occurrence PMI around 'spark'
    q["doc_related_terms"] = lambda s, d: text_ops.related_terms(
        load_table(s, d, "documents"), "spark", window=4, k=15, min_count=2
    )

    # the other classical ranker: query-likelihood with Dirichlet
    # smoothing — every doc scores (length term), matched pairs carry
    # the sparse correction
    q["doc_qld_topk"] = lambda s, d: text_ops.qld_topk(
        load_table(s, d, "documents"), BM25_QUERY, k=20
    )

    # two-round retrieval: pseudo-relevance feedback mines expansion
    # terms from the top-5 BM25 docs and re-ranks with the widened
    # query — the full loop (rank → mine → re-rank) is one oracle
    q["doc_bm25_prf"] = lambda s, d: text_ops.bm25_prf(
        load_table(s, d, "documents"), BM25_QUERY, k=20, fb_docs=5, fb_terms=3
    )

    # keyword-taxonomy classification: every doc labeled by its best
    # BM25-scoring keyword set (the curation domain-filter stage)
    q["doc_keyword_labels"] = lambda s, d: text_ops.keyword_labels(
        load_table(s, d, "documents"), KEYWORD_TAXONOMY
    )
    q["doc_chunks"] = lambda s, d: text_ops.chunk_documents(
        load_table(s, d, "documents"), chunk_tokens=32, overlap=8
    )
    q["doc_splits"] = lambda s, d: text_ops.assign_splits(
        load_table(s, d, "documents")
    ).select("doc_id", "split")
    q["doc_repetition"] = lambda s, d: text_ops.repetition_stats(load_table(s, d, "documents"))

    def _contamination(s, d):
        docs = load_table(s, d, "documents")
        return text_ops.contamination_overlap(
            docs.filter(F.col("doc_id") % 97 != 0), docs.filter(F.col("doc_id") % 97 == 0), n=3
        )

    q["doc_contamination"] = _contamination
    q["doc_global_shuffle"] = lambda s, d: text_ops.global_shuffle(load_table(s, d, "documents"))
    q["doc_pack_sequences"] = lambda s, d: text_ops.pack_sequences(
        text_ops.chunk_documents(load_table(s, d, "documents"), chunk_tokens=32, overlap=8),
        seq_tokens=64,
    )
    q["doc_rebalance"] = lambda s, d: text_ops.rebalance_sources(
        load_table(s, d, "documents"), {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    ).select("doc_id", "source")
    q["doc_pii_scrub"] = lambda s, d: text_ops.scrub_pii(load_table(s, d, "documents"))

    q["doc_segment_dedup"] = lambda s, d: text_ops.dedup_segments(
        load_table(s, d, "documents"), sep=" "
    )
    # jusText-lite boilerplate scoring: fixed-window segmentation on
    # the line-less corpus, integer cross-multiplied density rules
    q["doc_boilerplate"] = lambda s, d: text_ops.boilerplate_segments(
        load_table(s, d, "documents"),
        seg_words=BOILER_SEG_WORDS,
        stopwords=BOILER_STOPWORDS,
        min_words=BOILER_MIN_WORDS,
    )
    # encoding-damage detector: U+FFFD / C1 / UTF-8-as-Latin-1 digraph
    # regexp counts, integer ppm score
    q["doc_mojibake"] = lambda s, d: text_ops.mojibake_stats(
        load_table(s, d, "documents")
    )

    q["doc_unigram_logprob"] = lambda s, d: text_ops.unigram_logprob(
        load_table(s, d, "documents")
    )

    q["doc_bigram_logprob"] = lambda s, d: text_ops.bigram_logprob(
        load_table(s, d, "documents")
    )

    q["doc_quality_classifier"] = lambda s, d: text_ops.quality_classifier(
        load_table(s, d, "documents")
    )

    # embedding-space decontamination: benchmark = every 25th vector (the
    # members themselves must flag contaminated; near-copies too)
    q["emb_contamination"] = lambda s, d: similarity.semantic_contamination(
        load_table(s, d, "embeddings"),
        load_table(s, d, "embeddings").filter(F.col("vec_id") % 25 == 0),
        threshold=0.9,
    )

    # exact-substring span dedup (ExactSubstr, Lee et al. 2022): excise
    # every token covered by a length-8 window whose rolling hash occurs
    # ≥2 times anywhere in the corpus (md5 two-lane fold basis — the
    # oracle reproduces every hash bit-for-bit)
    q["doc_substring_dedup"] = lambda s, d: dedup.dedup_substrings(
        load_table(s, d, "documents"), window=8
    )

    # corpus vocabulary audit: top-k terms by tf with df, deterministic
    # term tiebreak (two-level aggregate, no count-distinct; top-k is a
    # TakeOrderedAndProject)
    q["doc_vocab_topk"] = lambda s, d: text_ops.vocabulary_topk(
        load_table(s, d, "documents"), k=200
    )
    # deterministic stratified sample: ≤20 docs per source by hash order
    q["doc_sample_stratified"] = lambda s, d: text_ops.sample_stratified(
        load_table(s, d, "documents"), per_stratum=20, strata=("source",)
    ).select("doc_id", "source", "lang")

    q["ts_rate_windowed"] = lambda s, d: timeseries.rate_windowed(
        _points(s, d), window_s=3600.0
    )
    # time-weighted mean of the LOCF staircase (heartbeat-bounded seed
    # scan) and server-side plot decimation — the two viewer-side
    # reductions a 100 TB archive must push into the engine
    q["ts_twa"] = lambda s, d: timeseries.time_weighted_avg(
        _points(s, d), T0, T1, lookback=ASOF_LOOKBACK
    )
    q["ts_decimate"] = lambda s, d: timeseries.decimate_minmax(
        _points(s, d), T0, T1, n_buckets=16
    )
    q["rel_returned_items"] = lambda s, d: relational.returned_item_revenue(
        load_table(s, d, "customer"),
        load_table(s, d, "orders"),
        load_table(s, d, "lineitem"),
        load_table(s, d, "nation"),
    )
    q["rel_supplier_parts"] = lambda s, d: relational.supplier_part_counts(
        load_table(s, d, "part"),
        load_table(s, d, "lineitem"),
        load_table(s, d, "supplier"),
    )

    def _doc_incremental_dedup(s, d):
        """Incremental exact dedup: a synthetic NEW batch built from the
        corpus itself — every doc_id%5==0 text verbatim (must be dropped:
        fingerprint already in the corpus) plus every doc_id%7==3 text
        with a suffix (must survive: unseen fingerprint)."""
        docs = load_table(s, d, "documents").select("doc_id", "text")
        new = (
            docs.filter(F.col("doc_id") % 5 == 0)
            .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
            .unionByName(
                docs.filter(F.col("doc_id") % 7 == 3).select(
                    (F.col("doc_id") + 20000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" unseen")).alias("text"),
                )
            )
        )
        return dedup.dedup_against_corpus(new, docs)

    q["doc_incremental_dedup"] = _doc_incremental_dedup

    def _doc_bloom_dedup(s, d):
        """The SAME incremental-dedup semantics through the bloom-
        accelerated path: corpus fingerprint bloom built distributed
        (mapInPandas partial bitmaps, bit_or-reduced), batch rows the
        bloom clears skip the anti-join, maybe-rows are confirmed
        exactly. No false negatives → identical result to the plain
        anti-join, which is what the oracle checks."""
        docs = load_table(s, d, "documents").select("doc_id", "text")
        new = (
            docs.filter(F.col("doc_id") % 5 == 0)
            .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
            .unionByName(
                docs.filter(F.col("doc_id") % 7 == 3).select(
                    (F.col("doc_id") + 20000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" unseen")).alias("text"),
                )
            )
        )
        bloom = dedup.build_fingerprint_bloom(docs, fpp=0.01)
        return dedup.dedup_against_corpus_bloom(new, docs, bloom)

    q["doc_bloom_dedup"] = _doc_bloom_dedup
    q["doc_langid"] = lambda s, d: text_ops.langid_eval(load_table(s, d, "documents"))
    # pair operators return UNORDERED sets since r14 (the trailing sort
    # only ever served presentation and was materialized by downstream
    # persists — guide §2.4); the direct gates sort HERE so their
    # executed output order is byte-identical to previous rounds
    q["doc_jaccard_pairs"] = lambda s, d: dedup.jaccard_pairs_blocked(
        load_table(s, d, "documents"), shingle_k=2, threshold=0.05
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")).orderBy(
        "id_a", "id_b"
    )
    # near-dup GROUP resolution: pairs → connected components (min-id label)
    q["doc_dedup_groups"] = lambda s, d: dedup.connected_components_star(
        dedup.jaccard_pairs_blocked(load_table(s, d, "documents"), shingle_k=2, threshold=0.05)
    ).select(F.col("id").alias("doc_id"), "component")
    # ...and the canonical survivors after dropping non-representatives
    q["doc_dedup_survivors"] = lambda s, d: dedup.dedup_near(
        load_table(s, d, "documents"),
        dedup.jaccard_pairs_blocked(load_table(s, d, "documents"), shingle_k=2, threshold=0.05),
    ).select("doc_id", "lang", "source")

    # --- embeddings: similarity search ---
    def _query_vec(s: SparkSession, d: str) -> list[float]:
        row = load_table(s, d, "embeddings").filter(F.col("vec_id") == 0).head()
        return [float(x) for x in row["embedding"]]

    q["emb_topk_cosine"] = lambda s, d: similarity.brute_force_topk(
        load_table(s, d, "embeddings"), _query_vec(s, d), k=10
    )
    q["emb_quantize"] = lambda s, d: similarity.quantize_embeddings(
        load_table(s, d, "embeddings")
    )
    # per-dim z-scoring from exact integer moments — the LSH/PQ
    # preprocessing lane; statistics re-enter the plan as literals.
    # The gate presents LONG-FORM (vec_id, pos, z) — the emb_cell_stats
    # pattern — because the driver's pandas sort_values canonicalization
    # cannot sort raw array cells (the r9 never-green lesson)
    q["emb_standardize"] = lambda s, d: (
        similarity.standardize_embeddings(load_table(s, d, "embeddings"))
        .select("vec_id", F.posexplode("embedding_std").alias("pos", "z"))
        .select("vec_id", (F.col("pos") + 1).cast("long").alias("pos"), "z")
    )
    q["emb_pairwise_topk"] = lambda s, d: similarity.pairwise_topk(
        load_table(s, d, "embeddings"),
        load_table(s, d, "embeddings").filter(F.col("vec_id") < 5),
        k=5,
    ).select("probe_id", "corpus_id", F.round("cosine_sim", 6).alias("cosine_sim"))
    q["emb_cosine_neardups"] = lambda s, d: similarity.cosine_near_duplicates(
        load_table(s, d, "embeddings"), threshold=0.38
    )
    # semantic dedup groups: components of the exact-cosine pair graph
    q["emb_dedup_groups"] = lambda s, d: dedup.connected_components_star(
        similarity.cosine_near_duplicates(load_table(s, d, "embeddings"), threshold=0.38)
    ).select(F.col("id").alias("vec_id"), "component")

    def _media(s, d):
        """Deterministic media frame derived from documents: payload =
        utf-8 bytes of text, kind cycles image/audio/video by doc_id —
        makes the multimodal operators driver-checkable without binary
        fixtures."""
        docs = load_table(s, d, "documents")
        kind = F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        )
        return docs.select(
            F.col("doc_id").cast("string").alias("media_id"),
            kind.alias("kind"),
            F.concat(F.lit("x/"), kind).alias("mime"),
            F.when(kind == "image", (F.col("doc_id") % 64 + 1).cast("int")).alias("width"),
            F.when(kind == "image", (F.col("doc_id") % 48 + 1).cast("int")).alias("height"),
            F.when(kind != "image", (F.col("n_chars") * 10).cast("int")).alias("duration_ms"),
            F.encode("text", "UTF-8").alias("payload"),
        )

    q["mm_media_stats"] = lambda s, d: multimodal.media_stats(_media(s, d)).select(
        "kind", "n", F.round("avg_bytes", 6).alias("avg_bytes"), "max_width"
    )

    def _mm_features(s, d):
        """Feature extraction presented canonically: the fake codec's
        feature f_j = (chunk_sum_j % 997)/997 stored as float32 — project
        the exact integer k_j = round(f_j*997) per dimension (float32
        error ≤ ~1e-4 ≪ 0.5, so recovery is exact) so the frame is
        lexsortable and oracle-comparable with no float noise."""
        feats = multimodal.extract_features(_media(s, d))
        ks = [
            F.round(F.element_at("feature", j + 1).cast("double") * 997).cast("long").alias(f"k{j}")
            for j in range(multimodal.DeterministicFakeCodec.dim)
        ]
        return feats.select("media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes"), *ks)

    q["mm_features"] = _mm_features
    q["mm_frame_sample"] = lambda s, d: multimodal.sample_video_frames(
        _media(s, d), every_ms=10_000
    ).select("media_id", "frame_idx", "offset_ms", F.length("frame").alias("frame_bytes"))
    q["emb_cosine_neardups_banded"] = lambda s, d: similarity.cosine_near_duplicates_banded(
        load_table(s, d, "embeddings"), threshold=0.38, n_planes=16, bands=8
    )
    # basis="md5": the SQL-portable shingle basis + affine-mod-p MinHash
    # family, so the DuckDB oracle reproduces signatures bit-for-bit (the
    # default xxhash basis keeps its quantified recall cross-check in
    # tests/test_operator_consistency.py)
    q["doc_minhash_neardups"] = lambda s, d: dedup.minhash_near_duplicates(
        load_table(s, d, "documents"), threshold=0.5, shingle_k=2, basis="md5"
    ).orderBy("id_a", "id_b")
    q["doc_simhash_neardups"] = lambda s, d: dedup.simhash_near_duplicates(
        load_table(s, d, "documents"), shingle_k=2, max_hamming=8, basis="md5"
    ).orderBy("id_a", "id_b")

    # MinHash through the persisted-signature artifact: the (id, sig)
    # table is written once per corpus release (minhash_signatures) and
    # the candidate join reads it back — text never re-shingles. Oracle
    # identical to doc_minhash_neardups (same signatures, same bands).
    def _doc_minhash_indexed(s, d):
        docs = load_table(s, d, "documents")

        def _build(path):
            dedup.minhash_signatures(
                docs, shingle_k=2, basis="md5"
            ).write.mode("overwrite").parquet(path)

        sig = s.read.parquet(_artifact_path(d, "minhash_sig", _build))
        return dedup.minhash_near_duplicates(
            None, threshold=0.5, signatures=sig
        ).orderBy("id_a", "id_b")

    q["doc_minhash_indexed"] = _doc_minhash_indexed
    q["emb_topk_lsh"] = lambda s, d: similarity.lsh_bucket_topk(
        load_table(s, d, "embeddings"), _query_vec(s, d), k=10, n_planes=8, max_hamming=2
    )
    q["emb_topk_ivf"] = lambda s, d: similarity.ivf_topk(
        load_table(s, d, "embeddings"), _query_vec(s, d), k=10, n_cells=8, n_probe=4
    )

    def _emb_topk_lsh_multi(s, d):
        """Multi-probe ANN: every vec_id < 3 probes the corpus through the
        hamming-ball broadcast equi-join (no bit_count theta-join)."""
        vecs = load_table(s, d, "embeddings")
        return similarity.lsh_pairwise_topk(
            vecs, vecs.filter(F.col("vec_id") < 3), k=5, n_planes=8, max_hamming=1
        )

    q["emb_topk_lsh_multi"] = _emb_topk_lsh_multi

    q["emb_cell_assign"] = lambda s, d: similarity.assign_cells(
        load_table(s, d, "embeddings"), n_cells=8, dim=64
    )
    # per-cluster profile, presented long-form (cell, pos, c) so the
    # value-hash compares scalars, not array renderings
    q["emb_cell_stats"] = lambda s, d: similarity.cell_stats(
        load_table(s, d, "embeddings"), n_cells=8, dim=64
    ).select(
        "cell",
        "n_vectors",
        "mean_norm",
        F.posexplode("centroid").alias("pos", "c"),
    )
    q["ts_compress_exact"] = lambda s, d: deadband.compress_sequential(
        _points(s, d), COMPRESS_DEADTIME, COMPRESS_DEADBAND
    )

    def _stream_compress(s, d):
        """W1/W2 end-to-end through Structured Streaming: the sf events
        replayed as a file stream → stateful deadtime/deadband compressor →
        bucketed parquet append (S15), availableNow-bounded. Oracle: the
        same recursive-CTE state walk as ts_compress_exact, minus the
        final pending flush — with flush_ms=None the limbo tail stays in
        state at end of a bounded run (see compressed_stream docstring)."""
        import tempfile

        from epicsarchiver_spark.streaming.ingest import archive_query, compressed_stream

        tmp = tempfile.mkdtemp(prefix="pvarch_q_stream_")
        src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
        _points(s, d).select("pvname", "time", "value").coalesce(2).write.mode(
            "overwrite"
        ).parquet(src)
        stream = s.readStream.schema("pvname string, time double, value double").parquet(src)
        qh = (
            archive_query(
                compressed_stream(
                    stream,
                    deadtime=COMPRESS_DEADTIME,
                    deadband=COMPRESS_DEADBAND,
                    flush_ms=None,
                ),
                out,
                ckpt,
                buckets=32,
            )
            .trigger(availableNow=True)
            .start()
        )
        qh.awaitTermination(600)
        return s.read.parquet(out).select("pvname", "time", "value")

    q["stream_compress"] = _stream_compress

    # --- driver-gate coverage for the catalog / sink / source surface ----
    def _names(s, d):
        return points_view(s, d).select("pvname").distinct()

    q["cat_normalize"] = lambda s, d: _names(s, d).select(
        "pvname",
        scalar.normalize_pvname(F.col("pvname")).alias("normalized"),
        scalar.valid_pvname(F.col("pvname")).alias("valid"),
        scalar.clean_string(F.concat(F.col("pvname"), F.lit(" ;comment # x"))).alias(
            "cleaned"
        ),
    )

    q["cat_hashname"] = lambda s, d: _names(s, d).select(
        "pvname", scalar.hashname_parity(F.col("pvname")).alias("bucket")
    )

    def _cat_chararray(s, d):
        """C12 — identity round-trip: event_type → int-waveform string
        ("[99,108,...,0,120]" with a NUL stop + trailing junk) → decoded
        text; the oracle pins decoded == original."""
        et = points_view(s, d).select("event_type").distinct()
        codes = F.array_join(
            F.transform(F.split(F.col("event_type"), ""), lambda c: F.ascii(c).cast("string")),
            ",",
        )
        encoded = F.concat(F.lit("["), codes, F.lit(",0,120]"))
        return et.select(
            "event_type", scalar.chararray_as_string(encoded).alias("decoded")
        )

    q["cat_chararray"] = _cat_chararray

    def _cat_desc_join(s, d):
        """J6 — the .DESC description join over a derived cache: each
        series contributes a '<pv>.VAL' row (latest value) and a
        '<pv>.DESC' row (its event_type as the description text)."""
        latest = timeseries.latest_per_key(
            points_view(s, d).select("event_id", "pvname", "time", "value", "event_type")
        )
        vals = latest.select(
            F.concat("pvname", F.lit(".VAL")).alias("pvname"),
            F.format_string("%.2f", F.col("value")).alias("value"),
        )
        descs = latest.select(
            F.concat("pvname", F.lit(".DESC")).alias("pvname"),
            F.col("event_type").alias("value"),
        )
        return control.desc_join(vals.unionByName(descs)).select(
            "pvname", "value", "description"
        )

    q["cat_desc_join"] = _cat_desc_join

    q["cat_yesno_json"] = lambda s, d: (
        points_view(s, d)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            scalar.yes_no(F.pmod(F.col("n"), F.lit(2))).alias("odd_yn"),
            scalar.enum_strs_to_json(
                F.array(F.col("event_type"), F.lit("other"))
            ).alias("enum_json"),
            F.element_at(
                scalar.enum_strs_from_json(
                    scalar.enum_strs_to_json(F.array(F.col("event_type")))
                ),
                1,
            ).alias("roundtrip"),
        )
    )

    def _rel_runs_window(s, d):
        """J2 — interval join over a derived daily runs dimension."""
        runs = (
            points_view(s, d)
            .groupBy(F.floor(F.col("time") / 86400.0).cast("long").alias("dayn"))
            .agg(F.min("time").alias("start_time"), F.max("time").alias("stop_time"))
            .select(
                F.concat(F.lit("run_"), F.col("dayn")).alias("db"),
                "start_time",
                "stop_time",
            )
        )
        return points_store.runs_for_window(runs, T0, T1)

    q["rel_runs_window"] = _rel_runs_window

    def _store_roundtrip(s, d):
        """S10+S5 — write the points through the run/bucket-partitioned
        store layout and read them back; the oracle (a plain scan) pins
        byte-exact value/time survival through the parquet round trip."""
        import tempfile

        tmp = tempfile.mkdtemp(prefix="pvarch_q_store_")
        pts = points_view(s, d).select("pvname", "time", "value")
        points_store.write_points(pts, f"{tmp}/store", run="r1", n_buckets=16, mode="overwrite")
        return points_store.read_points(s, f"{tmp}/store").select("pvname", "time", "value")

    q["store_roundtrip"] = _store_roundtrip

    # time quantized to exact milliseconds with explicit arithmetic
    # (floor(t*1000+0.5)/1000) — Java's %.3f rounds the shortest decimal
    # repr HALF_UP while C printf rounds the binary value half-even, so
    # a raw double time diverges cross-engine at ...xxx5 µs values
    q["sink_ascii"] = lambda s, d: sinks.ascii_rows(
        points_view(s, d).select(
            "pvname",
            (F.floor(F.col("time") * 1000 + 0.5) / 1000.0).alias("time"),
            F.format_string("%.2f", F.col("value")).alias("value"),
        )
    )

    def _sink_saverestore(s, d):
        latest = timeseries.latest_per_key(
            points_view(s, d).select("event_id", "pvname", "time", "value")
        )
        vals = latest.select(
            "pvname", F.format_string("%.2f", F.col("value")).alias("value")
        )
        return sinks.saverestore_lines(vals, fmt="python")

    q["sink_saverestore"] = _sink_saverestore

    q["sink_sqldump"] = lambda s, d: sinks.sql_dump_lines(
        points_view(s, d).select(
            "pvname",
            F.format_string("%.6f", F.col("time")).alias("ts"),
            F.format_string("%.2f", F.col("value")).alias("val"),
        ),
        "pvdat",
    )

    def _cat_parse_times(s, d):
        """C8/C10 — window parsing vs vectors recorded by EXECUTING the
        reference parser with a frozen clock (tools/gen_parse_time_vectors
        .py; ref web_utils.py:31-90). Driver-side per SURVEY — the query
        just presents the helper's outputs for the hash gate."""
        from epicsarchiver_spark.functions.parse_time_vectors import (
            PARSE_TIME_NOW,
            PARSE_TIME_VECTORS,
        )
        from epicsarchiver_spark.functions.times import parse_times

        rows = [
            (i, *parse_times(d1, d2, now=PARSE_TIME_NOW))
            for i, d1, d2, _, _ in PARSE_TIME_VECTORS
        ]
        return s.createDataFrame(rows, "vec_id long, t0 double, t1 double")

    q["cat_parse_times"] = _cat_parse_times

    def _src_pvlist(s, d):
        """S7 — PV-list file source driven end-to-end: a pairs file
        derived from the catalog (two names per line, comments, blanks)
        is written driver-side, then parsed DISTRIBUTED by read_pvlist /
        pvlist_pairs; the oracle re-derives the same pairing from the
        sorted distinct names in SQL."""
        import tempfile

        names = sorted(r.pvname for r in points_view(s, d).select("pvname").distinct().collect())
        tmp = tempfile.mkdtemp(prefix="pvarch_q_pvlist_")
        path = f"{tmp}/pvlist.txt"
        with open(path, "w") as fh:
            fh.write("# generated pairs file\n\n")
            for i in range(0, len(names) - 1, 2):
                fh.write(f"{names[i]}, {names[i + 1]}  # pair\n")
            if len(names) % 2:
                fh.write(f"{names[-1]}\n")
        from epicsarchiver_spark.sources import pvlist

        return pvlist.pvlist_pairs(s, path)

    q["src_pvlist"] = _src_pvlist

    def _src_template(s, d):
        """S8+J7 — template page compiled and resolved against the
        latest-value cache: six catalog names in three rows under one
        section, with rules/spacers/comments exercising the parser."""
        import tempfile

        from epicsarchiver_spark.sources import template as tpl_mod

        names = sorted(
            r.pvname for r in points_view(s, d).select("pvname").distinct().collect()
        )[:6]
        tmp = tempfile.mkdtemp(prefix="pvarch_q_tpl_")
        path = f"{tmp}/page.tpl"
        with open(path, "w") as fh:
            fh.write("# status page\n[Main]\n")
            for i in range(3):
                fh.write(f"{names[2 * i]}, {names[2 * i + 1]} | pair {i} | %8.3f\n")
            fh.write("--\n<>\n")
        tpl = tpl_mod.read_template(s, path)
        latest = timeseries.latest_per_key(
            points_view(s, d).select("event_id", "pvname", "time", "value")
        )
        cache = latest.select("pvname", F.format_string("%.2f", F.col("value")).alias("value"))
        return tpl_mod.page_model(tpl, cache).select(
            "section", "description", "format", "pvname", "value"
        )

    q["src_template"] = _src_template

    def _ctl_apply_requests(s, d):
        """§2.9 control plane — request-queue drain against the catalog:
        every ':error' series suspended, ':click' dropped, one new name
        added; latest request per pvname wins."""
        pv = points_view(s, d).select("pvname").distinct().select(
            "pvname", F.lit("yes").alias("active")
        )
        reqs = pv.select(
            "pvname",
            F.when(F.col("pvname").endswith(":error"), F.lit("suspend"))
            .when(F.col("pvname").endswith(":click"), F.lit("drop"))
            .otherwise(F.lit("ignore"))
            .alias("action"),
            F.lit(1.0).alias("ts"),
            F.lit(1).alias("id"),
        ).unionByName(
            s.createDataFrame(
                [("NEW:0:added", "add", 2.0, 2)], "pvname string, action string, ts double, id int"
            )
        )
        return control.apply_requests(pv, reqs)

    q["ctl_apply_requests"] = _ctl_apply_requests

    def _ctl_rotate_runs(s, d):
        """Run rotation as metadata: daily runs + an open current run;
        rotate at T1 closes the open run and appends the next."""
        runs = (
            points_view(s, d)
            .groupBy(F.floor(F.col("time") / 86400.0).cast("long").alias("dayn"))
            .agg(F.min("time").alias("start_time"), F.max("time").alias("stop_time"))
            .select(
                F.concat(F.lit("run_"), F.col("dayn")).alias("db"), "start_time", "stop_time"
            )
        )
        cur = s.createDataFrame(
            [("run_current", T1 - 86400.0, control.MAX_EPOCH)],
            "db string, start_time double, stop_time double",
        )
        return control.rotate_runs(runs.unionByName(cur), now=T1, next_db="run_next")

    q["ctl_rotate_runs"] = _ctl_rotate_runs

    def _ctl_pair_increment(s, d):
        """Pair-score usage increment: +1 per co-use edge, canonical
        order, capped (ref cache.py:836-880) — incremented with its own
        edge set, so every canonical pair gains exactly +1."""
        edges = related.canonical_pairs(_edges(s, d))
        return control.increment_pair_scores(edges, edges.drop("score"))

    q["ctl_pair_increment"] = _ctl_pair_increment

    def _ctl_position_save(s, d):
        """Instrument position save + named restore (ref
        WebInstruments.py:79-84 save, 255-259 restore): saving stores
        only (instrument, name, ts); a re-save of the same name moves it
        (REPLACE semantics); restore is the J8 as-of read at the looked-up
        ts. 'park' is saved at T0 then re-saved at T_ASOF — the restore
        must see the re-save."""
        pos = control.save_position(None, s, "beamline", "park", T0)
        pos = control.save_position(pos, s, "beamline", "run", T1)
        pos = control.save_position(pos, s, "beamline", "park", T_ASOF)
        return control.restore_position(
            _points(s, d), pos, INSTRUMENT, "beamline", "park"
        ).select(*_PTS)

    q["ctl_position_save"] = _ctl_position_save

    # --- new in r4b: distribution / outlier / projection / media-dedup ---
    q["ts_histogram"] = lambda s, d: timeseries.value_histogram(
        _points(s, d), n_bins=HIST_BINS
    )
    q["ts_outliers"] = lambda s, d: timeseries.robust_outliers(
        _points(s, d), k=OUTLIER_K
    )
    q["rel_disjunctive_revenue"] = lambda s, d: relational.disjunctive_revenue(
        load_table(s, d, "lineitem"), load_table(s, d, "part")
    )

    def _emb_project(s, d):
        """Signed random projection 64→16, presented long-form (vec_id,
        pos, value) with round(6) so the value-hash compares scalars (the
        fold is sequential and engine-reproducible; rounding guards the
        oracle's list_dot_product reduce order)."""
        proj = similarity.random_project(
            load_table(s, d, "embeddings"), out_dim=PROJ_DIM, dim=64
        )
        return proj.select(
            "vec_id", F.posexplode("projected").alias("pos", "value")
        ).select("vec_id", "pos", F.round("value", 6).alias("value"))

    q["emb_project"] = _emb_project

    q["mm_ahash"] = lambda s, d: multimodal.media_ahash(_media(s, d)).select(
        "media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes"), "ahash"
    )
    q["mm_near_dups"] = lambda s, d: multimodal.near_dup_media(
        _media(s, d), max_hamming=3
    )
    # exact-integer Pearson correlation between series on the daily LOCF
    # grid, blocked by the series' trailing name component
    q["ts_correlation"] = lambda s, d: timeseries.series_correlation(
        _points(s, d), T0, T1, GRID_STEP, min_abs_r=CORR_MIN_R
    ).select("pv_a", "pv_b", "n", F.round("r", 6).alias("r"))
    q["doc_length_trim"] = lambda s, d: text_ops.length_percentile_trim(
        load_table(s, d, "documents")
    )
    q["emb_pq_codes"] = lambda s, d: similarity.pq_codes(
        load_table(s, d, "embeddings")
    )
    q["emb_ivfpq_topk"] = lambda s, d: similarity.ivfpq_topk(
        load_table(s, d, "embeddings"), _query_vec(s, d), k=10, n_cells=8, n_probe=4
    ).select("vec_id", F.round("adc_dist", 6).alias("adc_dist"))
    # two-stage retrieval: the same ADC index nominates 50 candidates,
    # exact cosine re-ranks only those ids (isin pushes into the scan)
    q["emb_ivfpq_rerank"] = lambda s, d: similarity.ivfpq_topk_rerank(
        load_table(s, d, "embeddings"),
        _query_vec(s, d),
        k=10,
        n_candidates=50,
        n_cells=8,
        n_probe=4,
    )
    # diversity-aware retrieval: greedy MMR over the exact-cosine
    # candidate set — the oracle replays the greedy loop as a DuckDB
    # recursive CTE, so even the iterative pick sequence is certified
    q["emb_mmr_topk"] = lambda s, d: similarity.mmr_topk(
        load_table(s, d, "embeddings"), _query_vec(s, d), k=8, n_candidates=30
    )

    # ranking-quality report: the cosine lane judged against label
    # relevance (gain 1 where label == the anchor's) — precision@k /
    # MRR / nDCG@k with the exact-integer discount table
    def _emb_retrieval_eval(s, d):
        emb = load_table(s, d, "embeddings")
        lane = text_ops.ranked_lane(
            similarity.brute_force_topk(emb, _query_vec(s, d), k=20),
            "cosine_sim",
            id_col="vec_id",
        )
        lbl0 = emb.filter(F.col("vec_id") == 0).head()["label"]
        rel = emb.filter(F.col("label") == int(lbl0)).select(
            "vec_id", F.lit(1).alias("gain")
        )
        return text_ops.retrieval_eval(
            lane.select("vec_id", "rank"), rel, k=20, id_col="vec_id"
        )

    q["emb_retrieval_eval"] = _emb_retrieval_eval

    # deterministic k-means++-style seeding: k corpus-wide argmax
    # rounds, one picked row per round — the oracle's recursive CTE
    # replays every pick (the distributed sibling of emb_mmr_topk's
    # candidate-bounded greedy)
    q["emb_kpp_init"] = lambda s, d: similarity.farthest_first_init(
        load_table(s, d, "embeddings"), k=5
    )
    q["ts_ramps"] = lambda s, d: timeseries.ramps(
        _points(s, d), min_steps=RAMP_MIN_STEPS
    )
    q["ts_availability"] = lambda s, d: timeseries.availability(
        _points(s, d), T0, T1, HEARTBEAT
    )
    q["ts_drift"] = lambda s, d: timeseries.drift(_points(s, d), T0, T1)
    # span-bounded exponential smoothing — exact integer weights, so
    # the trend line is engine-identical (no float pow in sight)
    q["ts_ewma"] = lambda s, d: timeseries.ewma(_points(s, d))
    # windowed Holt level/trend/1-step forecast — the forecasting lane
    # next to ewma, same exact-integer weight-table device
    q["ts_holt_linear"] = lambda s, d: timeseries.holt_linear(_points(s, d))
    # additive Holt–Winters: the seasonal forecasting lane (exact
    # integer coefficient tables over a full trailing window)
    q["ts_holt_winters"] = lambda s, d: timeseries.holt_winters(_points(s, d))
    # forecast backtest: |one-step forecast − next actual| per series,
    # exact micro-unit BIGINT error sums
    q["ts_forecast_eval"] = lambda s, d: timeseries.forecast_eval(_points(s, d))
    # index-quality audit: sax_topk nomination overlap vs the exact
    # query-vs-all top-k (linear, not all-pairs — the audit scales too)
    q["ts_sax_recall"] = lambda s, d: timeseries.sax_topk_recall(
        _points(s, d),
        SAX_QUERY_PV,
        T0,
        T1,
        GRID_STEP,
        k=SAX_TOPK,
        n_segments=SAX_SEGMENTS,
        alphabet=SAX_ALPHABET,
        n_candidates=SAX_NCAND,
        expand=SAX_EXPAND,
    )
    # SAX symbolization: per-series z-normalized PAA → gaussian letters
    q["ts_sax"] = lambda s, d: timeseries.sax_symbols(_points(s, d))
    # the iSAX index record itself: one word per series over its LOCF
    # grid — the build-once artifact the similarity lanes read back
    q["ts_sax_words"] = lambda s, d: timeseries.sax_words(
        _points(s, d), T0, T1, GRID_STEP, SAX_SEGMENTS, SAX_ALPHABET
    )
    # iSAX indexed series similarity: word equi-join nominates, exact
    # Pearson re-ranks on the isin-pruned grid re-read
    q["ts_sax_topk"] = lambda s, d: timeseries.sax_topk(
        _points(s, d),
        SAX_QUERY_PV,
        T0,
        T1,
        GRID_STEP,
        k=SAX_TOPK,
        n_segments=SAX_SEGMENTS,
        alphabet=SAX_ALPHABET,
        n_candidates=SAX_NCAND,
        expand=SAX_EXPAND,
    )

    def _ts_sax_topk_indexed(s, d):
        """...through the PRODUCTION word artifact: sax_words persisted
        once per corpus dir, read back, nomination answered from the
        bytes-per-series index without touching points (the
        ivfpq_rerank_indexed cadence). Oracle identical to ts_sax_topk."""

        def _build(path):
            timeseries.sax_words(
                _points(s, d), T0, T1, GRID_STEP, SAX_SEGMENTS, SAX_ALPHABET
            ).write.mode("overwrite").parquet(path)

        idx = s.read.parquet(_artifact_path(d, "sax_words", _build))
        return timeseries.sax_topk(
            _points(s, d),
            SAX_QUERY_PV,
            T0,
            T1,
            GRID_STEP,
            k=SAX_TOPK,
            n_segments=SAX_SEGMENTS,
            alphabet=SAX_ALPHABET,
            n_candidates=SAX_NCAND,
            expand=SAX_EXPAND,
            index=idx,
        )

    q["ts_sax_topk_indexed"] = _ts_sax_topk_indexed
    # incremental word-index refresh (the doc_components_incremental
    # cadence): artifact built on points <= SAX_CUT, refreshed against
    # the full table — stale series re-worded, unchanged series read
    # back; must equal a full rebuild row-for-row. Inline certification
    # device (TWO word builds per run — the doc_winnow_pairs posture);
    # production refreshes go through `pvarch index_words --refresh`
    # against a persisted artifact, with `stats=` making a narrow
    # refresh O(stale)
    q["ts_sax_words_incremental"] = lambda s, d: timeseries.sax_words_refresh(
        _points(s, d),
        timeseries.sax_words_build(
            _points(s, d).filter(F.col("time") <= SAX_CUT),
            T0,
            T1,
            GRID_STEP,
            SAX_SEGMENTS,
            SAX_ALPHABET,
        ),
        T0,
        T1,
        GRID_STEP,
        SAX_SEGMENTS,
        SAX_ALPHABET,
    )

    # the honest-bench split of the same contract (VERDICT r12 task 6):
    # the old-cut artifact persists once per corpus via _ARTIFACTS (the
    # ts_latest_bucketed pattern), so this key's wall time is the
    # REFRESH alone — the number the production path pays per cadence —
    # while ts_sax_words_incremental keeps its deliberate two-build
    # inline-certification posture. Same refresh ≡ rebuild oracle.
    def _ts_sax_words_refresh_only(s, d):
        def _build(path):
            timeseries.sax_words_build(
                _points(s, d).filter(F.col("time") <= SAX_CUT),
                T0,
                T1,
                GRID_STEP,
                SAX_SEGMENTS,
                SAX_ALPHABET,
            ).write.mode("overwrite").parquet(path)

        art = s.read.parquet(_artifact_path(d, "sax_words_cut", _build))
        return timeseries.sax_words_refresh(
            _points(s, d), art, T0, T1, GRID_STEP, SAX_SEGMENTS, SAX_ALPHABET
        )

    q["ts_sax_words_refresh_only"] = _ts_sax_words_refresh_only
    # adaptive iSAX sizing (SCALE r11f/r12b): the auto lane derives
    # (n_segments, n_candidates) from the series count; at this corpus
    # (750 series, 15-instant grid) it resolves to the fixed constants,
    # so the oracle is ts_sax_topk's — the derivation itself is
    # unit-tested and probe-certified in the adaptive region
    q["ts_sax_topk_auto"] = lambda s, d: timeseries.sax_topk_auto(
        _points(s, d),
        SAX_QUERY_PV,
        T0,
        T1,
        GRID_STEP,
        k=SAX_TOPK,
        alphabet=SAX_ALPHABET,
        fence=SAX_NCAND,
        expand=SAX_EXPAND,
    )
    # the ADAPTIVE branches (VERDICT r12 task 7) — gate parameters where
    # the sax_auto_params derivation CHANGES the plan: fence=4 derives
    # (5 segments, fence 4) on the gate corpus (segment growth), and a
    # 3-instant grid with fence=64 derives grid-capped 2 segments with
    # the fence GROWN to 94. Each oracle encodes the DERIVED values, so
    # the driver certifies the derivation itself.
    q["ts_sax_topk_auto_adaptive"] = lambda s, d: timeseries.sax_topk_auto(
        _points(s, d),
        SAX_QUERY_PV,
        T0,
        T1,
        GRID_STEP,
        k=SAX_TOPK,
        alphabet=SAX_ALPHABET,
        fence=SAX_ADAPT_FENCE,
        expand=SAX_EXPAND,
    )
    q["ts_sax_topk_auto_fence"] = lambda s, d: timeseries.sax_topk_auto(
        _points(s, d),
        SAX_QUERY_PV,
        T0,
        T1,
        SAX_COARSE_STEP,
        k=SAX_TOPK,
        alphabet=SAX_ALPHABET,
        fence=SAX_GROW_FENCE,
        expand=SAX_EXPAND,
    )
    # bucket-occupancy health of the word index vs the nomination fence
    # — the one-line report read beside ts_sax_recall before trusting a
    # configuration (overflow pct > 0 ⇒ fence-breaking buckets exist)
    q["ts_sax_health"] = lambda s, d: timeseries.sax_index_health(
        timeseries.sax_words(
            _points(s, d), T0, T1, GRID_STEP, SAX_SEGMENTS, SAX_ALPHABET
        ),
        n_candidates=SAX_NCAND,
    )
    # two-sided CUSUM changepoints (Page 1954) vs each series' exact
    # mean — the recurrence-to-window device: S+ = prefix - min(0,
    # running-min(prefix)), all BIGINT, one window stage per series
    q["ts_cusum"] = lambda s, d: timeseries.cusum_changepoints(
        _points(s, d), k=CUSUM_K, h=CUSUM_H
    )
    # regime segmentation from the crossings: per-segment exact stats
    # (mean via the explicit-IEEE 6-dp device over the BIGINT q-sum)
    q["ts_cusum_segments"] = lambda s, d: timeseries.cusum_segments(
        _points(s, d), k=CUSUM_K, h=CUSUM_H
    )
    # the explicit-reference lane — the exact arithmetic cusum_stream
    # mirrors live (batch<->stream row-exact equivalence in
    # tests/test_streaming.py); unscaled BIGINT prefix, threshold h_q
    q["ts_cusum_target"] = lambda s, d: timeseries.cusum_changepoints(
        _points(s, d), k=CUSUM_TK, h=CUSUM_TH, target=CUSUM_TARGET
    )

    # warm-started CUSUM (VERDICT r12 task 4): per-series targets from
    # the backfill half (cusum_targets' exact half-up grid mean),
    # crossings detected on the live half — the batch twin of
    # cusum_stream(targets=...) resuming from an archived level
    def _ts_cusum_warm(s, d):
        pts = _points(s, d)
        tg = timeseries.cusum_targets(
            pts.filter(F.col("time") <= CUSUM_WARM_CUT)
        )
        return timeseries.cusum_changepoints(
            pts.filter(F.col("time") > CUSUM_WARM_CUT),
            k=CUSUM_WK,
            h=CUSUM_WH,
            targets=tg,
        )

    q["ts_cusum_warm"] = _ts_cusum_warm
    # HOT-SAX discords: rarest per-series SAX word over sliding windows
    q["ts_discords"] = lambda s, d: timeseries.sax_discords(
        _points(s, d),
        window=DISCORD_WINDOW,
        n_segments=SAX_SEGMENTS,
        alphabet=SAX_ALPHABET,
        k=DISCORD_K,
    )
    # the exact-distance CONFIRM stage HOT-SAX's heuristic orders (the
    # sax_discords docstring's promised bounded re-read, now real): k
    # rarest windows per series re-ranked by exact BIGINT squared
    # distance to their nearest non-overlapping window — the rarity
    # heuristic nominates, the exact metric decides
    q["ts_discords_confirmed"] = lambda s, d: timeseries.sax_discords_confirmed(
        _points(s, d),
        window=DISCORD_WINDOW,
        n_segments=SAX_SEGMENTS,
        alphabet=SAX_ALPHABET,
        k=DISCORD_K,
    )
    # RAKE keyphrases: stopword-free runs scored by word degree/freq
    q["doc_rake_keyphrases"] = lambda s, d: text_ops.rake_keyphrases(
        load_table(s, d, "documents")
    )
    def _emb_ivfpq_index(s, d):
        """IVF-PQ through the PRODUCTION artifact: build the (id, cell,
        codes) index with the Arrow GEMM encode lane, persist it as
        parquet, read it back, and answer the query from the index alone
        — the deployment shape where the scan ranks 9-byte rows, never
        float vectors. Oracle identical to emb_ivfpq_topk (the gemm lane
        is equality-tested against the certified expression lane on this
        corpus)."""
        import tempfile

        from epicsarchiver_spark.operators.similarity import (
            _hyperplanes,
            _nearest_cell_udf,
            _pq_codes_wide,
            as_double,
        )

        vecs = load_table(s, d, "embeddings")
        cents = _hyperplanes(64, 8, 42)
        cells = (
            vecs.select("vec_id", as_double(F.col("embedding")).alias("v"))
            .withColumn("cell", _nearest_cell_udf(cents)(F.col("v")))
            .select("vec_id", "cell")
        )
        index = cells.join(_pq_codes_wide(vecs, gemm=True), "vec_id")
        tmp = tempfile.mkdtemp(prefix="pvarch_q_ivfpq_")
        index.write.mode("overwrite").parquet(f"{tmp}/index")
        idx = s.read.parquet(f"{tmp}/index")
        return similarity.ivfpq_topk(
            vecs, _query_vec(s, d), k=10, n_cells=8, n_probe=4, index=idx
        ).select("vec_id", F.round("adc_dist", 6).alias("adc_dist"))

    q["emb_ivfpq_index"] = _emb_ivfpq_index

    # ...and the full production retrieval path: persisted index
    # nominates, exact cosine re-ranks — both stages in their deployment
    # shape (index built once per corpus dir via _artifact_path)
    def _emb_ivfpq_rerank_indexed(s, d):
        from epicsarchiver_spark.operators.similarity import (
            _hyperplanes,
            _nearest_cell_udf,
            _pq_codes_wide,
            as_double,
        )

        def _build(path):
            vecs = load_table(s, d, "embeddings")
            cents = _hyperplanes(64, 8, 42)
            cells = (
                vecs.select("vec_id", as_double(F.col("embedding")).alias("v"))
                .withColumn("cell", _nearest_cell_udf(cents)(F.col("v")))
                .select("vec_id", "cell")
            )
            cells.join(_pq_codes_wide(vecs, gemm=True), "vec_id").write.mode(
                "overwrite"
            ).parquet(path)

        idx = s.read.parquet(_artifact_path(d, "ivfpq_index", _build))
        return similarity.ivfpq_topk_rerank(
            load_table(s, d, "embeddings"),
            _query_vec(s, d),
            k=10,
            n_candidates=50,
            n_cells=8,
            n_probe=4,
            index=idx,
        )

    q["emb_ivfpq_rerank_indexed"] = _emb_ivfpq_rerank_indexed

    # SQ8 two-stage ANN: int8 codes + per-vector scale nominate, exact
    # cosine re-ranks — the scalar-quantized sibling of the PQ lane
    q["emb_sq8_rerank"] = lambda s, d: similarity.sq8_topk_rerank(
        load_table(s, d, "embeddings"), _query_vec(s, d), k=10, n_candidates=50
    )

    # ...and the read-back lane: stage 1 scans the persisted quantized
    # artifact only (never the float column)
    def _emb_sq8_rerank_indexed(s, d):
        def _build(path):
            similarity.quantize_embeddings(
                load_table(s, d, "embeddings")
            ).write.mode("overwrite").parquet(path)

        idx = s.read.parquet(_artifact_path(d, "sq8_index", _build))
        return similarity.sq8_topk_rerank(
            load_table(s, d, "embeddings"),
            _query_vec(s, d),
            k=10,
            n_candidates=50,
            index=idx,
        )

    q["emb_sq8_rerank_indexed"] = _emb_sq8_rerank_indexed

    # per-series archive-compression efficiency: what fraction of raw
    # events the W2 deadband keeps — the dial an operator reads before
    # tuning per-PV deadbands
    def _ts_compression_report(s, d):
        pts = _points(s, d)
        raw = pts.groupBy("pvname").agg(F.count(F.lit(1)).alias("n_raw"))
        k = (
            deadband.deadband_lag(pts, DEADTIME, DEADBAND)
            .groupBy("pvname")
            .agg(F.count(F.lit(1)).alias("n_kept"))
        )
        return raw.join(k, "pvname").select(
            "pvname",
            "n_raw",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_raw"), 6).alias("keep_ratio"),
        )

    q["ts_compression_report"] = _ts_compression_report
    q["ts_level_shifts"] = lambda s, d: timeseries.level_shifts(
        _points(s, d), window=SHIFT_WINDOW, threshold=SHIFT_THRESHOLD
    )
    # output-bounded related-PV discovery: top-k partners per series
    q["ts_related_corr"] = lambda s, d: timeseries.correlated_partners(
        _points(s, d), T0, T1, GRID_STEP, k=3
    ).select("pv", "partner", "n", F.round("r", 6).alias("r"))
    q["doc_winnow_pairs"] = lambda s, d: dedup.winnow_matches(
        load_table(s, d, "documents"),
        min_shared=WINNOW_MIN_SHARED,
        max_df=WINNOW_MAX_DF,
    )
    q["rel_large_orders"] = lambda s, d: relational.large_orders(
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "customer"),
    )
    q["ev_top_paths"] = lambda s, d: ev.top_paths(load_table(s, d, "events"))
    q["rel_forecast_revenue"] = lambda s, d: relational.forecast_revenue(
        load_table(s, d, "lineitem")
    )
    q["ts_interp_grid"] = lambda s, d: timeseries.interp_grid(
        _points(s, d), T0, T1, GRID_STEP
    ).select("pvname", "t", F.round("value", 6).alias("value"))
    q["ts_autocorr"] = lambda s, d: timeseries.autocorrelation(
        _points(s, d), T0, T1, GRID_STEP, lag=1
    ).select("pvname", "n", F.round("r", 6).alias("r"))
    q["emb_ann_recall"] = lambda s, d: similarity.ann_recall(
        load_table(s, d, "embeddings"), _query_vec(s, d), k=10, n_planes=8, max_hamming=2
    )

    q["doc_heavy_hitters"] = lambda s, d: text_ops.heavy_hitters(
        load_table(s, d, "documents"), min_count=HH_MIN_COUNT
    )
    q["ev_transitions"] = lambda s, d: ev.transitions(load_table(s, d, "events"))
    q["rel_promo_share"] = lambda s, d: relational.promo_revenue_share(
        load_table(s, d, "lineitem"), load_table(s, d, "part")
    )
    q["doc_blocklist"] = lambda s, d: text_ops.blocklist_stats(
        load_table(s, d, "documents"), BLOCKWORDS, max_hit_ratio=BLOCK_MAX_RATIO
    )
    # two-stage salted aggregation — same RESULT as the direct group-by
    # (the oracle), bounded partition size under any single-series skew
    q["ts_skew_counts"] = lambda s, d: skew.skew_safe_counts(_points(s, d))
    # CCNet-style corpus-level segment dedup (sep=' ' on this corpus, as
    # with doc_segment_dedup — the operator's paragraph use is sep='\n')
    q["doc_paragraph_dedup"] = lambda s, d: text_ops.dedup_paragraphs_corpus(
        load_table(s, d, "documents"), sep=" "
    )
    # hour-of-day seasonal profile: integer-cent sums keep the mean exact
    # across engines (a plain avg() of doubles is reduce-order noise)
    q["ts_seasonal"] = lambda s, d: (
        points_view(s, d)
        .groupBy(
            "event_type",
            (F.floor(F.col("time") / 3600) % 24).alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") / 0.01).cast("long")).cast("double")
                / (F.lit(100.0) * F.count(F.lit(1)))
            ).alias("avg_value"),
        )
    )

    # --- r6: gate queries for the 8 SURVEY edges that were local-only
    # (VERDICT r5 task 3) — each converts a "local" row to driver-
    # certifiable. C17/C18 mail render, F8 null/blank normalization,
    # O4 recent-runs list, C15 auto_ylog, F9 row→kv projection, W10
    # overlap re-read dedupe (batch form), S14 upsert→read_cache.

    def _ctl_alert_mail(s, d):
        """C17+C18 — render alert mail bodies for every tripped rule over
        the latest-value cache using the REAL template engine
        (functions/mail.py: clean_mail_message unescape + field and
        %PV(name)% lookup substitution; ref epicsarchiver/cache.py:662-690,
        util.py:317-322). The tripped set and the lookup value compute
        distributed; only the bounded per-series alert rows (≤ #rules ×
        #series, the same artifact the reference's mail daemon collects)
        cross the driver for string rendering."""
        from epicsarchiver_spark.functions.mail import render_alert_mail

        rules = s.createDataFrame(
            ALERT_RULES, "event_type string, compare string, trippoint double"
        )
        cache = timeseries.latest_per_key(
            points_view(s, d).select("event_id", "pvname", "event_type", "time", "value")
        )
        tripped = control.alert_eval(cache, rules).select(
            "pvname", "event_type", "value", "compare", "trippoint"
        )
        look = cache.filter(F.col("pvname") == MAIL_LOOKUP_PV).select("value").collect()
        lookup = {MAIL_LOOKUP_PV: f"{look[0]['value']:.2f}"} if look else {}
        rendered = [
            (
                r["pvname"],
                render_alert_mail(
                    MAIL_TEMPLATE,
                    r["pvname"],
                    f"{r['value']:.2f}",
                    r["event_type"],
                    r["compare"],
                    f"{r['trippoint']:.2f}",
                    lookup,
                ),
            )
            for r in tripped.collect()
        ]
        return s.createDataFrame(rendered, "pvname string, mail string")

    q["ctl_alert_mail"] = _ctl_alert_mail

    def _ctl_alert_upsert(s, d):
        """Alert-rule CRUD (ref webapp.py:163-227 submit_alertedits,
        schema.py:29-41): seed a rules dimension keyed (pvname, compare)
        from the series catalog, apply TWO edit batches through
        control.upsert_alerts — batch 1 upserts ranks 6-12 with a
        within-batch duplicate edit on rank 6 (last-write-wins pin),
        batch 2 drops the 'gt' rules of ranks 1-3 (their 'lt' rules
        must survive — composite key pin) and single-field-patches
        rank 7 — then read the dimension back."""
        w = Window.orderBy("pvname")
        # r13: a persist of this 7-times-referenced spine measured
        # SLOWER (1.6 → 2.8 s) — ReuseExchange already shares the
        # distinct+rank subtree across the edit batches at runtime
        ranked = (
            points_view(s, d)
            .select("pvname")
            .distinct()
            .withColumn("rnk", F.row_number().over(w))
        )
        _snull = F.lit(None).cast("string")
        _dnull = F.lit(None).cast("double")
        base = (
            ranked.filter(F.col("rnk") <= 10)
            .select(
                "pvname",
                F.lit("gt").alias("compare"),
                F.concat(F.lit("hi:"), F.col("pvname")).alias("name"),
                _snull.alias("mailto"),
                _snull.alias("mailmsg"),
                F.lit(50.0).alias("trippoint"),
                F.lit(30.0).alias("timeout"),
                F.lit("yes").alias("active"),
                F.lit("ok").alias("status"),
            )
            .unionByName(
                ranked.filter(F.col("rnk") <= 3).select(
                    "pvname",
                    F.lit("lt").alias("compare"),
                    F.concat(F.lit("lo:"), F.col("pvname")).alias("name"),
                    _snull.alias("mailto"),
                    _snull.alias("mailmsg"),
                    F.lit(5.0).alias("trippoint"),
                    F.lit(30.0).alias("timeout"),
                    F.lit("yes").alias("active"),
                    F.lit("ok").alias("status"),
                )
            )
        )
        e1 = ranked.filter(F.col("rnk").between(6, 12)).select(
            F.col("rnk").cast("long").alias("id"),
            F.lit(1.0).alias("ts"),
            F.lit("add").alias("action"),
            "pvname",
            F.lit("gt").alias("compare"),
            F.concat(F.lit("hi2:"), F.col("pvname")).alias("name"),
            F.lit("ops@example.com").alias("mailto"),
            _snull.alias("mailmsg"),
            F.lit(75.0).alias("trippoint"),
            _dnull.alias("timeout"),
            _snull.alias("active"),
        )
        e1b = ranked.filter(F.col("rnk") == 6).select(
            F.lit(100).cast("long").alias("id"),
            F.lit(2.0).alias("ts"),
            F.lit("edit").alias("action"),
            "pvname",
            F.lit("gt").alias("compare"),
            _snull.alias("name"),
            _snull.alias("mailto"),
            _snull.alias("mailmsg"),
            F.lit(80.0).alias("trippoint"),
            _dnull.alias("timeout"),
            _snull.alias("active"),
        )
        after1 = control.upsert_alerts(base, e1.unionByName(e1b))
        e2 = ranked.filter(F.col("rnk") <= 3).select(
            F.col("rnk").cast("long").alias("id"),
            F.lit(3.0).alias("ts"),
            F.lit("drop").alias("action"),
            "pvname",
            F.lit("gt").alias("compare"),
            _snull.alias("name"),
            _snull.alias("mailto"),
            _snull.alias("mailmsg"),
            _dnull.alias("trippoint"),
            _dnull.alias("timeout"),
            _snull.alias("active"),
        )
        e2b = ranked.filter(F.col("rnk") == 7).select(
            F.lit(200).cast("long").alias("id"),
            F.lit(3.0).alias("ts"),
            F.lit("edit").alias("action"),
            "pvname",
            F.lit("gt").alias("compare"),
            _snull.alias("name"),
            _snull.alias("mailto"),
            _snull.alias("mailmsg"),
            F.lit(99.0).alias("trippoint"),
            _dnull.alias("timeout"),
            F.lit("no").alias("active"),
        )
        # edit of a key with NO existing rule (rank 13 never seeded or
        # added) — must be a no-op, not a new row
        e2c = ranked.filter(F.col("rnk") == 13).select(
            F.lit(300).cast("long").alias("id"),
            F.lit(3.0).alias("ts"),
            F.lit("edit").alias("action"),
            "pvname",
            F.lit("gt").alias("compare"),
            _snull.alias("name"),
            _snull.alias("mailto"),
            _snull.alias("mailmsg"),
            F.lit(55.0).alias("trippoint"),
            _dnull.alias("timeout"),
            _snull.alias("active"),
        )
        return control.upsert_alerts(
            after1, e2.unionByName(e2b).unionByName(e2c)
        ).orderBy("pvname", "compare")

    q["ctl_alert_upsert"] = _ctl_alert_upsert

    q["cat_null_norm"] = lambda s, d: (
        load_table(s, d, "orders")
        .select(
            scalar.null_norm(
                F.when(F.col("o_orderkey") % 4 == 0, F.lit(""))
                .when(F.col("o_orderkey") % 4 == 1, F.lit("None"))
                .when(F.col("o_orderkey") % 4 == 2, F.lit(None).cast("string"))
                .otherwise(F.col("o_orderpriority"))
            ).alias("cleaned")
        )
        .groupBy("cleaned")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    # O4 — the `pvarch list` recent-runs listing (ref pvarch.py:297-306):
    # daily run names in the reference's pvarch_<date> scheme (the 30-day
    # test window holds one month, so day-granularity keeps the listing
    # non-trivial), newest first, with each run's span and point count
    q["cat_recent_runs"] = lambda s, d: (
        points_view(s, d)
        .groupBy(
            F.concat(
                F.lit("pvarch_"),
                F.date_format(F.timestamp_seconds(F.col("time")), "yyyyMMdd"),
            ).alias("run")
        )
        .agg(
            F.min("time").alias("t0"),
            F.max("time").alias("t1"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.col("run").desc())
        .limit(RECENT_RUNS_LIMIT)
    )

    def _ts_auto_ylog(s, d):
        """C15 — the reference's auto_ylog heuristic per series (ref
        web_utils.py:113-128, mirrored in sinks._auto_ylog): log-scale
        when the positive 1–99 percentile spread exceeds 200× and no
        value is negative. Exact index arithmetic (pos[int(q*(n-1))]) on
        the per-series sorted positives — bounded by per-series
        cardinality, the same data a plot pass already holds."""
        arr = F.sort_array(
            F.collect_list(F.when(F.col("value") > 1.0e-150, F.col("value")))
        )
        g = points_view(s, d).groupBy("pvname").agg(
            arr.alias("arr"), F.min("value").alias("mn")
        )
        n = F.size("arr")
        i01 = F.floor(0.01 * (n - 1)).cast("int") + 1
        i99 = F.floor(0.99 * (n - 1)).cast("int") + 1
        return g.select(
            "pvname",
            F.when(
                (n > 0) & (F.col("mn") >= 0),
                F.element_at("arr", i99) > 200 * F.element_at("arr", i01),
            )
            .otherwise(F.lit(False))
            .alias("ylog"),
        )

    q["ts_auto_ylog"] = _ts_auto_ylog

    # F9 — row→dict projection (ref util.py:276-278 row2dict) in its
    # batch-visible form: each row exploded to (key, value) pairs
    q["cat_row_kv"] = lambda s, d: (
        points_view(s, d)
        .filter(F.col("time").between(T0, T0 + 2 * 86400))
        .select(
            "event_id",
            F.explode(
                F.create_map(
                    F.lit("pvname"), F.col("pvname"),
                    F.lit("event_type"), F.col("event_type"),
                    F.lit("value_str"), F.col("value_str"),
                )
            ),
        )
    )

    # W10 — overlap re-read window, batch-visible: a restart re-reads a
    # window that overlaps already-archived points (ref archiver.py's
    # 1-day overlap); downstream distinct collapses the duplicates
    q["ts_overlap_dedup"] = lambda s, d: (
        timeseries.range_read(_points(s, d), T0, T1)
        .unionByName(
            timeseries.range_read(_points(s, d), T0 - 4 * 86400, T0 + 4 * 86400)
        )
        .distinct()
    )

    def _cache_readback(s, d):
        """S14 read-back — seed the parquet latest-value cache with one
        upsert batch, advance it with a second (the merge path: pruned
        bucket read + atomic swap), then read_cache. Result = latest per
        key over both batches, the cache's contract."""
        import atexit
        import os as _os
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix="pvarch_s14_gate_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        path = _os.path.join(base, "cache")
        from epicsarchiver_spark.streaming.ingest import read_cache, upsert_latest

        pts = _points(s, d).select("pvname", "value", "time")
        upsert_latest(pts.filter(F.col("time") < T_ASOF), path, buckets=8)
        upsert_latest(
            pts.filter((F.col("time") >= T_ASOF) & (F.col("time") <= T1)),
            path,
            buckets=8,
        )
        return read_cache(s, path).select("pvname", "value", "time")

    q["cache_upsert_readback"] = _cache_readback

    # --- r6: content-defined chunking (CDC) dedup ---------------------
    # Variable-size chunks cut where the rolling hash meets the boundary
    # mask — chunk identities stable under edits (the property fixed-
    # width chunking lacks); chunk-level dedup across the corpus.
    q["doc_cdc_chunks"] = lambda s, d: dedup.cdc_chunk_signatures(
        load_table(s, d, "documents"), window=4, boundary_bits=5
    )
    q["doc_cdc_dup_chunks"] = lambda s, d: dedup.cdc_duplicate_chunks(
        load_table(s, d, "documents"), window=4, boundary_bits=5
    )

    def _doc_cdc_incremental(s, d):
        """Incremental CDC dedup report over a synthetic new batch:
        verbatim re-crawls (%5, every chunk matches → dropped), EDITED
        re-crawls (%7 + a suffix — the exact-fingerprint lane misses
        these, but all-but-the-last chunk still matches → dropped:
        CDC's raison d'être), and novel docs (%11 reversed → survive)."""
        docs = load_table(s, d, "documents").select("doc_id", "text")
        new = (
            docs.filter(F.col("doc_id") % 5 == 0)
            .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
            .unionByName(
                docs.filter(F.col("doc_id") % 7 == 3).select(
                    (F.col("doc_id") + 20000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" unseen trailing tokens")).alias(
                        "text"
                    ),
                )
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 11 == 1).select(
                    (F.col("doc_id") + 30000).alias("doc_id"),
                    F.reverse(F.col("text")).alias("text"),
                )
            )
        )
        return dedup.cdc_dedup_report(new, corpus=docs, window=4, boundary_bits=5)

    q["doc_cdc_incremental"] = _doc_cdc_incremental

    q["doc_cdc_chunk_texts"] = lambda s, d: dedup.cdc_chunk_texts(
        load_table(s, d, "documents"), window=4, boundary_bits=5
    )

    def _doc_dsir(s, d):
        """DSIR importance scores with the src18 slice as the target
        domain — rank every corpus doc by log p_target/p_raw under
        union-vocab Lidstone unigram models (Xie et al. 2023)."""
        docs = load_table(s, d, "documents")
        return text_ops.dsir_scores(docs, docs.filter(F.col("source") == "src18"))

    q["doc_dsir_scores"] = _doc_dsir

    # span-level benchmark decontamination (GPT-3/PaLM style): excise
    # every corpus token covered by a window-hash collision with the
    # benchmark slice; documents keep their clean remainder
    def _doc_decontaminate(s, d):
        docs = load_table(s, d, "documents")
        return dedup.decontaminate_spans(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            window=8,
        )

    q["doc_decontaminate_spans"] = _doc_decontaminate

    # cluster-balanced sampling: a deterministic per-cell quota over the
    # embedding space (uniform sampling over-draws dense clusters)
    q["emb_cell_sample"] = lambda s, d: similarity.cell_balanced_sample(
        load_table(s, d, "embeddings"), per_cell=4, n_cells=8, dim=64
    )

    # rolling robust anomalies: each point vs the trailing 25 samples of
    # its own series — fast excursions flag, slow drift does not
    q["ts_rolling_outliers"] = lambda s, d: timeseries.rolling_robust_outliers(
        _points(s, d), window=25, k=5.0
    )

    # dead-PV triage: each series' 3 largest silent intervals
    q["ts_largest_gaps"] = lambda s, d: timeseries.largest_gaps(_points(s, d), top_n=3)

    # SemDeDup (Abbas et al. 2023): within-cell cosine near-dup drop list.
    # Threshold 0.4 is calibrated to this synthetic corpus (near-orthogonal
    # random vectors; max within-cell cosine ≈ 0.51) — real text embeddings
    # use 0.9+; the operator semantics are threshold-independent.
    q["emb_semantic_dedup"] = lambda s, d: similarity.semantic_dedup(
        load_table(s, d, "embeddings"), threshold=0.4, n_cells=8, dim=64
    )

    # CCNet perplexity tiers: head/middle/tail thirds by bigram-LM score
    q["doc_ccnet_buckets"] = lambda s, d: text_ops.perplexity_buckets(
        load_table(s, d, "documents"), n_buckets=3
    )

    # ...and the PRODUCTION cadence: the LM tables are written once
    # (write_bigram_lm — the reference-corpus artifact) and every score
    # pass reads them back; artifact cached per corpus dir like the
    # components/winnow/minhash lanes. Oracle identical to
    # doc_ccnet_buckets (the LM here trains on the same corpus).
    def _doc_ccnet_indexed(s, d):
        docs = load_table(s, d, "documents")
        path = _artifact_path(
            d, "bigram_lm", lambda p: text_ops.write_bigram_lm(docs, p)
        )
        return text_ops.perplexity_buckets(docs, n_buckets=3, model=path)

    q["doc_ccnet_indexed"] = _doc_ccnet_indexed

    # per-source report card: volume, quality, lang agreement, dup rate
    q["doc_corpus_report"] = lambda s, d: text_ops.corpus_report(
        load_table(s, d, "documents")
    )

    # per-PV health dashboard: volume/keep-ratio/uptime/drift/max-gap
    q["ts_health_report"] = lambda s, d: timeseries.series_health(
        _points(s, d), T0, T1, HEARTBEAT, DEADTIME, DEADBAND
    )

    # visually-representative plot decimation (parallel LTTB)
    q["ts_lttb"] = lambda s, d: timeseries.lttb_downsample(
        _points(s, d), T0, T1, step=6 * 3600.0
    )

    # cohort value (LTV) curves: the revenue twin of ev_retention
    q["ev_cohort_value"] = lambda s, d: ev.cohort_value_curves(
        load_table(s, d, "events")
    )

    # embedding-side curation chain: SemDeDup → D4 prune verdicts
    q["emb_pipeline_verdicts"] = lambda s, d: similarity.embedding_verdicts(
        load_table(s, d, "embeddings"),
        threshold=0.4,
        drop_frac=0.2,
        n_cells=8,
        dim=64,
    )

    # corpus changelog: v1→v2 snapshot diff by exact fingerprint
    def _doc_corpus_diff(s, d):
        """Old = the documents table; new = the CDC-style synthetic second
        snapshot (every 5th doc re-crawled unchanged under a new id,
        docs ≡ 3 mod 7 edited, docs ≡ 1 mod 11 replaced, the rest
        carried over verbatim)."""
        docs = load_table(s, d, "documents")
        new = (
            docs.filter(F.col("doc_id") % 11 != 1)
            .select("doc_id", "text", "source")
            .unionByName(
                docs.filter(F.col("doc_id") % 7 == 3).select(
                    (F.col("doc_id") + 20000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" unseen trailing tokens")).alias(
                        "text"
                    ),
                    "source",
                )
            )
        )
        return curation.corpus_diff(docs, new)

    q["doc_corpus_diff"] = _doc_corpus_diff

    # TPC-H Q7: bilateral nation trade volume (dual-dimension star)
    q["rel_nation_trade"] = lambda s, d: relational.nation_trade_volume(
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "customer"),
        load_table(s, d, "supplier"),
        load_table(s, d, "nation"),
    )

    # TPC-H Q8: national market share inside a region, per order year
    q["rel_market_share"] = lambda s, d: relational.market_share(
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "customer"),
        load_table(s, d, "supplier"),
        load_table(s, d, "nation"),
        load_table(s, d, "region"),
        load_table(s, d, "part"),
    )

    # TPC-H Q9: product profit by supplier nation and order year
    q["rel_product_profit"] = lambda s, d: relational.product_profit(
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "supplier"),
        load_table(s, d, "nation"),
        load_table(s, d, "part"),
    )

    # TPC-H Q17: revenue lost to small-quantity orders of one brand
    q["rel_small_qty_revenue"] = lambda s, d: relational.small_quantity_revenue(
        load_table(s, d, "lineitem"), load_table(s, d, "part")
    )

    # collocation extraction: top PMI bigrams (tokenizer merge candidates)
    q["doc_collocations"] = lambda s, d: text_ops.collocations_pmi(
        load_table(s, d, "documents"), min_count=5, k=20
    )

    # engagement cadence: per-type inter-arrival latency percentiles
    q["ev_inter_arrival"] = lambda s, d: ev.inter_arrival_stats(
        load_table(s, d, "events")
    )

    # last-touch conversion attribution (credit the preceding event)
    q["ev_attribution"] = lambda s, d: ev.last_touch_attribution(
        load_table(s, d, "events")
    )

    # corpus-level session summary (30-min inactivity sessionization)
    q["ev_session_stats"] = lambda s, d: ev.session_stats(
        load_table(s, d, "events")
    )

    # lexical-distribution fingerprint: hapax share + Zipf slope per source
    q["doc_hapax_zipf"] = lambda s, d: text_ops.hapax_zipf(
        load_table(s, d, "documents"), top_k=100
    )

    # Flesch reading-ease estimate from pure expression counts
    q["doc_readability"] = lambda s, d: text_ops.readability(
        load_table(s, d, "documents")
    )

    # clustering-quality report per IVF cell (same cells as the D4 chain)
    q["emb_cell_quality"] = lambda s, d: similarity.cell_quality(
        load_table(s, d, "embeddings"), n_cells=8, dim=64
    )

    # one Lloyd iteration: data-mean centroids, max-cosine reassignment
    q["emb_kmeans_refine"] = lambda s, d: similarity.kmeans_refine(
        load_table(s, d, "embeddings"), n_cells=8, dim=64
    )

    # DAU anomaly days vs the trailing 7-day median
    q["ev_dau_anomalies"] = lambda s, d: ev.dau_anomalies(
        load_table(s, d, "events")
    )

    # cross-split near-dup leakage audit (test doc with a train twin)
    def _doc_split_leakage(s, d):
        docs = load_table(s, d, "documents")
        return curation.split_leakage(
            docs,
            dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.05),
        )

    q["doc_split_leakage"] = _doc_split_leakage

    # dedup-aware shard layout: near-dup groups co-located by root hash
    q["doc_dedup_shards"] = lambda s, d: curation.shard_by_component(
        load_table(s, d, "documents"),
        dedup.connected_components_star(
            dedup.jaccard_pairs_blocked(
                load_table(s, d, "documents"), shingle_k=2, threshold=0.05
            )
        ),
        n_shards=8,
    )

    # ...and the PRODUCTION shape of the same layout: the connected-
    # components labels are written once per corpus release
    # (curation.write_components) and sharding reads the 16-byte
    # parquet artifact back — the CC iteration never reruns. The
    # artifact is cached per corpus dir (build-once / query-many, the
    # deployment cadence), so repeated invocations measure the read-back
    # path, not the one-time CC build. Oracle identical to
    # doc_dedup_shards (same labels, same layout).
    def _doc_dedup_shards_indexed(s, d):
        docs = load_table(s, d, "documents")

        def _build(path):
            curation.write_components(
                dedup.connected_components_star(
                    dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.05)
                ),
                path,
            )

        return curation.shard_by_component(
            docs, _artifact_path(d, "components", _build), n_shards=8
        )

    q["doc_dedup_shards_indexed"] = _doc_dedup_shards_indexed

    # winnowing through the persisted-fingerprint artifact: the MOSS
    # fingerprint table is written once per corpus release; the pair
    # query joins 8-byte (id, fp) rows read back from parquet — text
    # never re-hashes (winnow_matches(fingerprints=), dedup.py). Oracle
    # identical to doc_winnow_pairs (same basis, same selection).
    def _doc_winnow_indexed(s, d):
        docs = load_table(s, d, "documents")

        def _build(path):
            dedup.winnow_fingerprints(docs).write.mode("overwrite").parquet(path)

        fp = s.read.parquet(_artifact_path(d, "winnow_fp", _build))
        return dedup.winnow_matches(
            None,
            min_shared=WINNOW_MIN_SHARED,
            max_df=WINNOW_MAX_DF,
            fingerprints=fp,
        )

    q["doc_winnow_indexed"] = _doc_winnow_indexed

    # TPC-H Q13: order-count distribution incl. zero-order customers
    q["rel_order_count_dist"] = lambda s, d: relational.order_count_distribution(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    )

    # tokenizer equity: BPE-per-word fertility per language
    q["doc_tokenizer_fertility"] = lambda s, d: text_ops.tokenizer_fertility(
        load_table(s, d, "documents")
    )

    # fixed-compute data selection: best docs first until the token budget
    q["doc_budget_selection"] = lambda s, d: text_ops.budget_selection(
        load_table(s, d, "documents"), token_budget=15000
    )

    # curation chain audit: first-failing-stage verdict + funnel rollup
    q["doc_pipeline_verdicts"] = lambda s, d: curation.pipeline_verdicts(
        load_table(s, d, "documents")
    )
    q["doc_pipeline_funnel"] = lambda s, d: curation.pipeline_funnel(
        curation.pipeline_verdicts(load_table(s, d, "documents"))
    )

    # n-gram diversity per source (Self-BLEU-style collapse monitor)
    q["doc_ngram_diversity"] = lambda s, d: text_ops.ngram_diversity(
        load_table(s, d, "documents"), max_n=3
    )

    # per-doc OOV rate vs the corpus top-1000 vocab
    q["doc_oov_rates"] = lambda s, d: text_ops.oov_rates(
        load_table(s, d, "documents"), vocab_k=1000
    )

    # D4 prototypicality pruning: top-20%-per-cell by centroid cosine
    q["emb_prototype_scores"] = lambda s, d: similarity.prototype_scores(
        load_table(s, d, "embeddings"), drop_frac=0.2, n_cells=8, dim=64
    )

    # data-recipe accounting: natural vs target mixture per source
    q["doc_mixture_plan"] = lambda s, d: text_ops.mixture_plan(
        load_table(s, d, "documents")
    )

    # TPC-H Q11/Q15/Q22 adaptations: scalar-subquery-as-broadcast shapes
    q["rel_part_value_share"] = lambda s, d: relational.part_value_share(
        load_table(s, d, "lineitem"), load_table(s, d, "part"), fraction=0.001
    )
    q["rel_top_supplier"] = lambda s, d: relational.top_supplier(
        load_table(s, d, "lineitem"), load_table(s, d, "supplier")
    )
    q["rel_idle_customers"] = lambda s, d: relational.idle_wealthy_customers(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    )

    # blocked edit-distance entity matching: serial customer names
    # prefix-blocked so the Levenshtein scope is the 2-char suffix —
    # single-digit "typo" pairs at distance ≤ 1, Σ block² pair fence
    def _rel_fuzzy_customers(s, d):
        c = load_table(s, d, "customer")
        return dedup.fuzzy_matches(
            c,
            id_col="c_custkey",
            name_col="c_name",
            block=F.expr("substr(c_name, 1, length(c_name) - 2)"),
            max_distance=1,
        )

    q["rel_fuzzy_customers"] = _rel_fuzzy_customers

    # the full master-data flow over the same blocked pairs: fuzzy
    # match → connected components → canonical id per cluster, whole
    # id spine returned (singletons canonicalize to themselves)
    def _rel_entity_resolution(s, d):
        return dedup.resolve_entities(
            load_table(s, d, "customer"),
            id_col="c_custkey",
            name_col="c_name",
            block=F.expr("substr(c_name, 1, length(c_name) - 2)"),
            max_distance=1,
        )

    q["rel_entity_resolution"] = _rel_entity_resolution

    # ...and the steady-state lane: CC labels persisted once per
    # release, the spine resolves from the artifact (no pair gen, no
    # CC build at query time); oracle identical
    def _rel_entity_resolution_indexed(s, d):
        def _build(path):
            c = load_table(s, d, "customer")
            pairs = dedup.fuzzy_matches(
                c,
                id_col="c_custkey",
                name_col="c_name",
                block=F.expr("substr(c_name, 1, length(c_name) - 2)"),
                max_distance=1,
            )
            dedup.connected_components_star(
                pairs.select("id_a", "id_b")
            ).write.mode("overwrite").parquet(path)

        comp = s.read.parquet(_artifact_path(d, "fuzzy_components", _build))
        return dedup.resolve_entities(
            load_table(s, d, "customer"),
            id_col="c_custkey",
            name_col="c_name",
            block=F.expr("substr(c_name, 1, length(c_name) - 2)"),
            components=comp,
        )

    q["rel_entity_resolution_indexed"] = _rel_entity_resolution_indexed
    q["rel_late_suppliers"] = lambda s, d: relational.late_sole_suppliers(
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "supplier"),
    )
    q["rel_ship_delay_dist"] = lambda s, d: relational.ship_delay_distribution(
        load_table(s, d, "lineitem"), load_table(s, d, "orders")
    )

    # leakage-free split assignment: split hash keyed on the near-dup
    # group root (the constructive fix doc_split_leakage audits for)
    q["doc_component_splits"] = lambda s, d: curation.component_splits(
        load_table(s, d, "documents"),
        dedup.connected_components_star(
            dedup.jaccard_pairs_blocked(
                load_table(s, d, "documents"), shingle_k=2, threshold=0.05
            )
        ),
    )

    # cross-modal survivor rule: embeddings define the semantic dup
    # groups, text quality picks the survivor (threshold/n_cells match
    # emb_semantic_dedup's calibration for this synthetic corpus)
    q["doc_quality_survivors"] = lambda s, d: curation.quality_survivors(
        load_table(s, d, "documents"),
        load_table(s, d, "embeddings"),
        threshold=0.4,
        n_cells=8,
        dim=64,
    )

    # ...and the same survivor rule through the persisted SEMANTIC
    # components artifact (VERDICT r7 #8): the SemDeDup drop-edge build
    # + CC run once per corpus release (write_components), and the
    # steady-state call is quality scan + two hash joins — the read-back
    # twin of doc_quality_survivors (identical oracle)
    def _doc_survivors_indexed(s, d):
        docs = load_table(s, d, "documents")

        def _build(path):
            drops = similarity.semantic_dedup(
                load_table(s, d, "embeddings"), threshold=0.4, n_cells=8, dim=64
            )
            curation.write_components(
                dedup.connected_components_star(
                    drops.select(
                        F.col("vec_id").alias("id_a"),
                        F.col("keep_id").alias("id_b"),
                    )
                ),
                path,
            )

        return curation.quality_survivors(
            docs, components=_artifact_path(d, "sem_components", _build)
        )

    q["doc_survivors_indexed"] = _doc_survivors_indexed

    # contrastive-training mining: per-anchor top-k different-label
    # neighbors inside the anchor's coarse cell (SemDeDup's pair fence)
    q["emb_hard_negatives"] = lambda s, d: similarity.hard_negatives(
        load_table(s, d, "embeddings"), k=5, n_cells=8, dim=64
    )

    # label audit: kNN majority vote vs the recorded label
    q["emb_knn_labels"] = lambda s, d: similarity.knn_labels(
        load_table(s, d, "embeddings"), k=5, n_cells=8, dim=64
    )

    def _sink_ascii_roundtrip(s, d):
        """S9 write→read round trip: the ascii sink's own output parsed
        back by read_ascii; the oracle renders + re-parses the same
        lines in SQL, pinning the full text round trip. The written
        archive is cached per corpus dir (_artifact_path, like the
        other persisted-artifact gates) so repeated invocations measure
        the READ path and no temp dirs accumulate."""
        pv = "EV:0:click"

        def _build(path):
            pts = points_view(s, d).filter(F.col("pvname") == pv).select(
                "pvname",
                (F.floor(F.col("time") * 1000 + 0.5) / 1000.0).alias("time"),
                F.format_string("%.2f", F.col("value")).alias("value"),
            )
            sinks.write_ascii(pts, path)

        return sinks.read_ascii(s, _artifact_path(d, "ascii_data", _build), pv)

    q["sink_ascii_roundtrip"] = _sink_ascii_roundtrip

    # leakage-free splits through the persisted components artifact —
    # the release cadence: CC labels written once, split assignment is
    # a 16-byte-per-doc read-back (oracle identical to
    # doc_component_splits: same labels, same bucket map)
    def _doc_splits_indexed(s, d):
        docs = load_table(s, d, "documents")

        def _build(path):
            curation.write_components(
                dedup.connected_components_star(
                    dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.05)
                ),
                path,
            )

        return curation.component_splits(
            docs, _artifact_path(d, "components", _build)
        )

    q["doc_splits_indexed"] = _doc_splits_indexed

    # cap-m soft dedup off the same persisted components base: keep up
    # to 2 members per duplicate cluster — the distribution-preserving
    # knob between hard dedup (m=1) and no dedup
    def _doc_soft_dedup(s, d):
        docs = load_table(s, d, "documents")

        def _build(path):
            curation.write_components(
                dedup.connected_components_star(
                    dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.05)
                ),
                path,
            )

        return curation.soft_dedup(
            docs, _artifact_path(d, "components", _build), max_per_group=2
        )

    q["doc_soft_dedup"] = _doc_soft_dedup

    # instrument snapshot matrix: named series' LOCF grids as columns
    q["ts_grid_pivot"] = lambda s, d: timeseries.grid_pivot(
        _points(s, d),
        ["EV:0:click", "EV:0:view", "EV:7:view", "EV:101:error"],
        T0,
        T1,
        GRID_STEP,
    )

    # semantic-diversity monitor: exact mean pairwise dot, no pairs
    q["emb_dispersion"] = lambda s, d: similarity.dispersion(
        load_table(s, d, "embeddings"), n_cells=8, dim=64
    )

    # stuck-sensor screen: per-series flat-island audit
    q["ts_flatlines"] = lambda s, d: timeseries.flatlines(
        _points(s, d), min_points=3, min_duration_s=60.0
    )

    # linear multi-touch attribution (the last-touch companion)
    q["ev_linear_attribution"] = lambda s, d: ev.linear_attribution(
        load_table(s, d, "events"), lookback_s=7 * 86400.0
    )

    # MinHash precision/recall vs exact blocked Jaccard (text ann_recall)
    q["doc_minhash_quality"] = lambda s, d: dedup.minhash_quality(
        load_table(s, d, "documents"), threshold=0.5, shingle_k=2, basis="md5"
    )

    # the sampling dial (r9): same report on a deterministic md5-draw
    # half-corpus — the by-contract bound on the block² truth set
    q["doc_minhash_quality_sampled"] = lambda s, d: dedup.minhash_quality(
        load_table(s, d, "documents"),
        threshold=0.5,
        shingle_k=2,
        basis="md5",
        sample_frac=0.5,
    )

    # the hot-block fence's drop report (r9): which blocking keys would
    # be excluded from fuzzy_matches at this max_block, largest first
    q["rel_fuzzy_blocks"] = lambda s, d: dedup.fuzzy_blocks_oversize(
        load_table(s, d, "customer"),
        "c_custkey",
        "c_name",
        block=F.expr("substr(c_name, 1, 15)"),
        max_block=400,
    )

    # deseasonalized anomalies: residual vs the hour-of-day baseline
    q["ts_seasonal_anomalies"] = lambda s, d: timeseries.seasonal_anomalies(
        _points(s, d), k=5.0
    )

    # closed-form Naive Bayes label audit (text-side twin of knn_labels)
    q["doc_nb_audit"] = lambda s, d: text_ops.nb_label_audit(
        load_table(s, d, "documents")
    )

    # release-over-release embedding drift (per-cell share + centroid)
    q["emb_corpus_drift"] = lambda s, d: similarity.corpus_drift(
        load_table(s, d, "embeddings"),
        load_table(s, d, "embeddings").filter(F.col("vec_id") % 3 > 0),
        n_cells=8,
        dim=64,
    )

    # dup-graph shape dashboard: degree + component-size distributions
    q["doc_graph_profile"] = lambda s, d: dedup.graph_profile(
        dedup.jaccard_pairs_blocked(
            load_table(s, d, "documents"), shingle_k=2, threshold=0.05
        )
    )

    # the quantitative "chainy vs clique-like" answer: per-node
    # triangles + clustering coefficient via the oriented 3-way join
    q["doc_triangles"] = lambda s, d: dedup.triangle_stats(
        dedup.jaccard_pairs_blocked(
            load_table(s, d, "documents"), shingle_k=2, threshold=0.05
        )
    )

    # ...and the triangle read-back twin: the ORIENTED 3-way join runs
    # over the persisted 16 B/row canonical edge artifact (write-once
    # per corpus release, dedup.write_edges) — the production shape
    # SCALE r9k showed is necessary: inline, the exact-Jaccard pair
    # build dominates and dies unfenced at ×10. Oracle ≡ doc_triangles.
    def _doc_triangles_indexed(s, d):
        def _build(path):
            dedup.write_edges(
                dedup.jaccard_pairs_blocked(
                    load_table(s, d, "documents"), shingle_k=2, threshold=0.05
                ),
                path,
            )

        edges = s.read.parquet(_artifact_path(d, "dup_edges", _build))
        return dedup.triangle_stats(edges, id_a="u", id_b="v")

    q["doc_triangles_indexed"] = _doc_triangles_indexed

    # incremental CC maintenance: an 80% "old corpus" artifact labeling
    # + the 20% batch's touching pairs, folded in by merge_components —
    # certified IDENTICAL to from-scratch CC over the full pair graph
    # (oracle ≡ doc_dedup_groups). The production nightly shape: the
    # quadratic pair basis is only ever built over the batch.
    def _doc_components_incremental(s, d):
        docs = load_table(s, d, "documents")
        is_new = F.pmod(F.col("doc_id"), F.lit(5)) == 0

        def _build(path):
            curation.write_components(
                dedup.connected_components_star(
                    dedup.jaccard_pairs_blocked(
                        docs.filter(~is_new), shingle_k=2, threshold=0.05
                    )
                ),
                path,
            )

        comp = s.read.parquet(_artifact_path(d, "inc_components", _build))
        # the production batch feed: new_ids mode prunes the left join
        # side to the batch BEFORE the shuffle (never corpus²)
        batch_pairs = dedup.jaccard_pairs_blocked(
            docs,
            shingle_k=2,
            threshold=0.05,
            new_ids=docs.filter(is_new).select("doc_id"),
        )
        return dedup.merge_components(comp, batch_pairs).select(
            F.col("id").alias("doc_id"), "component"
        )

    q["doc_components_incremental"] = _doc_components_incremental

    # ...and the read-back twin: component sizes from the persisted CC
    # labels (shared "components" artifact), only the degree side pays
    # the pair scan — the release-cadence shape of the dashboard
    def _doc_graph_profile_indexed(s, d):
        docs = load_table(s, d, "documents")

        def _build(path):
            curation.write_components(
                dedup.connected_components_star(
                    dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.05)
                ),
                path,
            )

        comps = s.read.parquet(_artifact_path(d, "components", _build))
        return dedup.graph_profile(
            dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.05),
            components=comps,
        )

    q["doc_graph_profile_indexed"] = _doc_graph_profile_indexed

    # U-shaped multi-touch attribution (first/last 40%, middles 20%)
    q["ev_position_attribution"] = lambda s, d: ev.position_attribution(
        load_table(s, d, "events"), lookback_s=7 * 86400.0
    )

    # tokenizer training: round-1 BPE pair statistics (the argmax IS the
    # first learned merge; the loop is pinned by a python-mirror test)
    q["doc_bpe_pairs"] = lambda s, d: bpe.bpe_pair_counts(
        load_table(s, d, "documents"), k=20
    )

    # lead-lag discovery: cross-correlation lag scan over candidate pairs
    q["ts_xcorr_lag"] = lambda s, d: timeseries.xcorr_lag(
        _points(s, d), _XCORR_PAIRS, T0, T1, GRID_STEP, max_lag=3
    )

    # corpus-wide relatedness centrality: fixed-point integer PageRank
    q["rel_pagerank"] = lambda s, d: related.pagerank(_edges(s, d), rounds=8)

    # exact-integer Gram/covariance moments — the distributed PCA input
    q["emb_gram_matrix"] = lambda s, d: similarity.gram_matrix(
        load_table(s, d, "embeddings")
    )

    # TPC-H Q2: minimum-cost regional supplier per part (rank()==1
    # window keeps ties — the correlated-min subquery's semantics)
    q["rel_min_cost_supplier"] = lambda s, d: relational.min_cost_supplier(
        load_table(s, d, "lineitem"),
        load_table(s, d, "supplier"),
        load_table(s, d, "nation"),
        load_table(s, d, "region"),
        load_table(s, d, "part"),
    )

    # TPC-H Q20: suppliers shipping a dominant share of promoted parts
    q["rel_dominant_suppliers"] = lambda s, d: relational.dominant_suppliers(
        load_table(s, d, "lineitem"),
        load_table(s, d, "supplier"),
        load_table(s, d, "nation"),
        load_table(s, d, "part"),
    )

    # --- sample-order priority -------------------------------------
    # The driver gates correctness on a 50-query sample taken from the
    # FRONT of this dict (r2-r8 each certified exactly the first 50
    # keys). All 233 pre-r9 keys are driver-certified (union of
    # CORRECTNESS_r01..r08), so the window now runs as a rolling
    # regression guard: _R13_FRONT = new-this-round keys + the 46
    # stalest certifications (see its comment). Previously certified
    # keys keep their green rows (testdata unchanged — guarded by
    # tests/testdata_fingerprint.json) and fill the remainder in their
    # prior order.
    front = _R13_FRONT
    ordered = {k: q[k] for k in front}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


