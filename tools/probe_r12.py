#!/usr/bin/env python
"""Round-12 scale probes (SCALE.md r12 entries) — the measurements
VERDICT r11 asked for:

a) drift adjudication — isolated fresh-session 3-run medians for the
   two r11 bench drifts (emb_pipeline_verdicts 3.01→4.70 s, ts_xcorr_lag
   2.39→3.55 s) plus a stable control (ts_latest), at sf0.1 — the
   r8a/r10a/r11a ritual. Run the section TWICE in separate processes.
b) adaptive iSAX sizing — auto-sized (corpus-stat-derived n_segments /
   n_candidates) vs the fixed r11 defaults on the structured ×1/×10
   corpus from r11f, with identity-recall and bucket-occupancy health.
c) rel_pagerank at 10⁷ edges — the documented degrade-to-shuffle path
   (broadcast rank join vs plain shuffle join) measured per round so
   the related.py docstring claim carries a number.
d) year-scale daily rollups — merging 365 daily partials for a plot
   query vs the cold full-scan aggregate at ×10 events (the r11b
   artifact-payoff pattern applied to rollups).
e) the round's new operators at scale — ts_cusum at ×1/×10 (one window
   stage, rides the scan) and the incremental word-refresh payoff
   (full build vs a 1% backfill append; the (wm, np) freshness pair).

Prints one JSON line per section. Run each section in its own process
for isolation (the point of section a):

    python tools/probe_r12.py --sections a
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(make_df) -> float:
    """Time a query end-to-end: the BUILDER runs inside the timer (some
    operators do eager work — driver-hop moments, localCheckpointed
    results — that a write-only timer would miss), then the noop write
    forces full materialization (the bench.py discipline)."""
    t0 = time.perf_counter()
    make_df().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_drift(spark) -> None:
    """r12a: the r8a ritual — fresh session, no concurrent suite,
    round-robin interleaved 3 runs per flagged query, medians."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = ["emb_pipeline_verdicts", "ts_xcorr_lag", "ts_latest"]
    # shared JVM/JIT warm-up, same as bench.py
    qs["ts_range_read"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            runs[n].append(round(_noop(lambda: qs[n](spark, SF_DIR)), 4))
    print(json.dumps({
        "probe": "r12a_drift",
        "sf_dir": SF_DIR,
        "medians": {n: round(statistics.median(v), 4) for n, v in runs.items()},
        "runs": runs,
    }))


def _structured_corpus(spark, scale: int):
    """The r11f structured series corpus: 8 shape archetypes with
    per-(series, step) hash jitter — 2 000·scale series × 64 samples.
    Returns (events_df, t0, t1, step, n_series)."""
    n_series, n_samp = 2_000 * scale, 64
    base = spark.range(n_series * n_samp).selectExpr(
        "id AS event_id",
        f"id % {n_series} AS sid",
        f"CAST(id DIV {n_series} AS DOUBLE) AS step_i",
    )
    ev = base.selectExpr(
        "event_id",
        "concat('SP:', CAST(sid AS STRING)) AS pvname",
        "step_i * 10.0 AS time",
        f"""CAST(
             CASE CAST(sid % 8 AS INT)
               WHEN 0 THEN step_i
               WHEN 1 THEN {n_samp} - step_i
               WHEN 2 THEN abs(step_i - {n_samp // 2})
               WHEN 3 THEN {n_samp // 2} - abs(step_i - {n_samp // 2})
               WHEN 4 THEN CASE WHEN step_i < {n_samp // 2} THEN 0 ELSE 40 END
               WHEN 5 THEN CASE WHEN step_i < {n_samp // 2} THEN 40 ELSE 0 END
               WHEN 6 THEN step_i % 16
               ELSE 15 - (step_i % 16)
             END
             + pmod(xxhash64(sid, CAST(step_i AS LONG)), 3) AS DOUBLE
           ) AS value""",
    )
    t0, t1 = 0.0, (n_samp - 1) * 10.0
    return ev, t0, t1, t1 / 15.0, n_series


def probe_adaptive_sax(spark) -> None:
    """r12b: fixed r11 defaults (4 segments, fence 128) vs the
    auto-sized index (sax_auto_params) on the structured corpus at
    ×1/×10 — identity recall, the quality-equivalence view (indexed
    top-5 mean r vs the exact signed-r top-5's: on a corpus whose
    archetype buckets hold thousands of true shape-mates tied at
    r≈0.999, identity recall is a lottery and quality is the honest
    metric — SCALE r11f finding 2), wall, and the bucket-occupancy
    health line (sax_index_health) that predicts the recall cliff."""
    from epicsarchiver_spark.operators.timeseries import (
        locf_grid,
        sax_auto_params,
        sax_index_health,
        sax_topk,
        sax_topk_recall,
        sax_words,
    )

    results = {}
    for s in (1, 10):
        ev, t0, t1, step, n_series = _structured_corpus(spark, s)
        qpv = "SP:0"
        # exact signed-r top-5 mean r (query-vs-all, the recall truth)
        grid = (
            locf_grid(ev, t0, t1, step)
            .filter(F.col("value").isNotNull())
            .selectExpr("pvname", "t", "CAST(round(value / 0.01) AS LONG) AS q")
        )
        qg = grid.filter(F.col("pvname") == qpv).selectExpr("t", "q AS qa")
        sums = (
            grid.filter(F.col("pvname") != qpv)
            .join(F.broadcast(qg), "t")
            .groupBy("pvname")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("qa").alias("sx"), F.sum("q").alias("sy"),
                F.sum(F.expr("qa*q")).alias("sxy"),
                F.sum(F.expr("qa*qa")).alias("sxx"),
                F.sum(F.expr("q*q")).alias("syy"),
            )
            .selectExpr(
                "pvname",
                "CAST(n*sxy - sx*sy AS DOUBLE) /"
                " (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))"
                "  * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS r",
            )
            .filter("r IS NOT NULL")
        )
        exact5 = [row["r"] for row in sums.orderBy(F.desc("r"), "pvname").limit(5).collect()]
        auto = sax_auto_params(n_series)
        per = {
            "auto_params": auto,
            "exact_top5_mean_r": round(sum(exact5) / len(exact5), 6),
        }
        for tag, nseg, ncand in [
            ("fixed_4seg_c128", 4, 128),
            ("auto", auto["n_segments"], auto["n_candidates"]),
        ]:
            tq = time.perf_counter()
            row = sax_topk_recall(
                ev, qpv, t0, t1, step, k=5, n_segments=nseg,
                expand=1, n_candidates=ncand,
            ).head()
            top = sax_topk(
                ev, qpv, t0, t1, step, k=5, n_segments=nseg,
                expand=1, n_candidates=ncand,
            ).collect()
            health = sax_index_health(
                sax_words(ev, t0, t1, step, n_segments=nseg),
                n_candidates=ncand,
            ).head()
            per[tag] = {
                "recall_pct100": row["recall_pct100"],
                "n_indexed": row["n_indexed"],
                "indexed_top5_mean_r": (
                    round(sum(r["r"] for r in top) / len(top), 6) if top else None
                ),
                "wall_s": round(time.perf_counter() - tq, 2),
                "health": {
                    "n_words": health["n_words"],
                    "max_bucket": health["max_bucket"],
                    "p99_bucket": health["p99_bucket"],
                    "overflow_words": health["overflow_words"],
                    "overflow_series_pct100": health["overflow_series_pct100"],
                },
            }
        results[f"x{s}"] = per
    print(json.dumps({"probe": "r12b_adaptive_sax", **results}))


def probe_pagerank_scale(spark) -> None:
    """r12c: pagerank's per-round cost at 10⁷ edges / 10⁶ nodes —
    broadcast rank-join lane (the sf0.1 default) vs the documented
    degrade-to-shuffle lane (broadcast_ranks=False). The docstring
    claim under test: at ≥10⁷ nodes the rank frame no longer fits a
    broadcast, so the shuffle lane must carry the op at a bounded
    per-round premium."""
    from epicsarchiver_spark.operators.related import pagerank

    n_nodes, n_edges = 1_000_000, 10_000_000
    edges = spark.range(n_edges).selectExpr(
        f"CAST(pmod(xxhash64(id, 1), {n_nodes}) AS STRING) AS pv1",
        f"CAST(pmod(xxhash64(id, 2), {n_nodes}) AS STRING) AS pv2",
        "CAST(1 + pmod(xxhash64(id, 3), 9) AS DOUBLE) AS score",
    ).filter("pv1 <> pv2")
    results = {}
    for tag, bcast in [("broadcast", True), ("shuffle", False)]:
        t = _noop(lambda: pagerank(
            edges, rounds=4, broadcast_ranks=bcast,
        ))
        results[tag] = {"wall_s": round(t, 2), "s_per_round": round(t / 4, 2)}
    print(json.dumps({
        "probe": "r12c_pagerank_1e7",
        "nodes": n_nodes, "edges": n_edges, "rounds": 4, **results,
    }))


def probe_rollup_year(spark, out: str) -> None:
    """r12d: the daily-rollup artifact at year scale — build 365 daily
    partials once, then answer the year plot query by merging partials
    vs the cold full scan, at ×1/×10 event volume."""
    import shutil

    from epicsarchiver_spark.sources.points_store import read_rollup, write_rollup
    from tools.scale_probe import gen_events

    results = {}
    for s in (10, 100):
        d = f"{out}/x{s}"
        if not os.path.exists(f"{d}/_DONE_EV"):
            gen_events(spark, 100_000 * s, 1500 * s, f"{d}/events.parquet")
            open(f"{d}/_DONE_EV", "w").write("ok")
        # stretch the event timestamps across 365 days from epoch 0 so
        # the rollup has a year of daily rows per key
        raw = spark.read.parquet(f"{d}/events.parquet")
        lo, hi = raw.selectExpr(
            "min(unix_micros(ts))", "max(unix_micros(ts))"
        ).head()
        span = max(1, hi - lo)
        ev = raw.selectExpr(
            "concat('EV:', CAST(user_id % 500 AS STRING)) AS pvname",
            f"CAST(86400.0 * 365.0 * (unix_micros(ts) - {lo}) / {span}"
            " AS DOUBLE) AS time",
            "value",
        )
        rollup_path = f"{d}/rollup_year"
        shutil.rmtree(rollup_path, ignore_errors=True)
        tb = time.perf_counter()
        write_rollup(ev, rollup_path)
        t_build = time.perf_counter() - tb
        # the artifact lane: 52-bin year plot from (key × 365 day) rows
        week = (
            "CAST(datediff(to_date(day), to_date('1970-01-01')) DIV 7"
            " AS BIGINT)"
        )
        t_merge = _noop(
            lambda: read_rollup(spark, rollup_path)
            .groupBy("pvname", F.expr(week).alias("bin"))
            .agg(
                F.sum("n").alias("n"),
                F.min("min_value").alias("vmin"),
                F.max("max_value").alias("vmax"),
            )
        )
        # the cold lane: scan every raw event for the same 52-bin plot
        t_cold = _noop(
            lambda: ev.groupBy(
                "pvname",
                F.floor(F.col("time") / (86400.0 * 7)).alias("bin"),
            ).agg(
                F.count("*").alias("n"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
            )
        )
        n_days = read_rollup(spark, rollup_path).count()
        results[f"x{s}"] = {
            "rollup_rows": n_days,
            "rollup_build_s": round(t_build, 2),
            "plot_from_rollup_s": round(t_merge, 2),
            "plot_cold_scan_s": round(t_cold, 2),
        }
    print(json.dumps({"probe": "r12d_rollup_year", **results}))


def probe_cusum_and_refresh(spark, out: str) -> None:
    """r12e: the round's new operators at scale. (1) ts_cusum at ×1/×10
    events — one window stage, must ride the scan. (2) the incremental
    word-refresh payoff: full sax_words_build vs sax_words_refresh
    after a NARROW append (1% of series get one new point) at ×10 —
    the doc_components_incremental r10d question applied to the word
    artifact."""
    from epicsarchiver_spark.operators.timeseries import (
        cusum_changepoints,
        sax_words_build,
        sax_words_refresh,
    )
    from tools.scale_probe import gen_events

    results = {}
    for s in (1, 10):
        d = f"{out}/x{s}"
        if not os.path.exists(f"{d}/_DONE_EV"):
            gen_events(spark, 100_000 * s, 1500 * s, f"{d}/events.parquet")
            open(f"{d}/_DONE_EV", "w").write("ok")
        ev = spark.read.parquet(f"{d}/events.parquet").selectExpr(
            "event_id",
            "concat('EV:', CAST(user_id AS STRING), ':', event_type) AS pvname",
            "CAST(unix_micros(ts) AS DOUBLE) / 1e6 AS time",
            "value",
        )
        results[f"x{s}"] = {
            "cusum_s": round(_noop(lambda: cusum_changepoints(ev, k=20.0, h=200.0)), 2),
        }
    # refresh payoff at ×10: build once, append one point to 1% of
    # series, time refresh vs full rebuild
    d = f"{out}/x10"
    ev = spark.read.parquet(f"{d}/events.parquet").selectExpr(
        "event_id",
        "concat('EV:', CAST(user_id AS STRING), ':', event_type) AS pvname",
        "CAST(unix_micros(ts) AS DOUBLE) / 1e6 AS time",
        "value",
    )
    t0v, t1v = ev.selectExpr("min(time)", "max(time)").head()
    step = (t1v - t0v) / 15.0
    art_path = f"{d}/sax_words_wm"
    tb = time.perf_counter()
    sax_words_build(ev, t0v, t1v, step).write.mode("overwrite").parquet(art_path)
    t_full = time.perf_counter() - tb
    art = spark.read.parquet(art_path)
    appended = ev.unionByName(
        ev.groupBy("pvname")
        .agg(F.max("time").alias("time"), F.max("event_id").alias("event_id"))
        .filter(F.expr("pmod(xxhash64(pvname), 100) = 0"))
        .select(
            (F.col("event_id") + 1_000_000_000).alias("event_id"),
            "pvname",
            (F.col("time") - 1e-3).alias("time"),  # in-horizon append
            F.lit(999.0).alias("value"),
        )
        .select("event_id", "pvname", "time", "value")
    )
    tr = time.perf_counter()
    refreshed = sax_words_refresh(appended, art, t0v, t1v, step)
    n_out = refreshed.count()
    t_refresh = time.perf_counter() - tr
    # the append lands BELOW each series' max time (wm unmoved), so the
    # rewritten set is exactly the rows whose point COUNT moved
    n_stale = refreshed.join(art, ["pvname", "np"], "left_anti").count()
    results["refresh_x10"] = {
        "full_build_s": round(t_full, 2),
        "narrow_refresh_s": round(t_refresh, 2),
        "artifact_series": n_out,
        "rewritten_series": n_stale,
    }
    print(json.dumps({"probe": "r12e_cusum_refresh", **results}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scaleprobe")
    ap.add_argument("--sections", default="a")
    args = ap.parse_args()

    from epicsarchiver_spark.session import get_spark

    spark = get_spark("probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    sections = set(args.sections.split(","))
    if "a" in sections:
        probe_drift(spark)
    if "b" in sections:
        probe_adaptive_sax(spark)
    if "c" in sections:
        probe_pagerank_scale(spark)
    if "d" in sections:
        probe_rollup_year(spark, args.out)
    if "e" in sections:
        probe_cusum_and_refresh(spark, args.out)
    spark.stop()


if __name__ == "__main__":
    main()
