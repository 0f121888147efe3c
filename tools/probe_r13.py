#!/usr/bin/env python
"""Round-13 scale probes (SCALE.md r13 entries) — the measurements
VERDICT r12 asked for:

a) pagerank lane AUTO-SELECTION (task 2) — the broadcast_ranks=None
   default must pick the measured winner on both sides of the
   PAGERANK_BROADCAST_MAX_NODES crossover: ~1e5 nodes (broadcast side,
   the sf0.1 regime) and 1e6 nodes / 1e7 edges (the r12c shuffle-wins
   regime). Times auto vs both forced lanes at each scale.

b) stats-fed word-index refresh (task 3) — SCALE r12e showed a no-stats
   refresh pays an O(corpus) staleness scan; the ingest cache's
   (wm, np) feed answers staleness from bytes-per-series rows. Measure
   full build vs no-stats refresh vs stats= refresh for a 1% append at
   ×1/×10, decomposing what the stats lane actually removes.

Prints one JSON line per section:

    python tools/probe_r13.py --sections a
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _noop(make_df) -> float:
    t0 = time.perf_counter()
    make_df().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe_pagerank_auto(spark) -> None:
    """r13a: the lane auto-pick vs both forced lanes, both sides of the
    crossover. Success = auto's wall tracks the winning lane's wall at
    each scale (the pick is arithmetic on the node count; this measures
    that the arithmetic picked the right side)."""
    from epicsarchiver_spark.operators.related import (
        PAGERANK_BROADCAST_MAX_NODES,
        _pagerank_use_broadcast,
        pagerank,
    )

    results = {"crossover_nodes": PAGERANK_BROADCAST_MAX_NODES}
    for tag, n_nodes, n_edges in (
        ("below_1e5", 100_000, 1_000_000),
        ("above_1e6", 1_000_000, 10_000_000),
    ):
        edges = spark.range(n_edges).selectExpr(
            f"CAST(pmod(xxhash64(id, 1), {n_nodes}) AS STRING) AS pv1",
            f"CAST(pmod(xxhash64(id, 2), {n_nodes}) AS STRING) AS pv2",
            "CAST(1 + pmod(xxhash64(id, 3), 9) AS DOUBLE) AS score",
        ).filter("pv1 <> pv2")
        per = {"auto_picks": (
            "broadcast" if _pagerank_use_broadcast(n_nodes) else "shuffle"
        )}
        lanes = (("auto", None), ("broadcast", True), ("shuffle", False))
        # one discarded warmup (codegen + shuffle-service spin-up), then
        # ROUND-ROBIN interleaved 3 runs per lane, medians — the r8a
        # ritual; a sequential pass hands the first lane the cold-start
        # bill and flips the verdict (observed: ±2× on the first run)
        _noop(lambda: pagerank(edges, rounds=4, broadcast_ranks=None))
        walls = {t: [] for t, _ in lanes}
        for _ in range(3):
            for lane_tag, lane in lanes:
                walls[lane_tag].append(
                    _noop(lambda: pagerank(edges, rounds=4, broadcast_ranks=lane))
                )
        import statistics

        for lane_tag, _ in lanes:
            per[f"{lane_tag}_s"] = round(statistics.median(walls[lane_tag]), 2)
        results[tag] = per
    print(json.dumps({"probe": "r13a_pagerank_auto", **results}))


def probe_stats_refresh(spark, out: str) -> None:
    """r13b: what the stats= feed removes from the refresh wall. For a
    1% in-horizon append at ×1/×10: full rebuild, no-stats refresh
    (per-series max/count staleness aggregate over raw points), and
    stats= refresh fed from a pre-materialized bytes-per-series
    (wm, np) frame — the ingest cache's shape (read cost included:
    the frame is read back from parquet inside the timer)."""
    from epicsarchiver_spark.operators.timeseries import (
        sax_words_build,
        sax_words_refresh,
    )
    from tools.scale_probe import gen_events

    results = {}
    for s in (1, 10):
        d = f"{out}/r13x{s}"
        if not os.path.exists(f"{d}/_DONE_EV"):
            gen_events(spark, 100_000 * s, 1500 * s, f"{d}/events.parquet")
            open(f"{d}/_DONE_EV", "w").write("ok")
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
        sax_words_build(ev, t0v, t1v, step).write.mode("overwrite").parquet(
            art_path
        )
        t_full = time.perf_counter() - tb
        art = spark.read.parquet(art_path)
        # 1% of series get one in-horizon append (below their max time:
        # the wm stands still, only the COUNT moves — the backfill case)
        appended = ev.unionByName(
            ev.groupBy("pvname")
            .agg(F.max("time").alias("time"), F.max("event_id").alias("event_id"))
            .filter(F.expr("pmod(xxhash64(pvname), 100) = 0"))
            .select(
                (F.col("event_id") + 1_000_000_000).alias("event_id"),
                "pvname",
                (F.col("time") - 1e-3).alias("time"),
                F.lit(999.0).alias("value"),
            )
            .select("event_id", "pvname", "time", "value")
        )
        app_path = f"{d}/events_app.parquet"
        appended.write.mode("overwrite").parquet(app_path)
        app = spark.read.parquet(app_path)
        # the ingest-cache twin: per-series (wm, np), bytes per series,
        # materialized the way upsert_latest maintains it incrementally
        stats_path = f"{d}/cache_stats.parquet"
        app.groupBy("pvname").agg(
            F.max("time").alias("wm"), F.count(F.lit(1)).alias("np")
        ).write.mode("overwrite").parquet(stats_path)

        t_cold = _noop(
            lambda: sax_words_refresh(app, art, t0v, t1v, step)
        )
        t_stats = _noop(
            lambda: sax_words_refresh(
                app, art, t0v, t1v, step,
                stats=spark.read.parquet(stats_path),
            )
        )
        results[f"x{s}"] = {
            "full_build_s": round(t_full, 2),
            "refresh_cold_s": round(t_cold, 2),
            "refresh_stats_s": round(t_stats, 2),
        }
    print(json.dumps({"probe": "r13b_stats_refresh", **results}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scaleprobe")
    ap.add_argument("--sections", default="a")
    args = ap.parse_args()

    from epicsarchiver_spark.session import get_spark

    spark = get_spark("probe-r13")
    spark.sparkContext.setLogLevel("ERROR")
    sections = set(args.sections.split(","))
    if "a" in sections:
        probe_pagerank_auto(spark)
    if "b" in sections:
        probe_stats_refresh(spark, args.out)
    spark.stop()


if __name__ == "__main__":
    main()
