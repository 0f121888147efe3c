#!/usr/bin/env python
"""Round-11 scale probes (SCALE.md r11 entries) — the measurements
VERDICT r10 asked for:

a) drift adjudication — isolated fresh-session 3-run medians for the
   two r10 bench drifts (ts_correlation 1.69→3.38 s, doc_substring_dedup
   2.11→4.77 s) plus a stable control (ts_latest), at sf0.1 — the
   r8a/r10a ritual. Run the section TWICE in separate processes.
b) ts_sax_topk at ×1/×10 — the iSAX nominate-then-rerank lane (word
   artifact build timed separately) vs the exact-everything
   series_correlation cost it amortizes (VERDICT r10 task 3's SCALE
   entry).
c) upsert_latest at 10⁶ series — the cache merge's bucket-rewrite cost
   above test scale, 64 vs 256 buckets, narrow (100-series) and wide
   (50k-series) batches (VERDICT r10 task 10).

Prints one JSON line per section. Run each section in its own process
for isolation (the point of section a):

    python tools/probe_r11.py --sections a
    python tools/probe_r11.py --sections b
    python tools/probe_r11.py --sections c
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
    """r11a: the r8a ritual — fresh session, no concurrent suite,
    round-robin interleaved 3 runs per flagged query, medians."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = ["ts_correlation", "doc_substring_dedup", "ts_latest"]
    # shared JVM/JIT warm-up, same as bench.py
    qs["ts_range_read"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            runs[n].append(round(_noop(lambda: qs[n](spark, SF_DIR)), 4))
    print(json.dumps({
        "probe": "r11a_drift",
        "sf_dir": SF_DIR,
        "medians": {n: round(statistics.median(v), 4) for n, v in runs.items()},
        "runs": runs,
    }))


def probe_sax_topk(spark, out: str) -> None:
    """r11b: the iSAX lane at ×1/×10 — word-artifact build (once per
    release), indexed nominate+rerank per query, vs the exact
    all-pairs-per-block series_correlation it amortizes."""
    from epicsarchiver_spark.operators.timeseries import (
        sax_topk,
        sax_words,
        series_correlation,
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
        t0, t1 = ev.selectExpr("min(time)", "max(time)").head()
        step = (t1 - t0) / 15.0
        words_path = f"{d}/sax_words"
        tb = time.perf_counter()
        sax_words(ev, t0, t1, step).write.mode("overwrite").parquet(words_path)
        t_build = time.perf_counter() - tb
        idx = spark.read.parquet(words_path)
        qpv = ev.select("pvname").orderBy("pvname").head()[0]
        t_query = _noop(
            lambda: sax_topk(ev, qpv, t0, t1, step, k=5, index=idx)
        )
        n_series = idx.count()
        results[f"x{s}"] = {
            "series": n_series,
            "word_build_s": round(t_build, 2),
            "indexed_query_s": round(t_query, 2),
        }
        # the comparator it amortizes: exact correlation over every
        # block pair. At ×10 (~75k series, ~15k per event-type block)
        # the per-block pair matrix alone is ~15k² doubles ≈ 1.8 GB —
        # the python worker dies; that failure IS the measurement, so
        # record it instead of crashing the probe.
        try:
            t_exact = _noop(
                lambda: series_correlation(ev, t0, t1, step, min_abs_r=0.0)
            )
            results[f"x{s}"]["exact_all_pairs_s"] = round(t_exact, 2)
        except Exception as ex:  # noqa: BLE001 — the probe must survive
            results[f"x{s}"]["exact_all_pairs_s"] = (
                f"failed: {type(ex).__name__} (pair space ~"
                f"{(n_series // 5) ** 2:,} per block)"
            )
    print(json.dumps({"probe": "r11b_sax_topk", **results}))


def probe_upsert_scale(spark, out: str) -> None:
    """r11c: upsert_latest with a 10⁶-series cache — per-batch merge
    cost for a narrow (100-series) and a wide (50k-series) batch at 64
    and 256 buckets. The claim under test: work is O(batch ∪ touched
    buckets), so the narrow batch must NOT scale with bucket count or
    cache size, and more buckets must make it cheaper (fewer rows per
    touched bucket), at the price of more files."""
    import shutil

    from epicsarchiver_spark.streaming.ingest import read_cache, upsert_latest

    results = {}
    n_series = 1_000_000
    seed = spark.range(n_series).select(
        F.concat(F.lit("PV:"), F.col("id").cast("string")).alias("pvname"),
        F.lit(0.0).alias("value"),
        F.lit(1.0).alias("time"),
    )
    for buckets in (64, 256):
        cache = f"{out}/cache_b{buckets}"
        shutil.rmtree(cache, ignore_errors=True)
        t0 = time.perf_counter()
        upsert_latest(seed, cache, buckets=buckets)
        t_seed = time.perf_counter() - t0

        def batch_of(n):
            return spark.range(n).select(
                F.concat(
                    F.lit("PV:"), (F.col("id") * 17 % n_series).cast("string")
                ).alias("pvname"),
                (F.col("id") % 100).cast("double").alias("value"),
                F.lit(2.0).alias("time"),
            )

        t_narrow = []
        for _ in range(3):
            tb = time.perf_counter()
            upsert_latest(batch_of(100), cache, buckets=buckets)
            t_narrow.append(time.perf_counter() - tb)
        tb = time.perf_counter()
        upsert_latest(batch_of(50_000), cache, buckets=buckets)
        t_wide = time.perf_counter() - tb
        n_rows = read_cache(spark, cache).count()
        results[f"b{buckets}"] = {
            "seed_1m_s": round(t_seed, 2),
            "narrow100_median_s": round(statistics.median(t_narrow), 2),
            "wide50k_s": round(t_wide, 2),
            "cache_rows": n_rows,
        }
        shutil.rmtree(cache, ignore_errors=True)
    print(json.dumps({"probe": "r11c_upsert_1m", **results}))



def probe_new_ops(spark, out: str) -> None:
    """r11e: the round's remaining new operators at ×1/×10 — all
    scan-shaped by design (discords: two keyed exchanges; holt_winters/
    forecast_eval: one series-keyed window; boilerplate/mojibake: zero
    shuffle)."""
    from epicsarchiver_spark.operators.text_ops import (
        boilerplate_segments,
        mojibake_stats,
    )
    from epicsarchiver_spark.operators.timeseries import (
        forecast_eval,
        holt_winters,
        sax_discords,
    )
    from tools.scale_probe import gen_documents, gen_events

    results = {}
    for s in (1, 10):
        d = f"{out}/x{s}"
        if not os.path.exists(f"{d}/_DONE_DOCS"):
            gen_documents(spark, 5_000 * s, f"{d}/documents.parquet")
            open(f"{d}/_DONE_DOCS", "w").write("ok")
        if not os.path.exists(f"{d}/_DONE_EV"):
            gen_events(spark, 100_000 * s, 1500 * s, f"{d}/events.parquet")
            open(f"{d}/_DONE_EV", "w").write("ok")
        ev = spark.read.parquet(f"{d}/events.parquet").selectExpr(
            "event_id",
            "concat('EV:', CAST(user_id % 200 AS STRING), ':', event_type)"
            " AS pvname",
            "CAST(unix_micros(ts) AS DOUBLE) / 1e6 AS time",
            "value",
        )
        docs = spark.read.parquet(f"{d}/documents.parquet")
        results[f"x{s}"] = {
            "discords_s": round(_noop(lambda: sax_discords(ev)), 2),
            "holt_winters_s": round(_noop(lambda: holt_winters(ev)), 2),
            "forecast_eval_s": round(_noop(lambda: forecast_eval(ev)), 2),
            "boilerplate_s": round(
                _noop(lambda: boilerplate_segments(docs, seg_words=16)), 2
            ),
            "mojibake_s": round(_noop(lambda: mojibake_stats(docs)), 2),
        }
    print(json.dumps({"probe": "r11e_new_ops", **results}))



def probe_recall_dial(spark, out: str) -> None:
    """r11f: nomination recall vs the expand dial at ×1/×10 — how much
    of the signed-r top-5 the word index recovers as the neighbor
    radius widens, and what the indexed query pays for it. The
    gen_events corpus is WHITE NOISE per series (no recoverable shape —
    recall of any shape index against noise correlations is 0 by
    construction, measured), so this probe builds a STRUCTURED corpus:
    8 shape archetypes × per-series hash jitter, 2 000/20 000 series ×
    64 samples."""
    from epicsarchiver_spark.operators.timeseries import sax_topk_recall

    results = {}
    for s in (1, 10):
        n_series, n_samp = 2_000 * s, 64
        base = spark.range(n_series * n_samp).selectExpr(
            "id AS event_id",
            f"id % {n_series} AS sid",
            f"CAST(id DIV {n_series} AS DOUBLE) AS step_i",
        )
        # archetype k: sinusoid-ish integer pattern with phase/periods
        # varying by k; jitter: per-(series, step) hash in [0, 3)
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
        t0, t1, step = 0.0, (n_samp - 1) * 10.0, (n_samp - 1) * 10.0 / 15.0
        qpv = "SP:0"
        per_cfg = {}
        # the REAL dial at scale is word resolution: the fence only
        # sees n_candidates names, so bucket size (series/word-space)
        # must stay fence-sized — grow segments with the corpus, the
        # iSAX adaptive-cardinality move. 15-instant grid caps useful
        # segments at 15; use the full grid for the sharp config.
        for tag, nseg, alpha, expand, ncand in [
            ("4seg_x0", 4, 4, 0, 128),
            ("4seg_x1", 4, 4, 1, 128),
            ("4seg_x2", 4, 4, 2, 128),
            ("8seg_x1", 8, 4, 1, 128),
            ("8seg_x2_c512", 8, 4, 2, 512),
        ]:
            tq = time.perf_counter()
            row = sax_topk_recall(
                ev, qpv, t0, t1, step, k=5, n_segments=nseg, alphabet=alpha,
                expand=expand, n_candidates=ncand,
            ).head()
            per_cfg[tag] = {
                "recall_pct100": row["recall_pct100"],
                "n_indexed": row["n_indexed"],
                "wall_s": round(time.perf_counter() - tq, 2),
            }
        results[f"x{s}"] = per_cfg
    print(json.dumps({"probe": "r11f_recall_dial", **results}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scaleprobe")
    ap.add_argument("--sections", default="a")
    args = ap.parse_args()

    from epicsarchiver_spark.session import get_spark

    spark = get_spark("probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    sections = set(args.sections.split(","))
    if "a" in sections:
        probe_drift(spark)
    if "b" in sections:
        probe_sax_topk(spark, args.out)
    if "c" in sections:
        probe_upsert_scale(spark, args.out)
    if "d" in sections:
        probe_new_ops(spark, args.out)
    if "e" in sections:
        probe_recall_dial(spark, args.out)
    spark.stop()


if __name__ == "__main__":
    main()
