#!/usr/bin/env python
"""Round-10 scale probes (SCALE.md r10a-r10c) — the measurements
VERDICT r9 asked for:

a) drift adjudication — isolated fresh-session 3-run medians for the
   two queries whose r9 bench drifted >30% (emb_pipeline_verdicts
   1.82→2.81 s, emb_hard_negatives 1.42→1.96 s) plus a stable control
   (ts_latest), at sf0.1 — the r8a ritual;
b) doc_triangles_indexed at ×10 — the persisted-edge read-back lane
   against the inline build SCALE r9k showed dying unfenced;
c) bm25_multi at production Q — 1,000 standing queries over a
   2,000-term corpus-derived taxonomy vs the 4-query gate set.

Prints one JSON line per section. Run each section in its own process
for isolation (the point of section a):

    python tools/probe_r10.py --sections a
    python tools/probe_r10.py --sections b
    python tools/probe_r10.py --sections c
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
    """r10a: the r8a ritual — fresh session, no concurrent suite,
    round-robin interleaved 3 runs per flagged query, medians."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = ["emb_pipeline_verdicts", "emb_hard_negatives", "ts_latest"]
    # shared JVM/JIT warm-up, same as bench.py
    qs["ts_range_read"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            runs[n].append(round(_noop(lambda: qs[n](spark, SF_DIR)), 4))
    print(json.dumps({
        "probe": "r10a_drift",
        "sf_dir": SF_DIR,
        "medians": {n: round(statistics.median(v), 4) for n, v in runs.items()},
        "runs": runs,
    }))


def probe_triangles_indexed(spark, out: str) -> None:
    """r10b: triangles answered from the persisted 16 B/row edge
    artifact at ×1 and ×10 — build once (timed), then the read-back
    lane (timed separately; THIS is the steady state)."""
    from epicsarchiver_spark.operators import dedup
    from tools.scale_probe import gen_documents

    results = {}
    for s in (1, 10):
        d = f"{out}/x{s}"
        if not os.path.exists(f"{d}/_DONE_DOCS"):
            gen_documents(spark, 5_000 * s, f"{d}/documents.parquet")
            open(f"{d}/_DONE_DOCS", "w").write("ok")
        docs = spark.read.parquet(f"{d}/documents.parquet")
        edges_path = f"{d}/dup_edges"
        t0 = time.perf_counter()
        dedup.write_edges(
            dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.05),
            edges_path,
        )
        t_build = time.perf_counter() - t0
        edges = spark.read.parquet(edges_path)
        n_edges = edges.count()
        # the ×10 synthetic blob needs the r9k fence either way; use the
        # same cap on both scales so the lanes are comparable
        t_read = _noop(
            lambda: dedup.triangle_stats(edges, id_a="u", id_b="v", max_degree=50)
        )
        results[f"x{s}"] = {
            "edges": n_edges,
            "build_s": round(t_build, 2),
            "readback_s": round(t_read, 2),
        }
    print(json.dumps({"probe": "r10b_triangles_indexed", **results}))


def probe_bm25_q1000(spark) -> None:
    """r10c: standing-query BM25 at production Q — 1,000 queries over a
    2,000-term taxonomy (r9i measured Q=100 at 1.4× the Q=4 wall; this
    is the 10× step). The sf corpora's vocabulary is ~30 words, which
    makes every doc match every query (the dense worst case — measured
    too), so the taxonomy-scale run uses a synthetic 50k-doc corpus
    with a 20k-term hash vocabulary: realistic per-doc selectivity,
    where the one-pass term-union filter actually prunes."""
    from epicsarchiver_spark.operators.text_ops import bm25_multi

    # dense worst case: tiny real vocabulary, every doc hits every query
    docs_sf = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab_sf = [
        r.term
        for r in (
            docs_sf.select(F.explode(F.split(F.lower("text"), r"\W+")).alias("term"))
            .filter(F.length("term") > 0)
            .groupBy("term").count()
            .orderBy(F.desc("count"), "term").limit(2000).collect()
        )
    ]
    big_sf = {
        f"q{i:04d}": [vocab_sf[(3 * i + j) % len(vocab_sf)] for j in range(3)]
        for i in range(1000)
    }
    small_sf = {f"q{i}": big_sf[f"q{i:04d}"] for i in range(4)}
    t_small_d = _noop(lambda: bm25_multi(docs_sf, small_sf, k=10))
    t_big_d = _noop(lambda: bm25_multi(docs_sf, big_sf, k=10))

    # taxonomy scale: 20k-term vocabulary, 60-token docs
    wide = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(20_000)).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    ).persist()
    wide.count()
    vocab = [f"w{(7 * i) % 20_000}" for i in range(2000)]
    big = {
        f"q{i:04d}": [vocab[(3 * i + j) % len(vocab)] for j in range(3)]
        for i in range(1000)
    }
    small = {f"q{i}": big[f"q{i:04d}"] for i in range(4)}
    t_small = _noop(lambda: bm25_multi(wide, small, k=10))
    t_big = _noop(lambda: bm25_multi(wide, big, k=10))
    wide.unpersist()
    print(json.dumps({
        "probe": "r10c_bm25_q1000",
        "dense_31term": {"q4_s": round(t_small_d, 2), "q1000_s": round(t_big_d, 2),
                         "ratio": round(t_big_d / t_small_d, 2)},
        "taxonomy_20k_vocab": {
            "n_terms_union": len({t for q in big.values() for t in q}),
            "q4_s": round(t_small, 2), "q1000_s": round(t_big, 2),
            "ratio": round(t_big / t_small, 2),
        },
    }))


def probe_merge_components(spark, out: str) -> None:
    """r10d: incremental CC vs from-scratch at ×1/×10 — the nightly-
    batch claim: fold the 20% batch's touching pairs into the 80%
    artifact instead of rebuilding CC over the full pair graph."""
    from epicsarchiver_spark.operators import curation, dedup
    from tools.scale_probe import gen_documents

    results = {}
    for s in (1, 10):
        d = f"{out}/x{s}"
        if not os.path.exists(f"{d}/_DONE_DOCS"):
            gen_documents(spark, 5_000 * s, f"{d}/documents.parquet")
            open(f"{d}/_DONE_DOCS", "w").write("ok")
        docs = spark.read.parquet(f"{d}/documents.parquet")
        is_new = F.pmod(F.col("doc_id"), F.lit(5)) == 0
        comp_path = f"{d}/inc_components"
        t0 = time.perf_counter()
        curation.write_components(
            dedup.connected_components_star(
                dedup.jaccard_pairs_blocked(
                    docs.filter(~is_new), shingle_k=2, threshold=0.05
                )
            ),
            comp_path,
        )
        t_art = time.perf_counter() - t0
        comp = spark.read.parquet(comp_path)
        batch = dedup.jaccard_pairs_blocked(
            docs,
            shingle_k=2,
            threshold=0.05,
            new_ids=docs.filter(is_new).select("doc_id"),
        )
        t_inc = _noop(lambda: dedup.merge_components(comp, batch))
        t_full = _noop(
            lambda: dedup.connected_components_star(
                dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.05)
            )
        )
        results[f"x{s}"] = {
            "artifact_build_s": round(t_art, 2),
            "merge_s": round(t_inc, 2),
            "full_rebuild_s": round(t_full, 2),
        }
    print(json.dumps({"probe": "r10d_merge_components", **results}))


def probe_new_ops(spark, out: str) -> None:
    """r10e: the round's remaining new operators at ×1/×10 — all
    scan-shaped by design (holt/sax: one series-keyed window; rake:
    one token-stream window + vocab-sized aggregates)."""
    from epicsarchiver_spark.operators.text_ops import rake_keyphrases
    from epicsarchiver_spark.operators.timeseries import holt_linear, sax_symbols
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
            "holt_s": round(_noop(lambda: holt_linear(ev)), 2),
            "sax_s": round(_noop(lambda: sax_symbols(ev)), 2),
            "rake_s": round(_noop(lambda: rake_keyphrases(docs)), 2),
        }
    print(json.dumps({"probe": "r10e_new_ops", **results}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scaleprobe")
    ap.add_argument("--sections", default="a,b,c,d")
    args = ap.parse_args()

    from epicsarchiver_spark.session import get_spark

    spark = get_spark("probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    sections = set(args.sections.split(","))
    if "a" in sections:
        probe_drift(spark)
    if "b" in sections:
        probe_triangles_indexed(spark, args.out)
    if "c" in sections:
        probe_bm25_q1000(spark)
    if "d" in sections:
        probe_merge_components(spark, args.out)
    if "e" in sections:
        probe_new_ops(spark, args.out)
    spark.stop()


if __name__ == "__main__":
    main()
