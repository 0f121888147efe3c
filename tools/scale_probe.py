#!/usr/bin/env python
"""Scaling probe: synthesize ×N-scale copies of the events / documents /
embeddings tables (schema-identical to the driver's testdata, fully
deterministic — hash-derived values, no RNG state) and measure headline
queries across scales to verify the cost-model claims in SCALE.md with
numbers instead of prose.

Usage:
    python tools/scale_probe.py [--scales 1,10,30] [--out /tmp/scaleprobe]

Each scale S generates S× the sf0.1 row counts (events 100k·S with S×
the series, documents 5k·S with the same ~10% duplicate rate,
embeddings 2k·S) and runs the probe queries end-to-end (noop write).
Prints one JSON line per scale: {"scale": S, "queries": {name: sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

T0_EPOCH = 1704067200  # 2024-01-01, same span as the driver's events
SPAN_S = 30 * 86400

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window query big small column data join filter group order "
    "stream customer the a"
).split()

PROBES = [
    "ts_range_read",
    "ts_get_data_bounded",
    "ts_latest",
    "ts_deadband",
    "ts_locf_grid",
    "ts_sessions",
    "ts_histogram",
    "ts_correlation",
    "ts_compress_exact",
    "doc_fingerprints",
    "doc_minhash_neardups",
    "doc_jaccard_pairs",
    "doc_paragraph_dedup",
    "doc_heavy_hitters",
    "doc_substring_dedup",
    "emb_cosine_neardups_banded",
    "emb_ivfpq_topk",
    "mm_near_dups",
    # r6b additions: GEMM semantic dedup, prototype pruning, exact
    # prefix-sum selection, report-card rollups, curation composite
    "emb_semantic_dedup",
    "emb_prototype_scores",
    "doc_budget_selection",
    "doc_corpus_report",
    "doc_ngram_diversity",
    "doc_ccnet_buckets",
    "doc_pipeline_verdicts",
    "ts_lttb",
    "ts_health_report",
    # r7: persisted-components read-back (first call pays the CC build +
    # write; rerun the probe name twice to see the steady-state read-back)
    "doc_dedup_shards_indexed",
    "doc_winnow_indexed",
    # r7 (VERDICT r6 task 7): the remaining r6b composites off the sf0.1
    # floor — component-composition shapes must hold at ×30
    "emb_pipeline_verdicts",
    "doc_corpus_diff",
    # r7c: leakage-free splits (CC + hash map), cross-modal survivors
    # (SemDeDup evidence → star CC → quality argmax), Q21 windowed pass
    "doc_component_splits",
    "doc_quality_survivors",
]


def gen_events(spark, n: int, n_users: int, path: str) -> None:
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(T0_EPOCH * 1_000_000)
            # double math: id·span_µs overflows BIGINT past ~3.5M rows
            + (F.col("id").cast("double") * F.lit(SPAN_S * 1e6 / n)).cast("long")
            + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "view", "purchase", "error", "signup")]),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(20000)).cast("double") / 100.0).alias(
            "value"
        ),
        F.concat(
            F.lit('{"k": '), F.pmod(F.xxhash64("id", F.lit(5)), F.lit(100)), F.lit("}")
        ).alias("props"),
    )
    df.write.mode("overwrite").parquet(path)


def gen_documents(spark, n: int, path: str) -> None:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_words = (F.pmod(F.xxhash64("id", F.lit(10)), F.lit(80)) + 40).cast("int")
    # ~10% of docs replicate the text of a neighbor (exact duplicates for
    # the dedup family); hash-derived word choice otherwise
    base_id = F.when(
        F.pmod(F.col("id"), F.lit(10)) == 0, F.col("id") - 1
    ).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(base_id, i), F.lit(len(VOCAB))) + 1).cast("int"),
        ),
    )
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.pmod(F.xxhash64("id", F.lit(11)), F.lit(3)) + 1).cast("int"),
        ).alias("lang"),
        F.element_at(
            F.array(F.lit("web"), F.lit("code"), F.lit("academic")),
            (F.pmod(F.xxhash64("id", F.lit(12)), F.lit(3)) + 1).cast("int"),
        ).alias("source"),
    )
    df = df.withColumn("n_chars", F.length("text").cast("long"))
    df.write.mode("overwrite").parquet(path)


def gen_embeddings(spark, n: int, path: str) -> None:
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64("id", i), F.lit(1000)).cast("float") / 500.0 - 1.0
            ),
        ).alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(20)), F.lit(8)).cast("int").alias("label"),
    )
    df.write.mode("overwrite").parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10")
    ap.add_argument("--out", default="/tmp/scaleprobe")
    ap.add_argument("--probes", default=None, help="comma list; default = built-in set")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    probes = args.probes.split(",") if args.probes else PROBES

    import __spark_entry__ as entrymod
    from epicsarchiver_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    for s in scales:
        d = f"{args.out}/x{s}"
        if not os.path.exists(f"{d}/_DONE"):
            shutil.rmtree(d, ignore_errors=True)
            gen_events(spark, 100_000 * s, 1500 * s, f"{d}/events.parquet")
            gen_documents(spark, 5_000 * s, f"{d}/documents.parquet")
            gen_embeddings(spark, 2_000 * s, f"{d}/embeddings.parquet")
            open(f"{d}/_DONE", "w").write("ok")
        timings = {}
        for name in probes:
            fn = qs.get(name)
            if fn is None:
                continue
            t0 = time.perf_counter()
            try:
                fn(spark, d).write.format("noop").mode("overwrite").save()
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # keep probing; report the failure
                timings[name] = f"ERR: {type(e).__name__}"
        print(json.dumps({"scale": s, "queries": timings}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
