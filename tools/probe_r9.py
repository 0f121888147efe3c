#!/usr/bin/env python
"""Round-9 scale probes (SCALE.md r9a-r9d): the measurements VERDICT r8
asked for — alert-CRUD MERGE at ×10, keyword labels at a 10× taxonomy,
fuzzy matching on a deliberately skewed natural-name fixture (with and
without the hot-block fence), the minhash_quality sampling dial's
by-contract flatness, and the batched-BPE lane at production-ish vocab
depth including its divergence from sequential Sennrich.

Reuses tools/scale_probe.py's deterministic generators for the ×N
corpora (same dirs, so a prior probe run's data is reused). Prints one
JSON line per probe section.

Usage: python tools/probe_r9.py [--out /tmp/scaleprobe] [--sections a,b,c,d]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import gen_documents, gen_embeddings, gen_events  # noqa: E402


def _ensure(spark, out: str, s: int) -> str:
    d = f"{out}/x{s}"
    if not os.path.exists(f"{d}/_DONE"):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        gen_events(spark, 100_000 * s, 1500 * s, f"{d}/events.parquet")
        gen_documents(spark, 5_000 * s, f"{d}/documents.parquet")
        gen_embeddings(spark, 2_000 * s, f"{d}/embeddings.parquet")
        open(f"{d}/_DONE", "w").write("ok")
    return d


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def probe_alert_and_labels(spark, out: str) -> None:
    """r9a: ctl_alert_upsert at ×1/×10 and keyword_labels at a 1×/10×
    taxonomy on the ×10 corpus."""
    import __spark_entry__ as entrymod

    from epicsarchiver_spark.operators.text_ops import keyword_labels

    qs = entrymod.queries()
    res: dict[str, object] = {}
    for s in (1, 10):
        d = _ensure(spark, out, s)
        res[f"ctl_alert_upsert_x{s}"] = _t(
            lambda: qs["ctl_alert_upsert"](spark, d)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    d10 = _ensure(spark, out, 10)
    docs = spark.read.parquet(f"{d10}/documents.parquet")
    base = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
            "part", "hash", "merge", "batch", "spark", "line", "sort",
            "window", "query", "big", "small", "column", "data", "join",
            "filter", "group", "order", "stream", "customer", "the"]
    tax1 = {f"lab{i}": base[i * 3:i * 3 + 3] for i in range(8)}
    # 10× label count; term lists drawn round-robin so every label still
    # matches real tokens (the argmax window stays labels-bounded)
    tax10 = {f"lab{i}": [base[(i * 3 + j) % len(base)] for j in range(3)]
             for i in range(80)}
    res["keyword_labels_tax8_x10"] = _t(
        lambda: keyword_labels(docs, tax1).write.format("noop").mode("overwrite").save()
    )
    res["keyword_labels_tax80_x10"] = _t(
        lambda: keyword_labels(docs, tax10).write.format("noop").mode("overwrite").save()
    )
    print(json.dumps({"probe": "r9a_alert_and_labels", **res}), flush=True)


def _skewed_names(spark, n: int):
    """Natural-name fixture with a hot first token: 30% 'maria …', the
    rest spread over ~n/100 distinct first tokens."""
    first = (
        F.when(F.pmod(F.col("id"), F.lit(10)) < 3, F.lit("maria"))
        .otherwise(F.concat(F.lit("fam"), F.pmod(F.xxhash64("id"), F.lit(n // 100))))
    )
    last = F.concat(F.lit("v"), F.lpad(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(9999)).cast("string"), 4, "0"))
    return spark.range(n).select(
        F.col("id"), F.concat_ws(" ", first, last).alias("name")
    )


def probe_fuzzy_skew(spark, out: str) -> None:
    """r9b: fuzzy_matches on the skewed fixture — fenced wall at ×1/×10,
    what the fence drops, and the unfenced cost at ×1 only (the point
    of the fence is that ×10 unfenced is not runnable)."""
    from epicsarchiver_spark.operators.dedup import (
        fuzzy_blocks_oversize,
        fuzzy_matches,
    )

    res: dict[str, object] = {}
    for s, n in ((1, 50_000), (10, 500_000)):
        df = _skewed_names(spark, n).cache()
        df.count()
        res[f"fenced_x{s}"] = _t(
            lambda: fuzzy_matches(df, "id", "name", max_distance=1, max_block=5_000)
            .write.format("noop").mode("overwrite").save()
        )
        rep = fuzzy_blocks_oversize(df, "id", "name", max_block=5_000).collect()
        res[f"dropped_blocks_x{s}"] = [[r.block_key, r.n_records] for r in rep]
        if s == 1:
            res["unfenced_x1"] = _t(
                lambda: fuzzy_matches(df, "id", "name", max_distance=1, max_block=None)
                .write.format("noop").mode("overwrite").save()
            )
        df.unpersist()
    print(json.dumps({"probe": "r9b_fuzzy_skew", **res}), flush=True)


def probe_minhash_dial(spark, out: str) -> None:
    """r9c: the sampling dial holds the truth-set cost flat by contract:
    full report at ×1 vs ×10, then sample_frac=1/scale at ×10 (same
    expected sampled-corpus size as ×1 full)."""
    from epicsarchiver_spark.operators.dedup import minhash_quality

    res: dict[str, object] = {}
    for s in (1, 10):
        d = _ensure(spark, out, s)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        res[f"full_x{s}"] = _t(
            lambda: minhash_quality(docs, threshold=0.5, shingle_k=2, basis="md5")
            .write.format("noop").mode("overwrite").save()
        )
    d10 = _ensure(spark, out, 10)
    docs10 = spark.read.parquet(f"{d10}/documents.parquet")
    res["sampled_0p1_x10"] = _t(
        lambda: minhash_quality(
            docs10, threshold=0.5, shingle_k=2, basis="md5", sample_frac=0.1
        ).write.format("noop").mode("overwrite").save()
    )
    print(json.dumps({"probe": "r9c_minhash_dial", **res}), flush=True)


def probe_bpe_vocab(spark, out: str) -> None:
    """r9d: batched BPE at vocab scale on the ×10 corpus — batch=64 to
    n_merges=1000 (rounds vs wall), plus divergence of greedy batching
    vs sequential Sennrich at a 256-merge common depth."""
    from epicsarchiver_spark.operators.bpe import learn_bpe, learn_bpe_batched

    d10 = _ensure(spark, out, 10)
    docs = spark.read.parquet(f"{d10}/documents.parquet")
    res: dict[str, object] = {}

    t0 = time.perf_counter()
    merges_b = learn_bpe_batched(docs, n_merges=1000, min_count=2, batch=64)
    res["batched_b64_n1000_wall"] = round(time.perf_counter() - t0, 3)
    res["batched_b64_n1000_learned"] = len(merges_b)

    depth = min(256, len(merges_b))
    t0 = time.perf_counter()
    merges_seq = learn_bpe(docs, n_merges=depth, min_count=2)
    res["sequential_wall"] = round(time.perf_counter() - t0, 3)
    res["common_depth"] = depth
    sb, ss = set(merges_b[:depth]), set(merges_seq)
    res["divergence_set"] = round(1 - len(sb & ss) / max(len(ss), 1), 4)
    # first index where the ordered sequences differ (order divergence)
    first_diff = next(
        (i for i, (x, y) in enumerate(zip(merges_b, merges_seq)) if x != y),
        depth,
    )
    res["first_order_divergence"] = first_diff
    print(json.dumps({"probe": "r9d_bpe_vocab", **res}), flush=True)


def probe_retrieval(spark, out: str) -> None:
    """r9e: the retrieval additions at ×1/×10 — hybrid RRF end-to-end
    (both lanes + fusion) vs the BM25 lane alone (fusion overhead must
    be lane-shaped, the fuse itself is bounded), IVF-PQ re-rank vs raw
    ADC (the second stage must be a near-constant increment), and MMR
    (stage 1 + a candidate-bounded c² basis — flat in corpus size
    beyond the scan)."""
    from epicsarchiver_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
        ivfpq_topk_rerank,
        mmr_topk,
    )
    from epicsarchiver_spark.operators.text_ops import bm25_topk, ranked_lane, rrf_fuse

    res: dict[str, object] = {}
    terms = ["spark", "join", "filter"]
    for s in (1, 10):
        d = _ensure(spark, out, s)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

        res[f"bm25_lane_x{s}"] = _t(
            lambda: bm25_topk(docs, terms, k=50)
            .write.format("noop").mode("overwrite").save()
        )

        def _hybrid():
            lex = bm25_topk(docs, terms, k=50)
            sem = ranked_lane(
                brute_force_topk(emb, qvec, k=50), "cosine_sim", id_col="vec_id"
            ).withColumnRenamed("vec_id", "doc_id")
            rrf_fuse(
                {"lex": lex.select("doc_id", "rank"), "sem": sem.select("doc_id", "rank")},
                k=20,
            ).write.format("noop").mode("overwrite").save()

        res[f"hybrid_rrf_x{s}"] = _t(_hybrid)

        res[f"ivfpq_adc_x{s}"] = _t(
            lambda: ivfpq_topk(emb, qvec, k=10, n_cells=8, n_probe=4)
            .write.format("noop").mode("overwrite").save()
        )
        res[f"ivfpq_rerank_x{s}"] = _t(
            lambda: ivfpq_topk_rerank(
                emb, qvec, k=10, n_candidates=50, n_cells=8, n_probe=4
            ).write.format("noop").mode("overwrite").save()
        )
        res[f"mmr_x{s}"] = _t(
            lambda: mmr_topk(emb, qvec, k=8, n_candidates=30)
            .write.format("noop").mode("overwrite").save()
        )
    print(json.dumps({"probe": "r9e_retrieval", **res}), flush=True)


def probe_smoothing_rollup(spark, out: str) -> None:
    """r9f: the EWMA smoother and the ROLLUP cube at ×1/×10 — both are
    single-exchange shapes, so wall should track the scan."""
    from epicsarchiver_spark.operators.timeseries import ewma, rollup_cube

    res: dict[str, object] = {}
    for s in (1, 10):
        d = _ensure(spark, out, s)
        pts = spark.read.parquet(f"{d}/events.parquet").selectExpr(
            "concat('PV:', user_id % 1000) AS pvname",
            "unix_micros(ts) / 1e6 AS time",
            "value",
        )
        res[f"ewma_x{s}"] = _t(
            lambda: ewma(pts).write.format("noop").mode("overwrite").save()
        )
        res[f"rollup_cube_x{s}"] = _t(
            lambda: rollup_cube(pts).write.format("noop").mode("overwrite").save()
        )
    print(json.dumps({"probe": "r9f_smoothing_rollup", **res}), flush=True)


def probe_iterative_retrieval(spark, out: str) -> None:
    """r9g: the iterative retrieval ops at ×1/×10 — farthest-first is k
    corpus scans (cost ∝ k × scan), PRF is two BM25 rounds + one
    distinct-token df pass; both should track the scan, never blow up."""
    from epicsarchiver_spark.operators.similarity import farthest_first_init
    from epicsarchiver_spark.operators.text_ops import bm25_prf

    res: dict[str, object] = {}
    for s in (1, 10):
        d = _ensure(spark, out, s)
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        docs = spark.read.parquet(f"{d}/documents.parquet")
        res[f"kpp_k5_x{s}"] = _t(
            lambda: farthest_first_init(emb, k=5)
            .write.format("noop").mode("overwrite").save()
        )
        res[f"bm25_prf_x{s}"] = _t(
            lambda: bm25_prf(docs, ["spark", "join"], k=20, fb_docs=5, fb_terms=3)
            .write.format("noop").mode("overwrite").save()
        )
    print(json.dumps({"probe": "r9g_iterative_retrieval", **res}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scaleprobe")
    ap.add_argument("--sections", default="a,b,c,d,e,f,g")
    args = ap.parse_args()

    from epicsarchiver_spark.session import get_spark

    spark = get_spark("probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    sections = set(args.sections.split(","))
    if "a" in sections:
        probe_alert_and_labels(spark, args.out)
    if "b" in sections:
        probe_fuzzy_skew(spark, args.out)
    if "c" in sections:
        probe_minhash_dial(spark, args.out)
    if "d" in sections:
        probe_bpe_vocab(spark, args.out)
    if "e" in sections:
        probe_retrieval(spark, args.out)
    if "f" in sections:
        probe_smoothing_rollup(spark, args.out)
    if "g" in sections:
        probe_iterative_retrieval(spark, args.out)
    spark.stop()


if __name__ == "__main__":
    main()
