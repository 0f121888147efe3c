"""Unit tests for the r4b additions: per-series value histograms,
median/MAD outliers, signed random projection, disjunctive revenue, and
the multimodal aHash near-dup family."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from epicsarchiver_spark.operators import multimodal, relational, similarity, timeseries


# --- value_histogram -------------------------------------------------------


def test_value_histogram_bins_and_degenerate(spark):
    rows = [("a", float(t), float(v)) for t, v in enumerate([0, 1, 2, 3, 4, 5, 6, 7, 8, 10])]
    rows += [("b", float(t), 7.5) for t in range(4)]  # degenerate: min == max
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = timeseries.value_histogram(df, n_bins=5)
    got = {(r.pvname, r.bin): (r.n, r.bin_lo, r.bin_hi) for r in out.collect()}
    # series a: range [0, 10], width 2 → values 0..8 land in bins 0..4,
    # and the max (10) clamps into the top bin
    assert got[("a", 0)][0] == 2  # 0, 1
    assert got[("a", 4)][0] == 2  # 8, 10 (clamped)
    assert got[("a", 0)][1:] == (0.0, 2.0)
    # total count preserved
    assert sum(n for (pv, _), (n, _, _) in got.items() if pv == "a") == 10
    # degenerate series: everything in bin 0
    assert got[("b", 0)][0] == 4
    assert ("b", 1) not in got


# --- robust_outliers -------------------------------------------------------


def test_robust_outliers_flags_glitch_not_constant(spark):
    base = [("a", float(t), 10.0 + (t % 2)) for t in range(20)]  # med 10.5, mad 0.5
    glitch = [("a", 20.0, 100.0)]
    const = [("c", float(t), 5.0) for t in range(10)]  # mad 0 → never flags
    df = spark.createDataFrame(
        base + glitch + const, "pvname string, time double, value double"
    )
    out = timeseries.robust_outliers(df, k=5.0).collect()
    assert [(r.pvname, r.time, r.value) for r in out] == [("a", 20.0, 100.0)]
    # approx lane returns the same flag set on this tiny frame
    out2 = timeseries.robust_outliers(df, k=5.0, exact=False).collect()
    assert [(r.pvname, r.time, r.value) for r in out2] == [("a", 20.0, 100.0)]


# --- random_project --------------------------------------------------------


def test_random_project_lanes_agree_and_preserve_distance(spark):
    rng = np.random.RandomState(7)
    vecs = [(i, rng.randn(64).astype("float32").tolist()) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    expr_lane = {
        r.vec_id: r.projected
        for r in similarity.random_project(df, out_dim=16, dim=64).collect()
    }
    gemm_lane = {
        r.vec_id: r.projected
        for r in similarity.random_project(df, out_dim=16, dim=64, gemm=True).collect()
    }
    for i in expr_lane:
        assert np.allclose(expr_lane[i], gemm_lane[i], atol=1e-9)
    # JL sanity: E[(s·(x−y))²] = |x−y|² per ±1 row, so the sketch's
    # squared distance / out_dim is an unbiased estimator of the true
    # squared distance — the per-pair ratio averages to ~1 (per-pair
    # spread is ~sqrt(2/out_dim) ≈ 35%, so test the MEAN over 100 pairs)
    ids = sorted(expr_lane)
    emb = {i: np.array(v, dtype=np.float64) for i, v in vecs}
    ratios = []
    for a in ids[:10]:
        for b in ids[10:20]:
            true_d = np.sum((emb[a] - emb[b]) ** 2)
            pa, pb = np.array(expr_lane[a]), np.array(expr_lane[b])
            ratios.append(np.sum((pa - pb) ** 2) / 16.0 / true_d)
    m = float(np.mean(ratios))
    assert 0.8 < m < 1.2, f"projection distance estimator biased (mean ratio={m:.3f})"


def test_sign_matrix_deterministic():
    a = similarity.signed_projection_matrix(64, 16)
    b = similarity.signed_projection_matrix(64, 16)
    assert a == b
    assert all(v in (1.0, -1.0) for row in a for v in row)
    # seeds differ → different matrix
    assert a != similarity.signed_projection_matrix(64, 16, seed=43)


# --- disjunctive_revenue ---------------------------------------------------


def test_disjunctive_revenue_matches_python(spark):
    li = spark.createDataFrame(
        [(1, 5.0, 100.0, 0.1), (1, 20.0, 50.0, 0.0), (2, 5.0, 10.0, 0.5), (3, 5.0, 7.0, 0.0)],
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#2", 5), (2, "Brand#4", 15), (3, "Brand#9", 1)],
        "p_partkey long, p_brand string, p_size int",
    )
    tiers = (("Brand#2", 10, 15.0), ("Brand#4", 20, 30.0))
    row = relational.disjunctive_revenue(li, part, tiers=tiers).head()
    # qualifying: (part 1, qty 5) and (part 2, qty 5); part 1 qty 20 fails
    # the tier qty cap, part 3's brand is in no tier
    assert row.n_items == 2
    assert row.revenue == pytest.approx(100.0 * 0.9 + 10.0 * 0.5)


def test_disjunctive_revenue_plan_broadcasts_part(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    plan = relational.disjunctive_revenue(li, part)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the derived brand prefilter reaches the part scan as a pushed filter
    assert "PushedFilters" in plan and "p_brand" in plan


# --- media aHash -----------------------------------------------------------


def _media_df(spark, rows):
    return spark.createDataFrame(
        rows, "media_id string, kind string, payload binary"
    ).select(
        "media_id", "kind", F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"), F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"), "payload",
    )


def test_ahash_container_invariance_bmp_vs_png(spark):
    """The decoded lane's point: the same picture in BMP and PNG
    containers hashes identically, while raw-bytes hashing would not."""
    from epicsarchiver_spark.operators.multimodal import _encode_bmp, _encode_png

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(16, 24, 3), dtype=np.uint8)
    df = _media_df(
        spark,
        [("bmp", "image", bytearray(_encode_bmp(px))), ("png", "image", bytearray(_encode_png(px)))],
    )
    got = {
        r.media_id: r.ahash
        for r in multimodal.media_ahash(df, codec=multimodal.PurePythonCodec()).collect()
    }
    assert got["bmp"] == got["png"]
    raw = {r.media_id: r.ahash for r in multimodal.media_ahash(df).collect()}
    assert raw["bmp"] != raw["png"]  # containers differ byte-wise


def test_ahash_matches_hand_computation(spark):
    payload = bytes(range(128))  # chunks of 2 bytes, strictly increasing sums
    df = _media_df(spark, [("x", "image", bytearray(payload))])
    got = multimodal.media_ahash(df).head().ahash
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    sums = arr.reshape(64, 2).sum(axis=1)
    expect = 0
    for j in np.nonzero(64 * sums > arr.sum())[0]:
        expect |= 1 << int(j)
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert got == expect
    # empty payload → 0
    empty = _media_df(spark, [("e", "image", bytearray(b""))])
    assert multimodal.media_ahash(empty).head().ahash == 0


def test_near_dup_media_finds_noisy_copy(spark):
    from epicsarchiver_spark.operators.multimodal import _encode_bmp

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    near = px.copy()
    near[0, 0] = [255, 255, 255]  # tiny perturbation: a few ahash bits at most
    far = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    df = _media_df(
        spark,
        [
            ("orig", "image", bytearray(_encode_bmp(px))),
            ("near", "image", bytearray(_encode_bmp(near))),
            ("far", "image", bytearray(_encode_bmp(far))),
        ],
    )
    pairs = multimodal.near_dup_media(
        df, max_hamming=3, codec=multimodal.PurePythonCodec()
    ).collect()
    assert ("near", "orig") in {(r.id_a, r.id_b) for r in pairs}
    assert all({"far"} != {r.id_a, r.id_b} - {"orig", "near"} or r.hamming <= 3 for r in pairs)


# --- series_correlation ----------------------------------------------------


def test_series_correlation_sign_and_blocking(spark):
    # x and y move together, z moves opposite; w is in another block and
    # must never pair with them
    rows = []
    for t in range(10):
        v = float(t * 10)
        rows += [
            (f"A:{1}:g1", 1000.0 + t * 100, 50.0 + v),
            (f"A:{2}:g1", 1000.0 + t * 100, 10.0 + 2 * v),
            (f"A:{3}:g1", 1000.0 + t * 100, 90.0 - v),
            (f"B:{1}:g2", 1000.0 + t * 100, 50.0 + v),
        ]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = {
        (r.pv_a, r.pv_b): r.r
        for r in __import__(
            "epicsarchiver_spark.operators.timeseries", fromlist=["x"]
        ).series_correlation(df, 1000.0, 1900.0, 100.0, min_abs_r=0.9).collect()
    }
    assert out[("A:1:g1", "A:2:g1")] == pytest.approx(1.0)
    assert out[("A:1:g1", "A:3:g1")] == pytest.approx(-1.0)
    assert all("B:" not in a and "B:" not in b for (a, b) in out), "cross-block pair leaked"


def test_series_correlation_constant_series_excluded(spark):
    rows = [("c:1:g", 1000.0 + t, 5.0) for t in range(5)]
    rows += [("c:2:g", 1000.0 + t, float(t)) for t in range(5)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = timeseries.series_correlation(df, 1000.0, 1004.0, 1.0, min_abs_r=0.0).collect()
    assert out == []  # zero-variance side excluded


# --- length_percentile_trim ------------------------------------------------


def test_length_percentile_trim_bounds_and_ties(spark):
    from epicsarchiver_spark.operators import text_ops

    rows = [(i, "t", "en", "web", n) for i, n in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    kept = sorted(r.n_chars for r in text_ops.length_percentile_trim(df, lo=0.2, hi=0.8).collect())
    # percent_rank of n_chars=10 is 0, 100 is 1; (rank-1)/9 in [0.2, 0.8]
    # → ranks 2.8..8.2 → n_chars 30..80
    assert kept == [30, 40, 50, 60, 70, 80]
    # ties share ranks: all-equal stratum has percent_rank 0 everywhere → kept iff lo <= 0
    tie = spark.createDataFrame([(i, "t", "de", "web", 7) for i in range(4)],
                                "doc_id long, text string, lang string, source string, n_chars long")
    assert text_ops.length_percentile_trim(tie, lo=0.0, hi=0.5).count() == 4
    assert text_ops.length_percentile_trim(tie, lo=0.1, hi=0.5).count() == 0


# --- pq_codes --------------------------------------------------------------


def test_pq_codes_match_numpy_argmin(spark):
    rng = np.random.RandomState(5)
    vecs = [(i, (rng.rand(64) * 2 - 1).astype("float32").tolist()) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {}
    for r in similarity.pq_codes(df).collect():
        got.setdefault(r.vec_id, {})[r.subspace] = r.code
    cb = similarity.pq_codebook(8, 16, 8)
    for i, v in vecs:
        x = np.array(v, dtype=np.float64)
        for s in range(8):
            sub = x[8 * s : 8 * s + 8]
            d = [float(np.sum((sub - np.array(c)) ** 2)) for c in cb[s]]
            assert got[i][s] == int(np.argmin(d)), (i, s)
    # every vector yields exactly 8 codes in [0, 16)
    assert all(len(c) == 8 and all(0 <= v < 16 for v in c.values()) for c in got.values())


def test_series_correlation_gemm_join_lanes_identical(spark):
    import __spark_entry__ as em
    from epicsarchiver_spark.catalog import points_view

    pts = points_view(spark, "/root/testdata/sf0.001").select(
        "event_id", "pvname", "time", "value"
    )
    kw = dict(min_abs_r=0.5)
    g = timeseries.series_correlation(pts, em.T0, em.T1, em.GRID_STEP, method="gemm", **kw)
    j = timeseries.series_correlation(pts, em.T0, em.T1, em.GRID_STEP, method="join", **kw)
    gs = sorted((r.pv_a, r.pv_b, r.n, r.r) for r in g.collect())
    js = sorted((r.pv_a, r.pv_b, r.n, r.r) for r in j.collect())
    assert gs == js and len(gs) > 0  # bit-identical incl. the float r


# --- ramps -----------------------------------------------------------------


def test_ramps_islands_and_strictness(spark):
    # a: 4 up-steps, a plateau (breaks the run), then 3 down-steps
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 4.0, 3.0, 2.0]
    rows = [("a", float(t), v) for t, v in enumerate(vals)]
    rows += [("b", float(t), 1.0 + 0.5 * (t % 2)) for t in range(6)]  # zig-zag: no run >= 3
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = sorted(
        (r.pvname, r.direction, r.t_start, r.t_end, r.n_steps, r.delta)
        for r in timeseries.ramps(df, min_steps=3).collect()
    )
    assert out == [
        ("a", -1, 5.0, 8.0, 3, -3.0),
        ("a", 1, 0.0, 4.0, 4, 4.0),
    ]


# --- ivfpq_topk ------------------------------------------------------------


def test_ivfpq_topk_ranks_by_adc_and_accepts_index(spark):
    import pandas as pd

    rng = np.random.RandomState(9)
    vecs = [(i, (rng.rand(64) * 2 - 1).astype("float32").tolist()) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    query = [float(x) for x in (rng.rand(64) * 2 - 1)]
    got = similarity.ivfpq_topk(df, query, k=10, n_cells=8, n_probe=8).collect()
    assert len(got) == 10
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)
    # correctness property: Spark's ADC ranking equals an independent
    # numpy mirror of codes → LUT → summed lookups. (True-L2 recall is a
    # property of the CODEBOOK, not the operator — the untrained LCG
    # codebook is deliberately lossy; train per subspace for recall.)
    cb = similarity.pq_codebook(8, 16, 8)
    adc = {}
    for i, v in vecs:
        x = np.array(v, dtype=np.float64)
        tot = 0.0
        for s in range(8):
            sub = x[8 * s : 8 * s + 8]
            code = int(np.argmin([np.sum((sub - np.array(c)) ** 2) for c in cb[s]]))
            qs = np.array(query[8 * s : 8 * s + 8])
            tot += float(np.sum((qs - np.array(cb[s][code])) ** 2))
        adc[i] = tot
    np_top = sorted(adc, key=lambda i: (adc[i], i))[:10]
    assert [r.vec_id for r in got] == np_top

    # the persisted-index path returns the same ranking
    from epicsarchiver_spark.operators.similarity import (
        _hyperplanes,
        _nearest_cell_udf,
        _pq_codes_wide,
        as_double,
    )

    cents = _hyperplanes(64, 8, 42)
    cells = df.select(
        F.col("vec_id"), as_double(F.col("embedding")).alias("v")
    ).withColumn("cell", _nearest_cell_udf(cents)(F.col("v"))).select("vec_id", "cell")
    index = cells.join(_pq_codes_wide(df), "vec_id")
    got2 = similarity.ivfpq_topk(df, query, k=10, n_cells=8, n_probe=8, index=index).collect()
    assert [(r.vec_id, r.adc_dist) for r in got2] == [(r.vec_id, r.adc_dist) for r in got]


def test_pq_gemm_lane_matches_expression_lane(spark):
    from epicsarchiver_spark.operators.similarity import _pq_codes_wide

    vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = {r.vec_id: tuple(r[1:]) for r in _pq_codes_wide(vecs).collect()}
    b = {r.vec_id: tuple(r[1:]) for r in _pq_codes_wide(vecs, gemm=True).collect()}
    assert a == b and len(a) == vecs.count()


# --- corpus-level paragraph dedup ------------------------------------------


def test_dedup_paragraphs_corpus_keeps_one_copy_globally(spark):
    from epicsarchiver_spark.operators import text_ops

    docs = spark.createDataFrame(
        [
            (1, "intro\nshared banner\nbody one\nshared banner"),
            (2, "shared banner\nbody two"),
            (3, "body three"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_segments, r.n_kept, r.text_dedup)
        for r in text_ops.dedup_paragraphs_corpus(docs).collect()
    }
    # 'shared banner' survives ONLY at its first corpus occurrence
    # (doc 1, position 1); doc 1's own repeat and doc 2's copy vanish
    assert out[1] == (4, 3, "intro\nshared banner\nbody one")
    assert out[2] == (2, 1, "body two")
    assert out[3] == (1, 1, "body three")


def test_dedup_paragraphs_corpus_fully_duplicated_doc(spark):
    from epicsarchiver_spark.operators import text_ops

    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nb")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_kept, r.text_dedup)
        for r in text_ops.dedup_paragraphs_corpus(docs).collect()
    }
    assert out[1] == (2, "a\nb")
    assert out[2] == (0, "")  # every segment already owned by doc 1


# --- randomized python-mirror checks ---------------------------------------


def test_value_histogram_matches_python_mirror_random(spark):
    rng = np.random.RandomState(21)
    rows = []
    for pv in ("x", "y", "z"):
        n = rng.randint(1, 40)
        for t in range(n):
            rows.append((pv, float(t), round(float(rng.randn() * 50), 2)))
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = {
        (r.pvname, r.bin): r.n for r in timeseries.value_histogram(df, n_bins=7).collect()
    }
    # python mirror with the same closed-form edges
    series = {}
    for pv, _, v in rows:
        series.setdefault(pv, []).append(v)
    expect = {}
    for pv, vals in series.items():
        lo, hi = min(vals), max(vals)
        w = (hi - lo) / 7
        for v in vals:
            b = min(int((v - lo) // w), 6) if hi > lo else 0
            expect[(pv, b)] = expect.get((pv, b), 0) + 1
    assert got == expect


def test_ramps_matches_python_mirror_random(spark):
    rng = np.random.RandomState(33)
    rows = []
    for pv in ("p", "q"):
        v = 100.0
        for t in range(60):
            v = float(round(v + float(rng.choice([-1.0, 0.0, 1.0])) * int(rng.randint(0, 3)), 2))
            rows.append((pv, float(t), v))
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = sorted(
        (r.pvname, r.direction, r.t_start, r.t_end, r.n_steps, round(r.delta, 2))
        for r in timeseries.ramps(df, min_steps=2).collect()
    )
    # mirror: walk each series, build maximal same-sign runs on cent deltas
    expect = []
    series = {}
    for pv, t, v in rows:
        series.setdefault(pv, []).append((t, int(round(v * 100))))
    for pv, pts in series.items():
        run = None  # (dir, t_start, t_end, n, cents)
        for (t0, q0), (t1, q1) in zip(pts, pts[1:]):
            dq = q1 - q0
            if dq == 0:
                if run:
                    expect.append((pv, *run))
                run = None
                continue
            d = 1 if dq > 0 else -1
            if run and run[0] == d:
                run = (d, run[1], t1, run[3] + 1, run[4] + dq)
            else:
                if run:
                    expect.append((pv, *run))
                run = (d, t0, t1, 1, dq)
        if run:
            expect.append((pv, *run))
    expect = sorted(
        (pv, d, ts, te, n, round(c / 100.0, 2))
        for pv, d, ts, te, n, c in expect
        if n >= 2
    )
    assert got == expect


def test_dedup_paragraphs_corpus_partition_invariance_and_coverage(spark):
    from epicsarchiver_spark.operators import text_ops

    rng = np.random.RandomState(44)
    vocab = [f"seg{i}" for i in range(12)]
    docs = [
        (i, "\n".join(rng.choice(vocab, size=rng.randint(1, 8))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = text_ops.dedup_paragraphs_corpus(df).collect()
    # every distinct segment of the corpus survives EXACTLY once overall
    kept_all = [s for r in out for s in r.text_dedup.split("\n") if s]
    distinct = {s for _, t in docs for s in t.split("\n")}
    assert sorted(kept_all) == sorted(distinct)
    # result invariant under input partitioning
    out2 = text_ops.dedup_paragraphs_corpus(df.repartition(13)).collect()
    assert {(r.doc_id, r.text_dedup) for r in out} == {
        (r.doc_id, r.text_dedup) for r in out2
    }


# --- availability / blocklist ----------------------------------------------


def test_availability_hand_computed(spark):
    # hb=10 over [0, 100): a has points at 0, 5, 50 → union of live
    # intervals [0,15)∪[50,60) = 25 s; b is silent after -3 → [−3+… clip:
    # seed point at -3 covers [0, 7)
    rows = [("a", 0.0, 1.0), ("a", 5.0, 1.0), ("a", 50.0, 1.0), ("b", -3.0, 1.0)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = {r.pvname: (r.covered_s, r.uptime) for r in
           timeseries.availability(df, 0.0, 100.0, 10.0).collect()}
    assert got["a"] == (25.0, 0.25)
    assert got["b"] == (7.0, 0.07)


def test_availability_full_coverage_and_pruning(spark):
    rows = [("c", float(t), 1.0) for t in range(0, 100, 5)]
    rows += [("old", -1000.0, 1.0)]  # outside t0 - heartbeat → no row at all
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    got = {r.pvname: r.uptime for r in timeseries.availability(df, 0.0, 100.0, 10.0).collect()}
    assert got["c"] == 1.0
    assert "old" not in got


def test_blocklist_stats_c4_semantics(spark):
    from epicsarchiver_spark.operators import text_ops

    docs = spark.createDataFrame(
        [(1, "clean words only"), (2, "one BAD word here"), (3, "bad bad bad bad")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.n_hits, r.keep) for r in
           text_ops.blocklist_stats(docs, ["bad"], max_hit_ratio=0.0).collect()}
    assert out[1] == (3, 0, True)
    assert out[2] == (4, 1, False)  # case-insensitive hit
    assert out[3] == (4, 4, False)
    # relaxed threshold keeps the single-hit doc
    out2 = {r.doc_id: r.keep for r in
            text_ops.blocklist_stats(docs, ["bad"], max_hit_ratio=0.25).collect()}
    assert out2 == {1: True, 2: True, 3: False}


def test_drift_recovers_known_slope(spark):
    # value = 5 + 2.5/day * t(days), exact cents; slope recovered exactly
    rows = []
    for d in range(10):
        t = 1000.0 + d * 86400.0
        rows.append(("ramp", t, round(5.0 + 2.5 * d, 2)))
    rows += [("flat", 1000.0 + d * 86400.0, 7.0) for d in range(5)]
    rows += [("single", 1000.0, 3.0)]  # n=1 → no trend row
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = {r.pvname: (r.n, r.slope_per_day) for r in
           timeseries.drift(df, 0.0, 1e7).collect()}
    assert out["ramp"][0] == 10
    assert abs(out["ramp"][1] - 2.5) < 1e-9
    assert out["flat"][1] == 0.0
    assert "single" not in out


# --- heavy hitters / transitions / promo share ------------------------------


def test_heavy_hitters_sketch_equals_exact(spark):
    from epicsarchiver_spark.operators import text_ops

    rng = np.random.RandomState(8)
    vocab = [f"w{i}" for i in range(50)]
    weights = np.array([50, 30, 20] + [1] * 47, dtype=float)
    weights /= weights.sum()
    docs = [
        (i, " ".join(rng.choice(vocab, size=40, p=weights))) for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # tiny sketch (width 8) forces heavy collision — result must STILL
    # equal the exact group-by (CMS only ever overcounts)
    a = {(r.term, r.n) for r in text_ops.heavy_hitters(df, 100, width=8, depth=2).collect()}
    b = {(r.term, r.n) for r in text_ops.heavy_hitters(df, 100, sketch=False).collect()}
    assert a == b and len(b) >= 2


def test_transitions_rows_normalize_and_count(spark):
    from epicsarchiver_spark.operators import events as ev_ops
    import datetime

    rows = []
    seq = ["a", "b", "a", "c", "a", "b"]
    for i, t in enumerate(seq):
        rows.append((i, datetime.datetime(2024, 1, 1, 0, 0, i), 1, t))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {(r.src, r.dst): (r.n, r.p) for r in ev_ops.transitions(df).collect()}
    # a→b twice, a→c once; rows for src=a normalize to 1
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "c")] == (1, 1 / 3)
    assert out[("b", "a")][0] == 1
    import math
    srcs = {}
    for (s, _), (_, p) in out.items():
        srcs[s] = srcs.get(s, 0.0) + p
    assert all(math.isclose(v, 1.0) for v in srcs.values())


def test_promo_share_math(spark):
    li = spark.createDataFrame(
        [(1, "1996-06-01", 100.0, 0.0), (2, "1996-07-01", 300.0, 0.0),
         (1, "1999-01-01", 999.0, 0.0)],  # outside window
        "l_partkey long, l_shipdate string, l_extendedprice double, l_discount double",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    r = relational.promo_revenue_share(li, part).head()
    assert (r.promo_revenue, r.total_revenue, r.promo_pct) == (100.0, 400.0, 25.0)


def test_level_shifts_flags_step_not_noise(spark):
    rows = []
    # step series: 10 samples at 0, then 10 at 100 — the boundary rows flag
    for t in range(10):
        rows.append(("step", float(t), 0.0))
    for t in range(10, 20):
        rows.append(("step", float(t), 100.0))
    # zig-zag noise of amplitude 1: window means never differ by > 50
    rows += [("noise", float(t), float(t % 2)) for t in range(20)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = timeseries.level_shifts(df, window=5, threshold=50.0).collect()
    assert all(r.pvname == "step" for r in out) and len(out) >= 1
    # the cleanest cut: before-mean 0, after-mean 100 at t=10
    best = {r.time: (r.mean_before, r.mean_after, r.shift) for r in out}
    assert best[10.0] == (0.0, 100.0, 100.0)
    # edges are silent (not enough samples on a side)
    assert all(5 <= r.time <= 14 for r in out)


# --- winnowing / large orders / top paths ----------------------------------


def test_winnow_guarantee_shared_substring_yields_shared_fp(spark):
    from epicsarchiver_spark.operators import dedup as dd

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail one"),
            (2, "completely different lead " + shared + " other tail"),
            (3, "nothing in common with those documents at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    # guarantee: a shared run of >= k+w-1 = 8 tokens must surface >= 1
    # shared fingerprint; the 10-token block gives several
    pairs = {(r.id_a, r.id_b): r.n_shared for r in
             dd.winnow_matches(docs, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all({a, b} != {1, 3} and {a, b} != {2, 3} for a, b in pairs)


def test_winnow_density_below_full_hash_set(spark):
    from epicsarchiver_spark.operators import dedup as dd
    from epicsarchiver_spark.functions.text import tokens as _tk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    n_fp = dd.winnow_fingerprints(docs).count()
    n_tok = docs.select(F.explode(_tk(F.col("text")))).count()
    assert 0 < n_fp < n_tok  # selected ≈ 2/(w+1) density, must be well below


def test_large_orders_threshold_and_order(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    od = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    cu = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    rows = relational.large_orders(li, od, cu, min_qty=300.0, k=20).collect()
    assert 0 < len(rows) <= 20
    qtys = [r.total_qty for r in rows]
    assert qtys == sorted(qtys, reverse=True)
    assert all(q >= 300.0 for q in qtys)


def test_top_paths_counts_ordered_ngrams(spark):
    from epicsarchiver_spark.operators import events as ev_ops
    import datetime

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for i, t in enumerate(["view", "click", "purchase", "view"]):
            rows.append((eid, datetime.datetime(2024, 1, 1, 0, u, i), u, t))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {r.path: r.n_occurrences for r in ev_ops.top_paths(df, n=3, k=5).collect()}
    assert out == {"view>click>purchase": 3, "click>purchase>view": 3}


def test_top_paths_short_timelines(spark):
    """Users with fewer than n events must contribute zero grams, not
    crash: sequence(1, size-(n-1)) with stop < start is a DESCENDING
    array in Spark, so unguarded slice(seq, 0, n) threw
    INVALID_PARAMETER_VALUE.START (ADVICE r4, high)."""
    from epicsarchiver_spark.operators import events as ev_ops
    import datetime

    rows = []
    eid = 0
    # user 1: full 3-event path; user 2: two events; user 3: one event
    for u, seq in ((1, ["view", "click", "purchase"]), (2, ["view", "click"]), (3, ["view"])):
        for i, t in enumerate(seq):
            rows.append((eid, datetime.datetime(2024, 1, 1, 0, u, i), u, t))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {r.path: r.n_occurrences for r in ev_ops.top_paths(df, n=3, k=5).collect()}
    assert out == {"view>click>purchase": 1}
    # n larger than every timeline → empty, not an error
    assert ev_ops.top_paths(df, n=9, k=5).count() == 0


# --- degenerate-input sweep -------------------------------------------------


def test_text_ops_survive_degenerate_docs(spark):
    """Empty text, whitespace-only, and single-token docs must flow
    through every text operator without raising (the ADVICE-r3 class of
    bug: degenerate rows diverging or killing a stage)."""
    from epicsarchiver_spark.operators import dedup as dd
    from epicsarchiver_spark.operators import text_ops

    docs = spark.createDataFrame(
        [(1, "", "en", "web", 0), (2, "   ", "en", "web", 3),
         (3, "solo", "de", "web", 4), (4, "two words", "en", "code", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    results = {
        "stats": text_ops.text_stats(docs).collect(),
        "quality": text_ops.quality_scores(docs).collect(),
        "gopher": text_ops.gopher_rules(docs).collect(),
        "segments": text_ops.dedup_segments(docs).collect(),
        "paragraphs": text_ops.dedup_paragraphs_corpus(docs).collect(),
        "blocklist": text_ops.blocklist_stats(docs, ["solo"]).collect(),
        "hh": text_ops.heavy_hitters(docs, 1, width=16, depth=2).collect(),
        "winnow": dd.winnow_matches(docs, min_shared=1).collect(),
        "substr": dd.dedup_substrings(docs, window=2).collect(),
        "minhash": dd.minhash_near_duplicates(docs, shingle_k=2).collect(),
        "trim": text_ops.length_percentile_trim(docs, lo=0.0, hi=1.0).collect(),
    }
    # every per-doc operator keeps all four rows (incl. the empty doc)
    for name in ("stats", "quality", "segments", "paragraphs", "blocklist", "substr"):
        assert len(results[name]) == 4, name
    assert len(results["trim"]) == 4
    assert results["winnow"] == []  # nothing long enough to fingerprint


def test_correlated_partners_topk_bounded_and_ranked(spark):
    rows = []
    for t in range(12):
        v = float(t)
        rows += [
            (f"A:{i}:g", 100.0 + t * 10, 1.0 + v * m)
            for i, m in enumerate([1.0, 2.0, -1.0, 0.5])
        ]
        rows.append(("A:4:g", 100.0 + t * 10, 7.0))  # constant: never ranks
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = {}
    for r in timeseries.correlated_partners(df, 100.0, 210.0, 10.0, k=2).collect():
        out.setdefault(r.pv, []).append((r.partner, r.r))
    # every non-constant series gets exactly k partners, all |r| = 1
    assert set(out) == {f"A:{i}:g" for i in range(4)}
    assert all(len(v) == 2 for v in out.values())
    assert all(abs(abs(x) - 1.0) < 1e-12 for v in out.values() for _, x in v)
    # all-tied |r| = 1 → deterministic name order: A:0's partners are A:1, A:2
    assert [p for p, _ in out["A:0:g"]] == ["A:1:g", "A:2:g"]
    assert all(p != "A:4:g" for v in out.values() for p, _ in v)


def test_autocorrelation_periodic_vs_noise(spark):
    import math

    rows = []
    # alternating series: perfect negative autocorrelation at lag 1
    rows += [("alt", 100.0 + t * 10, float(t % 2)) for t in range(12)]
    # linear ramp: strong positive lag-1 autocorrelation
    rows += [("ramp", 100.0 + t * 10, float(t)) for t in range(12)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = {r.pvname: r.r for r in
           timeseries.autocorrelation(df, 100.0, 210.0, 10.0, lag=1).collect()}
    assert out["alt"] == pytest.approx(-1.0)
    assert out["ramp"] == pytest.approx(1.0)
    # lag 2 flips the alternating series back to +1
    out2 = {r.pvname: r.r for r in
            timeseries.autocorrelation(df, 100.0, 210.0, 10.0, lag=2).collect()}
    assert out2["alt"] == pytest.approx(1.0)


def test_interp_grid_brackets_holds_and_nulls(spark):
    rows = [("a", 10.0, 100.0), ("a", 30.0, 200.0)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = {r.t: r.value for r in
           timeseries.interp_grid(df, 0.0, 50.0, 10.0).collect()}
    assert out[0.0] is None            # before first point
    assert out[10.0] == 100.0          # coincident point reproduces exactly
    assert out[20.0] == pytest.approx(150.0)  # midpoint interpolates
    assert out[30.0] == 200.0
    assert out[40.0] == 200.0          # hold after last point
    assert out[50.0] == 200.0
