"""Hybrid retrieval (RRF fusion) and two-stage ANN re-rank — r9
additions to the search surface. The gate queries doc_hybrid_rrf /
emb_ivfpq_rerank carry the full-oracle checks; these tests pin the
operator semantics (exact integer fusion, candidate-set containment)
and the 100 TB plan shapes (bounded windows, isin pushdown)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from epicsarchiver_spark.operators.similarity import (
    brute_force_topk,
    ivfpq_topk,
    ivfpq_topk_rerank,
)
from epicsarchiver_spark.operators.text_ops import ranked_lane, rrf_fuse
from tests.conftest import SF_ORACLE


def _lane(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_rrf_fuse_known_lanes_exact_integer_scores(spark):
    """Hand-checkable fusion: contributions are exact integer quotients
    1e12 // (60 + rank), summed per doc across lanes."""
    lex = _lane(spark, [(1, 1), (2, 2), (3, 3)])
    sem = _lane(spark, [(2, 1), (4, 2)])
    got = {
        r.doc_id: (r.n_lanes, r.rrf_scaled, r.rank)
        for r in rrf_fuse({"lex": lex, "sem": sem}, k=10).collect()
    }
    c = lambda rank: 10**12 // (60 + rank)  # noqa: E731
    assert got[2] == (2, c(2) + c(1), 1)  # both lanes → top fused
    assert got[1] == (1, c(1), 2)
    assert got[4] == (1, c(2), 3)
    assert got[3] == (1, c(3), 4)


def test_rrf_fuse_k_cut_and_id_tie_break(spark):
    """Equal fused scores break on id; top-k cut respects the fused
    order (a doc ranked 1 by one lane beats a doc ranked 2 by one
    lane, regardless of lane identity)."""
    a = _lane(spark, [(10, 1), (20, 2)])
    b = _lane(spark, [(30, 1), (40, 2)])
    rows = rrf_fuse({"a": a, "b": b}, k=3).collect()
    assert [r.doc_id for r in rows] == [10, 30, 20]  # ties (10,30), (20,40) → id
    assert [r.rank for r in rows] == [1, 2, 3]


def test_rrf_fuse_matches_python_reference(spark):
    """Fusion over the real sf0.01 lanes ≡ a direct python RRF on the
    same ranked inputs — the full pipeline mirror, including the k0
    constant and the scaled-integer arithmetic."""
    from epicsarchiver_spark.operators.text_ops import bm25_topk

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

    lex = bm25_topk(docs, ["spark", "join", "quantum"], k=30)
    sem = ranked_lane(
        brute_force_topk(emb, qvec, k=30), score_col="cosine_sim", id_col="vec_id"
    ).withColumnRenamed("vec_id", "doc_id")

    lex_ranks = {r.doc_id: r.rank for r in lex.collect()}
    sem_ranks = {r.doc_id: r.rank for r in sem.collect()}
    expected: dict[int, list] = {}
    for ranks in (lex_ranks, sem_ranks):
        for i, rk in ranks.items():
            e = expected.setdefault(i, [0, 0])
            e[0] += 1
            e[1] += 10**12 // (60 + rk)
    top = sorted(expected.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]

    got = rrf_fuse(
        {"lex": lex.select("doc_id", "rank"), "sem": sem.select("doc_id", "rank")},
        k=20,
    ).collect()
    assert [(r.doc_id, r.n_lanes, r.rrf_scaled) for r in got] == [
        (i, n, s) for i, (n, s) in top
    ]


def test_ranked_lane_orders_and_breaks_ties_on_id(spark):
    df = spark.createDataFrame(
        [(5, 0.9), (3, 0.9), (7, 0.5)], "vec_id long, cosine_sim double"
    )
    rows = ranked_lane(df, "cosine_sim", id_col="vec_id").orderBy("rank").collect()
    assert [(r.vec_id, r.rank) for r in rows] == [(3, 1), (5, 2), (7, 3)]


def test_ivfpq_rerank_equals_bruteforce_over_candidates(spark):
    """The re-rank stage is EXACT cosine over exactly the ADC candidate
    set: result ≡ brute_force_topk restricted to those ids, and every
    returned id is a nominated candidate."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

    cand_ids = {
        r.vec_id
        for r in ivfpq_topk(emb, qvec, k=40, n_cells=8, n_probe=4).collect()
    }
    got = ivfpq_topk_rerank(
        emb, qvec, k=10, n_candidates=40, n_cells=8, n_probe=4
    ).collect()
    assert {r.vec_id for r in got} <= cand_ids
    want = brute_force_topk(
        emb.filter(F.col("vec_id").isin(list(cand_ids))), qvec, k=10
    ).collect()
    assert [(r.vec_id, r.cosine_sim) for r in got] == [
        (r.vec_id, r.cosine_sim) for r in want
    ]


def test_ivfpq_rerank_improves_or_matches_adc_recall(spark):
    """Against exact cosine ground truth, re-ranked top-k recall must be
    ≥ the raw ADC top-k's — the whole point of the second stage."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    truth = {r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()}
    adc = {
        r.vec_id for r in ivfpq_topk(emb, qvec, k=10, n_cells=8, n_probe=4).collect()
    }
    rr = {
        r.vec_id
        for r in ivfpq_topk_rerank(
            emb, qvec, k=10, n_candidates=50, n_cells=8, n_probe=4
        ).collect()
    }
    assert len(rr & truth) >= len(adc & truth)


def test_mmr_defers_near_duplicate_of_top_hit(spark):
    """A clone of the most relevant vector must NOT be pick 2 — MMR's
    diversity penalty defers it behind a less-similar candidate."""
    from epicsarchiver_spark.operators.similarity import mmr_topk

    # NB: pick 1 must not be collinear with the query — if it were,
    # every candidate's penalty (sim to pick 1) would equal its
    # relevance and all λ=0.5 step-2 scores would tie at 0
    rows = [
        (1, [0.95, 0.31225, 0.0]),  # top relevance, off the query axis
        (2, [0.94, 0.33, 0.0]),  # near-clone of 1 (strictly less relevant)
        (3, [0.8, -0.6, 0.0]),  # decent relevance, diverse from 1
        (4, [0.0, 0.0, 1.0]),  # orthogonal to query
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    picks = [
        r.vec_id
        for r in mmr_topk(vecs, [1.0, 0.0, 0.0], k=3, n_candidates=4)
        .orderBy("step")
        .collect()
    ]
    # clone (2) is penalized by sim≈1 to pick 1; 3 then 4 outscore it
    assert picks == [1, 3, 4]


def test_mmr_lambda_one_is_pure_relevance_order(spark):
    """λ=1 removes the diversity term: the pick sequence must equal the
    exact-cosine top-k order."""
    from epicsarchiver_spark.operators.similarity import mmr_topk

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    picks = [
        r.vec_id
        for r in mmr_topk(emb, qvec, k=6, n_candidates=20, mmr_lambda=1.0)
        .orderBy("step")
        .collect()
    ]
    want = [r.vec_id for r in brute_force_topk(emb, qvec, k=6).collect()]
    assert picks == want


def test_mmr_k_truncates_to_candidate_count(spark):
    from epicsarchiver_spark.operators.similarity import mmr_topk

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    rows = mmr_topk(vecs, [1.0, 0.0], k=10, n_candidates=5).collect()
    assert len(rows) == 2
    assert sorted(r.step for r in rows) == [1, 2]


def test_mmr_and_kpp_accept_string_ids(spark):
    """r9 ADVICE: the result schema must derive the id type from the
    input frame — brute_force_topk/ivfpq handle string ids, so the
    greedy-pick operators must too."""
    from epicsarchiver_spark.operators.similarity import (
        farthest_first_init,
        mmr_topk,
    )

    vecs = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [0.7, 0.7])],
        "vec_id string, embedding array<double>",
    )
    m = mmr_topk(vecs, [1.0, 0.0], k=2, n_candidates=3).collect()
    assert [r.step for r in m] == [1, 2] and m[0].vec_id == "a"
    f = farthest_first_init(vecs, k=2).collect()
    assert f[0].vec_id == "a" and len(f) == 2  # smallest-id seed


def test_bm25_prf_surfaces_vocabulary_mismatch_docs(spark):
    """PRF's reason to exist: a doc sharing NO query term but sharing
    the feedback docs' vocabulary appears in the expanded ranking."""
    from epicsarchiver_spark.operators.text_ops import bm25_prf, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta"),
            (2, "alpha beta"),
            (3, "beta beta gamma"),  # no 'alpha' — only expansion finds it
            (4, "delta delta"),
        ],
        "doc_id long, text string",
    )
    plain = {r.doc_id for r in bm25_topk(docs, ["alpha"], k=10).collect()}
    assert 3 not in plain
    prf = bm25_prf(docs, ["alpha"], k=10, fb_docs=2, fb_terms=1).collect()
    ids = {r.doc_id for r in prf}
    assert 3 in ids and 4 not in ids
    # expansion term was 'beta' (never the original 'alpha'): doc 3
    # matches exactly one term of the expanded query
    assert next(r.n_terms_matched for r in prf if r.doc_id == 3) == 1


def test_bm25_prf_no_feedback_hits_falls_back_to_plain(spark):
    from epicsarchiver_spark.operators.text_ops import bm25_prf

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    out = bm25_prf(docs, ["zzz"], k=5, fb_docs=2, fb_terms=2).collect()
    assert out == []  # no round-1 hits → plain (empty) ranking, no crash


def test_retrieval_eval_perfect_ranking(spark):
    from epicsarchiver_spark.operators.text_ops import retrieval_eval

    ranked = spark.createDataFrame([(i, i) for i in range(1, 6)], "doc_id long, rank long")
    rel = spark.createDataFrame([(i, 1) for i in range(1, 6)], "doc_id long, gain long")
    r = retrieval_eval(ranked, rel, k=5).head()
    assert (r.n_relevant_at_k, r.precision_at_k, r.mrr, r.ndcg_at_k) == (5, 1.0, 1.0, 1.0)


def test_retrieval_eval_single_hit_at_rank_3(spark):
    from epicsarchiver_spark.operators.text_ops import dcg_discounts, retrieval_eval

    ranked = spark.createDataFrame([(i, i) for i in range(1, 6)], "doc_id long, rank long")
    rel = spark.createDataFrame([(3, 1)], "doc_id long, gain long")
    r = retrieval_eval(ranked, rel, k=5).head()
    d = dcg_discounts(5)
    assert r.n_relevant_at_k == 1
    assert r.precision_at_k == 0.2
    assert r.mrr == round(1 / 3, 6)
    assert r.ndcg_at_k == round(d[2] / d[0], 6)  # hit at rank 3, ideal at rank 1


def test_retrieval_eval_no_relevant_is_all_zero(spark):
    from epicsarchiver_spark.operators.text_ops import retrieval_eval

    ranked = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    rel = spark.createDataFrame([], "doc_id long, gain long")
    r = retrieval_eval(ranked, rel, k=2).head()
    assert (r.n_relevant_at_k, r.precision_at_k, r.mrr, r.ndcg_at_k) == (0, 0.0, 0.0, 0.0)


def test_retrieval_eval_graded_gains_ideal_order(spark):
    """Graded relevance: a gain-3 doc ranked below a gain-1 doc costs
    nDCG exactly the discount swap — checked against the closed form."""
    from epicsarchiver_spark.operators.text_ops import dcg_discounts, retrieval_eval

    ranked = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    rel = spark.createDataFrame([(1, 1), (2, 3)], "doc_id long, gain long")
    r = retrieval_eval(ranked, rel, k=2).head()
    d = dcg_discounts(2)
    dcg = 1 * d[0] + 3 * d[1]
    idcg = 3 * d[0] + 1 * d[1]
    assert r.ndcg_at_k == round(dcg / idcg, 6)
    assert r.mrr == 1.0  # first relevant is rank 1


def test_ivfpq_rerank_pushes_candidate_in_filter_to_scan(spark):
    """Stage 2's 100 TB shape: the bounded candidate list reaches the
    vector parquet scan as a pushed In(vec_id, ...) filter — the re-read
    touches candidate rows, never the corpus."""
    from epicsarchiver_spark.plans import explain_str

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    df = ivfpq_topk_rerank(emb, qvec, k=10, n_candidates=20, n_cells=8, n_probe=4)
    plan = explain_str(df)
    assert re.search(r"PushedFilters: \[In\(vec_id", plan), plan[:1500]


def test_sq8_rerank_pushes_candidate_in_filter_to_scan(spark):
    """The SQ8 lane's stage 2 has the same 100 TB shape as ivfpq's: the
    bounded nominee list reaches the vector parquet scan as a pushed
    In(vec_id, ...) filter."""
    from epicsarchiver_spark.operators.similarity import sq8_topk_rerank
    from epicsarchiver_spark.plans import explain_str

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    df = sq8_topk_rerank(emb, qvec, k=10, n_candidates=20)
    plan = explain_str(df)
    assert re.search(r"PushedFilters: \[In\(vec_id", plan), plan[:1500]


def test_farthest_first_covers_clusters(spark):
    """Three well-separated clusters, k=3 → one seed per cluster."""
    from epicsarchiver_spark.operators.similarity import farthest_first_init

    rows = []
    for i, center in enumerate([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]):
        for j in range(4):
            rows.append((i * 10 + j, [center[0] + j * 0.01, center[1]]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    picks = farthest_first_init(vecs, k=3).collect()
    clusters = {r.vec_id // 10 for r in picks}
    assert clusters == {0, 1, 2}
    assert picks[0].vec_id == 0 and picks[0].dist == 0.0  # smallest id starts


def test_farthest_first_distances_non_increasing(spark):
    """Each new seed can only shrink min-distances, so successive pick
    distances are non-increasing."""
    from epicsarchiver_spark.operators.similarity import farthest_first_init
    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    picks = farthest_first_init(emb, k=6).orderBy("step").collect()
    ds = [r.dist for r in picks[1:]]
    assert all(a >= b for a, b in zip(ds, ds[1:]))
    assert len({r.vec_id for r in picks}) == 6  # no repeats


def test_farthest_first_k_truncates(spark):
    from epicsarchiver_spark.operators.similarity import farthest_first_init

    vecs = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert farthest_first_init(vecs, k=9).count() == 2


def test_retrieval_eval_rejects_float_gains(spark):
    import pytest

    from epicsarchiver_spark.operators.text_ops import retrieval_eval

    ranked = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
    rel = spark.createDataFrame([(1, 0.5)], "doc_id long, gain double")
    with pytest.raises(ValueError, match="integral"):
        retrieval_eval(ranked, rel, k=1)


def test_qld_matched_beats_unmatched_and_length_normalizes(spark):
    from epicsarchiver_spark.operators.text_ops import qld_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),  # matches, dl 3
            (2, "delta epsilon zeta"),  # no match, dl 3
            (3, "delta epsilon"),  # no match, dl 2 (shorter)
            (4, "alpha alpha beta"),  # matches twice, dl 3
        ],
        "doc_id long, text string",
    )
    out = qld_topk(docs, ["alpha"], k=4).collect()
    scores = {r.doc_id: r.score for r in out}
    ranks = {r.doc_id: r.rank for r in out}
    assert ranks[4] == 1  # tf=2 tops tf=1
    assert scores[4] > scores[1] > scores[2]
    # LM length normalization: among non-matching docs the SHORTER one
    # scores higher (less unmatched mass) — behavior BM25 cannot express
    assert scores[3] > scores[2]
    assert {r.doc_id: r.n_terms_matched for r in out} == {1: 1, 4: 1, 2: 0, 3: 0}


def test_qld_matches_python_mirror(spark):
    import math

    from epicsarchiver_spark.operators.text_ops import qld_topk

    corpus = {1: "a b a c", 2: "b b d", 3: "c c c a", 4: "e"}
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    terms, mu = ["a", "b", "zzz"], 2000.0
    toks = {i: t.split() for i, t in corpus.items()}
    tt = sum(len(v) for v in toks.values())
    cf = {
        t: sum(v.count(t) for v in toks.values())
        for t in terms
        if any(t in v for v in toks.values())
    }
    csum = sum(math.log(mu * c / tt) for c in cf.values())
    exp = {}
    for i, v in toks.items():
        corr = sum(
            math.log(1.0 + v.count(t) / (mu * c / tt)) for t, c in cf.items() if t in v
        )
        exp[i] = round(csum + corr - len(cf) * math.log(len(v) + mu), 6)
    got = {r.doc_id: r.score for r in qld_topk(docs, terms, k=10).collect()}
    assert got == exp


def test_bm25_multi_equals_per_query_bm25(spark):
    """The contract: every standing query's ranking is row-identical to
    bm25_topk run alone — sharing the pass changes nothing."""
    from epicsarchiver_spark.operators.text_ops import bm25_multi, bm25_topk

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    queries = {"a": ["spark", "join"], "b": ["table", "scan", "spark"], "g": ["zzz"]}
    multi = bm25_multi(docs, queries, k=8).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r.query, []).append(
            (r.rank, r.doc_id, r.n_terms_matched, r.score)
        )
    for qname, terms in queries.items():
        want = [
            (r.rank, r.doc_id, r.n_terms_matched, r.score)
            for r in bm25_topk(docs, terms, k=8).collect()
        ]
        assert sorted(by_q.get(qname, [])) == sorted(want), qname
    assert "g" not in by_q  # absent-term query returns no rows


def test_bm25_multi_plans_window_group_limit(spark):
    """The per-query top-k must compile to WindowGroupLimit — a map-side
    per-group cut before the shuffle, not a full sort."""
    from epicsarchiver_spark.operators.text_ops import bm25_multi
    from epicsarchiver_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = explain_str(bm25_multi(docs, {"a": ["spark"], "b": ["join"]}, k=5))
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_snippet_window_picks_densest_earliest(spark):
    from epicsarchiver_spark.operators.text_ops import snippet_window

    docs = spark.createDataFrame(
        [
            # two 'spark' far apart, then a dense 'spark join' cluster:
            # the width-3 window must anchor on the cluster
            (1, "spark x x x x x x spark join y"),
            (2, "nothing here at all"),
            (3, "join z join"),  # two equal-count windows → earliest
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in snippet_window(docs, ["spark", "join"], width=3).collect()}
    assert got[1].n_matched == 2 and got[1].snippet == "spark join y"
    assert got[2].n_matched == 0 and got[2].start is None and got[2].snippet is None
    assert got[3].n_matched == 2 and got[3].start == 1 and got[3].snippet == "join z join"
    assert len(got) == 3  # full spine


def test_snippet_window_is_shuffle_free(spark):
    from epicsarchiver_spark.operators.text_ops import snippet_window
    from epicsarchiver_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = explain_str(snippet_window(docs, ["spark"], width=5))
    assert "Exchange" not in plan, plan[:1200]


def test_snippet_window_survives_empty_and_null_docs(spark):
    """r9 ADVICE: tokens('') is [], so an unguarded sequence(1, 0)
    descends to [1, 0] and element_at throws INVALID_ARRAY_INDEX —
    empty / whitespace / NULL text must yield n_matched=0 rows."""
    from epicsarchiver_spark.operators.text_ops import snippet_window

    docs = spark.createDataFrame(
        [(1, "spark join here"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in snippet_window(docs, ["spark"], width=3).collect()}
    assert len(got) == 4  # full spine survives
    assert got[1].n_matched == 1
    for d in (2, 3, 4):
        assert got[d].n_matched == 0 and got[d].snippet is None


def test_related_terms_finds_window_neighbors(spark):
    from epicsarchiver_spark.operators.text_ops import related_terms

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle spark shuffle far1 far2 far3 far4 far5 nothere"),
            (2, "shuffle spark again"),
            (3, "unrelated text block entirely nothere nothere nothere"),
        ],
        "doc_id long, text string",
    )
    got = {r.term: r for r in related_terms(docs, "spark", window=1, k=10, min_count=2).collect()}
    # 'shuffle' hugs every 'spark'; 'nothere' never appears near one
    assert "shuffle" in got and "nothere" not in got
    r = got["shuffle"]
    # window=1 around three spark occurrences in doc1 (+1 in doc2):
    # doc1 pos2 sees shuffle@2? positions: spark@1,3 → windows [1..2],[2..4]
    # count shuffle: pos2 (twice — overlap double-counts) + pos4 once;
    # doc2 spark@2 → window [1..3] → shuffle@1 once. total 4
    assert r.n_cooc == 4
    assert r.pmi > 0  # over-represented vs corpus rate


def test_related_terms_survives_empty_and_null_docs(spark):
    """r9 ADVICE: one empty/whitespace/NULL doc anywhere in the corpus
    must not kill the whole scan (same descending-sequence crash as
    snippet_window, but corpus-wide)."""
    from epicsarchiver_spark.operators.text_ops import related_terms

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle spark shuffle"),
            (2, ""),
            (3, "   "),
            (4, None),
            (5, "shuffle spark again"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.term: r
        for r in related_terms(docs, "spark", window=1, k=10, min_count=2).collect()
    }
    assert "shuffle" in got and got["shuffle"].n_cooc >= 2


def test_standardize_embeddings_moments(spark):
    """Standardized components have ~zero mean and unit variance per
    dim; a constant dimension maps to exactly 0."""
    import numpy as np

    from epicsarchiver_spark.operators.similarity import standardize_embeddings

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(rng.normal(5.0, 2.0)), float(rng.normal(-1.0, 0.5)), 3.0])
        for i in range(200)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = np.array(
        [r.embedding_std for r in standardize_embeddings(vecs).orderBy("vec_id").collect()]
    )
    assert out.shape == (200, 3)
    assert abs(out[:, 0].mean()) < 1e-3 and abs(out[:, 0].std() - 1.0) < 1e-2
    assert abs(out[:, 1].mean()) < 1e-3 and abs(out[:, 1].std() - 1.0) < 1e-2
    assert (out[:, 2] == 0.0).all()  # constant dim

    # partition order must not move a z-score
    again = np.array(
        [
            r.embedding_std
            for r in standardize_embeddings(vecs.repartition(7))
            .orderBy("vec_id")
            .collect()
        ]
    )
    assert (out == again).all()


def test_keyword_lanes_shared_base_identical_to_inline(spark):
    """r14: the hybrid gate builds ONE query_match_base frame and
    passes it to both keyword rankers (guide §2.4 — two lanes keyed the
    same way share one tokenize pass). Sharing may not change a single
    row of either lane."""
    import pandas as pd

    from epicsarchiver_spark.operators.dedup import private_persist
    from epicsarchiver_spark.operators.text_ops import (
        bm25_topk,
        qld_topk,
        query_match_base,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "alpha beta gamma alpha"),
                (2, "beta beta delta"),
                (3, "gamma gamma gamma epsilon alpha"),
                (4, "zeta eta theta"),
                (5, ""),
            ],
            columns=["doc_id", "text"],
        )
    )
    query = ["Alpha", "gamma", "beta"]
    base = private_persist(query_match_base(docs, query))
    try:
        for fn in (bm25_topk, qld_topk):
            inline = sorted(map(tuple, fn(docs, query, k=5).collect()))
            shared = sorted(map(tuple, fn(docs, query, k=5, base=base).collect()))
            assert inline == shared, fn.__name__
    finally:
        base.unpersist()
