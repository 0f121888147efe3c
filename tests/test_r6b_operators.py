"""Edge/property tests for the round-6b operators — the cases the
sf-table oracle parity can't hit: degenerate cells, zero budgets,
explicit mixture weights, sub-n documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epicsarchiver_spark.operators.curation import pipeline_funnel, pipeline_verdicts
from epicsarchiver_spark.operators.similarity import prototype_scores, semantic_dedup
from epicsarchiver_spark.operators.text_ops import (
    budget_selection,
    mixture_plan,
    ngram_diversity,
    oov_rates,
    tokenizer_fertility,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_identical_vectors_drop_to_min_id(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    df = _vecs(spark, [(1, v), (2, v), (3, v), (10, w)])
    out = semantic_dedup(df, threshold=0.99, n_cells=2, dim=4).collect()
    # 2 and 3 drop against keeper 1; 10 is alone in its neighborhood
    got = {(r.vec_id, r.keep_id, r.n_dups) for r in out}
    assert got == {(2, 1, 1), (3, 1, 2)}
    assert all(abs(r.max_cosine - 1.0) < 1e-9 for r in out)


def test_semantic_dedup_zero_vector_is_guarded(spark):
    df = _vecs(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0])])
    # must not raise on the zero-norm vector (norm clamped to 1)
    rows = semantic_dedup(df, threshold=0.5, n_cells=1, dim=2).collect()
    assert all(r.vec_id != 1 or r.max_cosine <= 0.5 for r in rows)


def test_semantic_dedup_blocked_gemm_matches_unblocked(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = _vecs(spark, rows)
    a = sorted(
        (r.vec_id, r.keep_id, r.n_dups)
        for r in semantic_dedup(df, threshold=0.6, n_cells=2, dim=8, block=7).collect()
    )
    b = sorted(
        (r.vec_id, r.keep_id, r.n_dups)
        for r in semantic_dedup(df, threshold=0.6, n_cells=2, dim=8, block=4096).collect()
    )
    assert a == b and a  # nonempty at this threshold/dim


def test_prototype_scores_drop_frac_zero_and_one(spark):
    rows = [(i, [float(i % 3), float(i % 5), 1.0, 0.0]) for i in range(20)]
    df = _vecs(spark, rows)
    none = prototype_scores(df, drop_frac=0.0, n_cells=2, dim=4)
    assert none.filter(F.col("dropped")).count() == 0
    allof = prototype_scores(df, drop_frac=1.0, n_cells=2, dim=4)
    assert allof.filter(~F.col("dropped")).count() == 0
    assert allof.count() == 20


def test_mixture_plan_explicit_weights_normalized(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b", "s2"), (3, "a", "s2")],
        "doc_id long, text string, source string",
    )
    out = {
        r.source: r
        for r in mixture_plan(df, target_weights={"s1": 3.0, "s2": 1.0}).collect()
    }
    assert out["s1"].target_share == pytest.approx(0.75)
    assert out["s2"].target_share == pytest.approx(0.25)
    assert out["s1"].n_tokens == 3 and out["s2"].n_tokens == 3
    assert out["s1"].mix_weight == pytest.approx(0.75 / 0.5)
    # a source absent from the weights map gets target 0
    out2 = {
        r.source: r for r in mixture_plan(df, target_weights={"s1": 1.0}).collect()
    }
    assert out2["s2"].target_share == 0.0 and out2["s2"].mix_weight == 0.0


def test_ngram_diversity_handles_sub_n_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two", "s"), (2, "one", "s"), (3, "", "s")],
        "doc_id long, text string, source string",
    )
    rows = {r.n: r for r in ngram_diversity(df, max_n=3).collect()}
    assert rows[1].total_grams == 3 and rows[1].distinct_grams == 2
    assert rows[2].total_grams == 1  # only doc 1 has a bigram
    assert 3 not in rows  # nobody has 3 tokens


def test_oov_rates_top_vocab_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a a a b", None), (2, "a zz", None), (3, "", None)],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in oov_rates(df, vocab_k=2).collect()}
    # vocab = {a, b} (b beats zz on the term tie-break at equal count? no:
    # counts a=4, b=1, zz=1 — tie broken lexicographically: b)
    assert out[1].n_oov == 0
    assert out[2].n_oov == 1 and out[2].oov_rate == pytest.approx(0.5)
    assert 3 not in out  # zero-token doc filtered


def test_budget_selection_edges(spark):
    df = spark.createDataFrame(
        [(i, "w " * 10, "s") for i in range(6)],
        "doc_id long, text string, source string",
    )
    zero = budget_selection(df, token_budget=0)
    assert zero.filter(F.col("selected")).count() == 0
    everything = budget_selection(df, token_budget=10**9)
    assert everything.filter(~F.col("selected")).count() == 0
    # budget for exactly two docs of 10 tokens
    two = budget_selection(df, token_budget=20)
    assert two.filter(F.col("selected")).count() == 2


def test_tokenizer_fertility_weighting(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "don't stop", "en")],
        "doc_id long, text string, lang string",
    )
    r = tokenizer_fertility(df).collect()[0]
    assert r.n_words == 4
    assert r.fertility == pytest.approx(r.n_bpe_tokens / 4.0)


def test_pipeline_funnel_shares_sum_to_one(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    v = pipeline_verdicts(docs)
    f = pipeline_funnel(v).collect()
    assert abs(sum(r.share for r in f) - 1.0) < 1e-4
    assert sum(r.n_docs for r in f) == docs.count()
    stages = {r.stage for r in f}
    assert "kept" in stages and "benchmark" in stages


def test_prototype_scores_zero_vector_ansi_guard(spark):
    df = _vecs(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])])
    rows = {r.vec_id: r for r in prototype_scores(df, n_cells=1, dim=2).collect()}
    assert rows[1].proto_cosine == 0.0  # zero vector scores 0, no stage kill


def test_tokenizer_fertility_empty_lang_ansi_guard(spark):
    df = spark.createDataFrame(
        [(1, "", "xx"), (2, "a b", "en")], "doc_id long, text string, lang string"
    )
    out = {r.lang: r for r in tokenizer_fertility(df).collect()}
    assert out["xx"].fertility is None and out["xx"].n_words == 0


def test_mixture_plan_zero_token_source_ansi_guard(spark):
    df = spark.createDataFrame(
        [(1, "", "empty"), (2, "a b", "full")], "doc_id long, text string, source string"
    )
    out = {r.source: r for r in mixture_plan(df).collect()}
    assert out["empty"].mix_weight is None and out["empty"].natural_share == 0.0


@pytest.mark.parametrize(
    "lane_kw",
    [
        {},  # default S-curve: 64 hashes × 16 bands
        # second parameterization (VERDICT r6 task 6): steeper curve +
        # different seed — the agreement property must hold at any
        # banding, not just the default
        {"num_hashes": 128, "bands": 32, "seed": 7},
    ],
)
def test_pipeline_verdicts_minhash_lane_runs_and_agrees_on_non_neardup_stages(
    spark, lane_kw
):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    j = {r.doc_id: r.stage for r in pipeline_verdicts(docs).collect()}
    m = {
        r.doc_id: r.stage
        for r in pipeline_verdicts(
            docs, near_dup="minhash", near_dup_kw=lane_kw
        ).collect()
    }
    assert set(j) == set(m)
    # stages other than the near-dup/contamination boundary are identical;
    # near_dup membership may differ (banded recall), but only between
    # the near_dup / contaminated / kept verdicts
    for i in j:
        if j[i] != m[i]:
            assert {j[i], m[i]} <= {"near_dup", "contaminated", "kept"}, (i, j[i], m[i])
    with pytest.raises(ValueError):
        pipeline_verdicts(docs, near_dup="bogus")


def test_corpus_diff_counts(spark):
    from epicsarchiver_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha", "s1"), (2, "beta", "s1"), (3, "gone entirely", "s2")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(10, "alpha", "s1"), (11, "fresh", "s1"), (12, "alpha", "s1")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in corpus_diff(old, new).collect()}
    # s1: 'alpha' carried (twice in new = one distinct fp), 'beta' removed,
    # 'fresh' added; s2 vanished entirely
    assert (out["s1"].n_added, out["s1"].n_removed, out["s1"].n_unchanged) == (1, 1, 1)
    assert (out["s2"].n_added, out["s2"].n_removed, out["s2"].n_unchanged) == (0, 1, 0)
