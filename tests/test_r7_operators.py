"""Edge/property tests for the round-7 operators — the cases the
sf-table oracle parity can't hit: degenerate vocabularies, unpunctuated
or empty text, conversion-free logs, single-event sessions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epicsarchiver_spark.operators.events import (
    last_touch_attribution,
    session_stats,
)
from epicsarchiver_spark.operators.text_ops import hapax_zipf, readability


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hapax_zipf_single_term_source_has_null_slope(spark):
    """A source whose vocabulary is one term has zero x-variance in the
    rank fit — slope must be null, never a DIVIDE_BY_ZERO failure."""
    df = _docs(spark, [(1, "same same same", "mono"), (2, "a b b c c c", "tri")])
    out = {r.source: r for r in hapax_zipf(df).collect()}
    assert out["mono"].n_terms == 1
    assert out["mono"].zipf_slope is None
    assert out["tri"].n_terms == 3
    # c:3 rank1, b:2 rank2, a:1 rank3 — strictly decreasing → negative slope
    assert out["tri"].zipf_slope < 0
    assert out["tri"].hapax_share == pytest.approx(1 / 3, abs=1e-6)


def test_readability_edge_docs(spark):
    df = _docs(
        spark,
        [
            (1, "", "s"),                                # no words → null flesch
            (2, "xyz pqr", "s"),                         # one y-group, no punct
            (3, "The cat sat. The dog ran! Done?", "s"),  # 3 sentences
        ],
    ).drop("source")
    out = {r.doc_id: r for r in readability(df).collect()}
    assert out[1].n_words == 0 and out[1].flesch is None
    assert out[1].n_sentences == 1  # floored, never 0
    # [aeiouy]+ counts "y" in "xyz"; "pqr" has none
    assert out[2].n_syllables == 1 and out[2].n_sentences == 1
    assert out[3].n_sentences == 3 and out[3].n_words == 7
    assert out[2].flesch is not None


def test_readability_y_vowel_groups(spark):
    df = spark.createDataFrame([(1, "rhythm fly")], "doc_id long, text string")
    r = readability(df).collect()[0]
    # rhythm: "y" → 1 group; fly: "y" → 1 group
    assert r.n_syllables == 2


def test_last_touch_attribution_direct_and_ordering(spark):
    rows = [
        # user 1: view → purchase (credit view), then purchase right after
        # the first purchase (credit purchase)
        (1, 1, 10.0, "view", 5.0),
        (2, 1, 20.0, "purchase", 7.5),
        (3, 1, 30.0, "purchase", 2.5),
        # user 2: purchase with no prior → (direct)
        (4, 2, 10.0, "purchase", 1.0),
        # user 3: no purchases at all
        (5, 3, 10.0, "click", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts double, event_type string, value double"
    )
    out = {r.touch: r for r in last_touch_attribution(df).collect()}
    assert out["view"].n_conversions == 1 and out["view"].converted_value == 7.5
    assert out["purchase"].n_conversions == 1 and out["purchase"].converted_value == 2.5
    assert out["(direct)"].n_conversions == 1
    assert set(out) == {"view", "purchase", "(direct)"}


def test_session_stats_gap_splits_and_bounce(spark):
    rows = [
        # user 1: two events 10 s apart (one session), then one 2h later
        (1, 1, 0.0), (2, 1, 10.0), (3, 1, 7200.0),
        # user 2: single event → bounce
        (4, 2, 100.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts double"
    ).withColumn("event_type", F.lit("click")).withColumn("value", F.lit(0.0))
    r = session_stats(df, gap_s=1800.0).collect()[0]
    assert r.n_sessions == 3
    assert r.bounce_share == pytest.approx(2 / 3, abs=1e-6)
    # durations: 10, 0, 0 → p50 = 0
    assert r.p50_duration_s == 0.0
    assert r.mean_events == pytest.approx(4 / 3, abs=1e-6)


def test_kmeans_refine_zero_vector_and_ties(spark):
    from epicsarchiver_spark.operators.similarity import kmeans_refine

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),  # zero vector: cosine 0 to every centroid
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in kmeans_refine(df, n_cells=2, dim=4).collect()}
    assert len(out) == 4  # every vector assigned exactly once
    # the two near-parallel vectors end in the same refined cell
    assert out[1].cell == out[2].cell
    assert out[4].cosine == 0.0
    # zero vector ties on every centroid → smallest cell id wins
    assert out[4].cell == min(r.cell for r in out.values())


def test_kmeans_refine_iterates_via_centroids(spark):
    """Feeding the refined means back through centroids= must be
    accepted and keep every vector assigned (the Lloyd loop contract)."""
    from epicsarchiver_spark.operators.similarity import kmeans_refine

    df = spark.createDataFrame(
        [(i, [float(i % 3), float((i * 7) % 5), 1.0, 0.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    first = kmeans_refine(df, n_cells=3, dim=4)
    # recover the iteration's means per refined cell, feed them back
    means = (
        first.join(df, "vec_id")
        .select("cell", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("ax"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ax"))),
                lambda s: F.round(s["ax"], 6),
            ).alias("c")
        )
        .orderBy("cell")
        .collect()
    )
    second = kmeans_refine(df, centroids=[list(r.c) for r in means])
    assert second.count() == 12


def test_dau_anomalies_spike_flags_and_warmup_does_not(spark):
    from epicsarchiver_spark.operators.events import dau_anomalies

    rows = []
    eid = 0
    # 10 steady days of 4 users, then a 12-user spike day
    for day in range(10):
        for u in range(4):
            eid += 1
            rows.append((eid, float(day * 86400 + 10), u))
    for u in range(12):
        eid += 1
        rows.append((eid, float(10 * 86400 + 10), u))
    df = spark.createDataFrame(
        rows, "event_id long, ts double, user_id long"
    ).withColumn("event_type", F.lit("click")).withColumn("value", F.lit(0.0))
    out = {r.day: r for r in dau_anomalies(df, threshold=0.25).collect()}
    # warm-up days (< 7 prior days) never flag and carry null baseline
    for day in range(7):
        assert out[day].trailing_med is None and out[day].is_anomaly is False
    assert out[8].is_anomaly is False  # steady day vs median 4
    spike = out[10]
    assert spike.trailing_med == 4.0 and spike.dau == 12
    assert spike.is_anomaly is True and spike.rel_dev == 2.0


def test_split_leakage_counts_only_straddling_pairs(spark):
    from epicsarchiver_spark.operators.curation import split_leakage
    from epicsarchiver_spark.operators.text_ops import assign_splits

    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    splits = {r.doc_id: r.split for r in assign_splits(docs).collect()}
    # build pairs with known split memberships
    ids_by_split: dict = {}
    for i, s in splits.items():
        ids_by_split.setdefault(s, []).append(i)
    tr = sorted(ids_by_split["train"])
    te = sorted(ids_by_split.get("test", []))
    pairs = [(tr[0], tr[1]), (tr[2], tr[3])]  # same-split: excluded
    pairs += [(tr[0], te[0]), (tr[1], te[0])]  # train<->test: counted
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = {(r.split_a, r.split_b): r.n_pairs for r in split_leakage(docs, pdf).collect()}
    assert out == {("test", "train"): 2}

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert split_leakage(docs, empty).count() == 0


@pytest.mark.parametrize("descending", [False, True])
def test_bounded_exclusive_prefix_exact(spark, descending):
    """The coarse-bucket two-level cumsum is EXACT: equals the
    driver-computed exclusive prefix for keys spanning negative values,
    bucket boundaries, and sub-bucket clusters."""
    import random

    from epicsarchiver_spark.operators.text_ops import _bounded_exclusive_prefix

    rng = random.Random(7)
    keys = sorted({round(rng.uniform(-3, 3), 4) for _ in range(300)})
    rows = [(k, rng.randint(1, 9)) for k in keys]
    df = spark.createDataFrame(rows, "k double, v long")
    got = {
        r.k: r.base
        for r in _bounded_exclusive_prefix(
            df, "k", "v", "base", descending=descending
        ).collect()
    }
    ordered = sorted(rows, key=lambda t: t[0], reverse=descending)
    acc = 0
    for k, v in ordered:
        assert got[k] == acc, (k, got[k], acc)
        acc += v


def test_component_splits_never_straddle(spark):
    """The constructive guarantee: splits keyed on the component root
    put every member of a near-dup group in the SAME split, so the
    leakage audit over those pairs is empty by construction — while
    plain id-hash splits on the same graph do straddle."""
    from epicsarchiver_spark.operators.curation import component_splits, split_leakage
    from epicsarchiver_spark.operators.text_ops import assign_splits

    # a 60-vertex graph of 20 chained triples (i, i+1), (i+1, i+2)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 60, 3)]
        + [(i + 1, i + 2) for i in range(0, 60, 3)],
        "id_a long, id_b long",
    )
    docs = spark.range(70).select(F.col("id").alias("doc_id"))
    from epicsarchiver_spark.operators.dedup import connected_components

    comp = connected_components(pairs)
    sp = component_splits(docs, comp)
    rows = {r.doc_id: r for r in sp.collect()}
    assert len(rows) == 70
    # every triple shares root and split; singleton docs root to themselves
    for i in range(0, 60, 3):
        assert rows[i].root == rows[i + 1].root == rows[i + 2].root == i
        assert rows[i].split == rows[i + 1].split == rows[i + 2].split
    assert rows[65].root == 65
    # audit over the same pairs: zero straddling rows by construction
    splits_by_root = sp.select("doc_id", "split")
    sa = splits_by_root.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "split", "_sa"
    )
    sb = splits_by_root.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "split", "_sb"
    )
    straddle = pairs.join(sa, "id_a").join(sb, "id_b").filter(F.col("_sa") != F.col("_sb"))
    assert straddle.count() == 0


def test_quality_survivors_chain_and_quality_pick(spark):
    """Cosine chains (A~B~C, A≁C) must resolve into ONE group, and the
    survivor is the argmax-quality member (ties → smallest id), not
    SemDeDup's lowest-id keep pointer."""
    from epicsarchiver_spark.operators.curation import quality_survivors

    # three near-parallel vectors forming a chain + one orthogonal
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.45, 0.0, 0.0]),   # ~0: cos .894; ~2: cos .894
            (2, [0.45, 0.9, 0.0, 0.0]),   # ~0: cos .447 < threshold
            (3, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    # doc 2 is the richest text → highest quality_prob must win its group
    docs = spark.createDataFrame(
        [
            (0, "short text"),
            (1, "short text too"),
            (2, "the quiet river and the old stone bridges of the town "
                "carry traders to the market square in the morning light."),
            (3, "another doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in quality_survivors(
            docs, vecs, threshold=0.8, n_cells=1, dim=4
        ).collect()
    }
    assert len(out) == 4
    # 0,1,2 chain into one group rooted at 0; 3 is a singleton
    assert out[0].group_root == out[1].group_root == out[2].group_root == 0
    assert out[3].group_root == 3 and out[3].kept
    best = max((out[i].quality_prob, -i) for i in (0, 1, 2))
    winner = -best[1]
    for i in (0, 1, 2):
        assert out[i].survivor_id == winner
        assert out[i].kept == (i == winner)


def test_funnel_times_latency_and_empty_step(spark):
    """Latency rows measure t_i - t_{i-1} over converters only; a step
    nobody reaches still emits its row with nulls (absent evidence),
    and out-of-order users do not convert."""
    from epicsarchiver_spark.operators.events import funnel_times

    rows = [
        # u1 converts view@10 -> click@40 -> buy@100
        (1, 10.0, "view"), (1, 40.0, "click"), (1, 100.0, "buy"),
        # u2 converts view@0 -> click@10; never buys
        (2, 0.0, "view"), (2, 10.0, "click"),
        # u3 clicked BEFORE viewing: no conversion past step 0
        (3, 5.0, "click"), (3, 6.0, "view"),
    ]
    ev = spark.createDataFrame(
        [(u, t, et) for u, t, et in rows], "user_id long, ts double, event_type string"
    )
    out = {r.step_name: r for r in funnel_times(ev, ("view", "click", "buy")).collect()}
    assert out["click"].n_converted == 2
    assert out["click"].p50_s == 20.0  # median of {30, 10}
    assert out["click"].mean_s == 20.0
    assert out["buy"].n_converted == 1 and out["buy"].p50_s == 60.0

    # nobody reaches 'signup': the row exists, stats are null
    out2 = {r.step_name: r for r in funnel_times(ev, ("view", "signup")).collect()}
    assert out2["signup"].n_converted == 0
    assert out2["signup"].p50_s is None and out2["signup"].mean_s is None


def test_bigram_lm_external_model_scores_unseen_text(spark):
    """The persisted-LM lane (CCNet production cadence): scoring a crawl
    against a REFERENCE model keeps scores finite on out-of-vocabulary
    text, ranks in-distribution text more fluent, and the read-back
    path reproduces the self-trained scores bit-for-bit on the training
    corpus itself."""
    from epicsarchiver_spark.operators.text_ops import (
        bigram_logprob,
        read_bigram_lm,
        train_bigram_lm,
        write_bigram_lm,
    )
    import tempfile

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(5)],
        "doc_id long, text string",
    )
    # self-trained vs persisted round-trip on the same corpus: identical
    with tempfile.TemporaryDirectory() as tmp:
        write_bigram_lm(ref, tmp)
        self_scores = {r.doc_id: r.mean_neg_logprob for r in bigram_logprob(ref).collect()}
        lm_scores = {
            r.doc_id: r.mean_neg_logprob
            for r in bigram_logprob(ref, model=tmp).collect()
        }
        assert lm_scores == self_scores

        crawl = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),          # in-distribution
                (2, "zxqv wploc frumious bandersnatch"),  # fully OOV
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r.mean_neg_logprob
            for r in bigram_logprob(crawl, model=tmp).collect()
        }
    import math

    assert all(math.isfinite(v) for v in out.values())
    assert out[2] > out[1]  # gibberish scores less fluent


def test_funnel_times_single_step_is_empty(spark):
    from epicsarchiver_spark.operators.events import funnel_times

    ev = spark.createDataFrame(
        [(1, 1.0, "view")], "user_id long, ts double, event_type string"
    )
    out = funnel_times(ev, ("view",))
    assert out.count() == 0
    assert out.columns == ["step", "step_name", "n_converted", "p50_s", "p90_s", "mean_s"]


def test_min_cost_supplier_keeps_all_tied_minima(spark):
    """rank()==1 must keep EVERY supplier achieving the part's min cost
    (Q2's correlated-subquery semantics), and exclude parts outside the
    size/type filter and suppliers outside the region."""
    from epicsarchiver_spark.operators.relational import min_cost_supplier

    lineitem = spark.createDataFrame(
        [
            # part 1: suppliers 1 and 2 tie at unit cost 10.0, supplier 3 higher
            (1, 1, 1, 2.0, 20.0),
            (2, 1, 1, 4.0, 44.0),   # same supplier, worse row → min still 10
            (3, 1, 2, 5.0, 50.0),
            (4, 1, 3, 1.0, 30.0),
            # part 2: STANDARD but size 40 → filtered out by max_size
            (5, 2, 1, 1.0, 5.0),
            # part 3: min held by out-of-region supplier 9 → regional rank
            # is computed over regional suppliers only, so supplier 1 wins
            (6, 3, 9, 1.0, 1.0),
            (7, 3, 1, 1.0, 7.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double",
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 0, 100.0), (2, "S2", 0, 200.0), (3, "S3", 0, 300.0),
         (9, "S9", 1, 900.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 3), (1, "NATION_1", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(3, "EUROPE"), (0, "AFRICA")], "r_regionkey int, r_name string"
    )
    part = spark.createDataFrame(
        [(1, "p one", "STANDARD", 10), (2, "p two", "STANDARD", 40),
         (3, "p three", "STANDARD", 5)],
        "p_partkey long, p_name string, p_type string, p_size int",
    )
    rows = min_cost_supplier(lineitem, supplier, nation, region, part).collect()
    got = {(r.p_partkey, r.s_name) for r in rows}
    assert got == {(1, "S1"), (1, "S2"), (3, "S1")}
    costs = {(r.p_partkey, r.s_name): r.unit_cost for r in rows}
    assert costs[(1, "S1")] == pytest.approx(10.0)
    assert costs[(1, "S2")] == pytest.approx(10.0)
    # ordering: s_acctbal desc
    assert [r.s_name for r in rows] == ["S2", "S1", "S1"]


def test_dominant_suppliers_share_is_strict(spark):
    """Exactly 50% must NOT qualify (strict >); quantities outside the
    date window or on non-matching parts never count."""
    from epicsarchiver_spark.operators.relational import dominant_suppliers

    lineitem = spark.createDataFrame(
        [
            # part 1 in-window: s1 ships 30 of 50 (60% → dominant),
            # s2 ships 20
            (1, 1, 1, 30.0, "1996-03-01"),
            (2, 1, 2, 20.0, "1996-06-01"),
            # part 2: s3 ships exactly half (10 of 20) → NOT dominant
            (3, 2, 3, 10.0, "1996-02-01"),
            (4, 2, 4, 10.0, "1996-02-02"),
            # part 1 out-of-window monster row must not flip the shares
            (5, 1, 2, 500.0, "1995-01-01"),
            # non-matching part: ignored entirely
            (6, 9, 5, 999.0, "1996-05-01"),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    supplier = spark.createDataFrame(
        [(i, f"S{i}", 0, float(i)) for i in (1, 2, 3, 4, 5)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    part = spark.createDataFrame(
        [(1, "red widget"), (2, "red bolt"), (9, "blue gear")],
        "p_partkey long, p_name string",
    )
    rows = dominant_suppliers(lineitem, supplier, nation, part).collect()
    assert [r.s_name for r in rows] == ["S1"]


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


# two orthogonal unit centroids: cell 1 = x-axis, cell 2 = y-axis
_CENTS_2D = [[1.0, 0.0], [0.0, 1.0]]


def test_hard_negatives_ranks_and_cell_fence(spark):
    from epicsarchiver_spark.operators.similarity import hard_negatives

    df = _vecs(
        spark,
        [
            (1, [1.0, 0.0], 0),      # anchor, cell x
            (2, [0.9, 0.1], 1),      # hard negative (closest, diff label)
            (3, [0.5, 0.2], 1),      # softer negative, same cell
            (4, [0.95, 0.05], 0),    # same label → never a negative
            (5, [0.0, 1.0], 1),      # other cell → fenced out
        ],
    )
    out = hard_negatives(df, k=2, centroids=_CENTS_2D).collect()
    mine = sorted(
        [(r.rank, r.neg_id) for r in out if r.vec_id == 1]
    )
    assert mine == [(1, 2), (2, 3)]
    # vec 5 is alone in its cell: no different-label candidate → no rows
    assert not [r for r in out if r.vec_id == 5]
    # same-label vec 4 never appears as a negative for 1
    assert 4 not in {r.neg_id for r in out if r.vec_id == 1}


def test_hard_negatives_no_candidates_when_single_label(spark):
    from epicsarchiver_spark.operators.similarity import hard_negatives

    df = _vecs(spark, [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0)])
    assert hard_negatives(df, k=3, centroids=_CENTS_2D).count() == 0


def test_knn_labels_majority_tie_and_small_cell(spark):
    from epicsarchiver_spark.operators.similarity import knn_labels

    df = _vecs(
        spark,
        [
            # cell x: anchor 1 with 2 neighbors of label 1 and 1 of label 0
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 1),
            (3, [0.8, 0.1], 1),
            (4, [0.7, 0.1], 0),
            # cell y: pair with k=3 but only ONE neighbor available
            (5, [0.0, 1.0], 2),
            (6, [0.1, 0.9], 3),
        ],
    )
    out = {r.vec_id: r for r in knn_labels(df, k=3, centroids=_CENTS_2D).collect()}
    assert out[1].predicted_label == 1 and not out[1].agree
    assert out[1].votes == 2 and out[1].n_neighbors == 3
    # small cell: only one neighbor
    assert out[5].n_neighbors == 1 and out[5].predicted_label == 3
    assert out[6].n_neighbors == 1 and out[6].predicted_label == 2
    # tie case: anchor 4's three neighbors are labels {0, 1, 1}?  no —
    # 4 sees 1(l0), 2(l1), 3(l1) → predicted 1. Build an explicit tie:
    df2 = _vecs(
        spark,
        [
            (10, [1.0, 0.0], 9),
            (11, [0.99, 0.01], 5),
            (12, [0.98, 0.01], 3),
        ],
    )
    out2 = {r.vec_id: r for r in knn_labels(df2, k=2, centroids=_CENTS_2D).collect()}
    # one vote each for labels 5 and 3 → tie breaks to the SMALLER label
    assert out2[10].predicted_label == 3 and out2[10].votes == 1


def test_gram_matrix_partition_invariant_and_exact(spark):
    """The int64 Gram must be bit-identical to a driver-side numpy
    computation and invariant to repartitioning (exact integer sums —
    no summation-order dependence)."""
    import numpy as np
    from epicsarchiver_spark.operators.similarity import gram_matrix

    rng = np.random.RandomState(7)
    X = rng.uniform(-1, 1, size=(40, 3)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    Q = np.sign(X.astype(np.float64)) * np.floor(
        np.abs(X.astype(np.float64)) * 10_000 + 0.5
    )
    Q = Q.astype(np.int64)
    G = Q.T @ Q
    s = Q.sum(axis=0)
    for parts in (1, 7):
        rows = gram_matrix(df.repartition(parts)).collect()
        assert len(rows) == 6  # 3*(3+1)/2
        for r in rows:
            assert r.sum_prod == G[r.pos_i, r.pos_j]
            assert r.sum_i == s[r.pos_i] and r.sum_j == s[r.pos_j]
            assert r.n_vectors == 40


def test_pca_recovers_dominant_axis(spark):
    """Data stretched along a known direction: PC0 must align with it
    (|cos| ≈ 1), projections must match numpy, and the explained
    variance must be ordered."""
    import numpy as np
    from epicsarchiver_spark.operators.similarity import (
        gram_matrix, pca_components, pca_project,
    )

    rng = np.random.RandomState(11)
    axis = np.array([3.0, 4.0, 0.0]) / 5.0
    t = rng.normal(0, 1.0, 200)
    noise = rng.normal(0, 0.05, (200, 3))
    X = np.outer(t, axis) + noise
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    rows = [r.asDict() for r in gram_matrix(df).collect()]
    comps = pca_components(rows, dim=3, n_components=2)
    v0 = np.array(comps[0])
    assert abs(float(v0 @ axis)) > 0.99
    # projection parity vs numpy on the same components
    out = {r.vec_id: r for r in pca_project(df, comps).collect()}
    Xf = np.stack([np.asarray(X[i], dtype=np.float32).astype(np.float64)
                   for i in range(200)])
    expect = Xf @ np.array(comps).T
    for i in (0, 17, 199):
        assert out[i].pc0 == pytest.approx(expect[i, 0], abs=1e-6)
        assert out[i].pc1 == pytest.approx(expect[i, 1], abs=1e-6)
    # sign normalization: largest-|entry| component positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_pagerank_matches_python_mirror_and_centers(spark):
    """The integer recurrence must match a literal python mirror on a
    hand-built weighted path graph, rank the center highest, and be
    partition-invariant (pure integer math — no summation slack)."""
    from epicsarchiver_spark.operators.related import pagerank

    edges = spark.createDataFrame(
        [
            ("A", "B", 1.0),
            ("B", "C", 3.0),
            ("C", "B", 3.0),       # reversed duplicate → canonical max
            ("C", "D", 1.0),
        ],
        "pv1 string, pv2 string, score double",
    )
    scale, rounds, base = 10**9, 4, (15 * 10**9) // 100
    # python mirror of the exact recurrence
    w = {("A", "B"): 1, ("B", "C"): 3, ("C", "D"): 1}
    adj: dict[str, dict[str, int]] = {}
    for (u, v), ww in w.items():
        adj.setdefault(u, {})[v] = ww
        adj.setdefault(v, {})[u] = ww
    wt = {u: sum(nb.values()) for u, nb in adj.items()}
    r = {u: scale for u in adj}
    for _ in range(rounds):
        c = {u: 0 for u in adj}
        for u, nb in adj.items():
            for v, ww in nb.items():
                c[v] += (r[u] * ww) // wt[u]
        r = {u: base + (85 * c[u]) // 100 for u in adj}
    for parts in (1, 5):
        got = {
            row.pvname: row.rank_units
            for row in pagerank(edges.repartition(parts), rounds=rounds).collect()
        }
        assert got == r
    # high-weight middle nodes outrank the leaves
    assert r["B"] > r["A"] and r["C"] > r["D"]


def test_xcorr_lag_finds_known_shift(spark):
    """b is a copy of a delayed by 2 grid steps: the (a, b) scan must
    peak at lag +2 with r == 1 (a LEADS b), and the symmetric (b, a)
    scan at lag -2. A constant partner never produces rows."""
    from epicsarchiver_spark.operators import timeseries

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0]
    rows = [("a", 100.0 + i * 10, v) for i, v in enumerate(vals)]
    rows += [("b", 100.0 + (i + 2) * 10, v) for i, v in enumerate(vals)]
    rows += [("flat", 100.0 + i * 10, 7.0) for i in range(14)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = timeseries.xcorr_lag(
        df, [("a", "b"), ("b", "a"), ("a", "flat")], 100.0, 230.0, 10.0, max_lag=3
    ).collect()
    best = {(r.pv_a, r.pv_b): r for r in out if r.best}
    assert best[("a", "b")].lag == 2 and best[("a", "b")].r == pytest.approx(1.0)
    assert best[("b", "a")].lag == -2 and best[("b", "a")].r == pytest.approx(1.0)
    # zero-variance partner: no rows at any lag
    assert ("a", "flat") not in best
    # every pair exposes one best row exactly
    from collections import Counter
    c = Counter((r.pv_a, r.pv_b) for r in out if r.best)
    assert all(v == 1 for v in c.values())


def test_flatlines_flags_stuck_run_not_wiggle(spark):
    from epicsarchiver_spark.operators import timeseries

    rows = []
    # stuck: 6 identical points over 500 s, then a change
    rows += [("stuck", 100.0 + i * 100, 5.0) for i in range(6)]
    rows += [("stuck", 700.0, 6.0)]
    # wiggle: alternating values — longest run is 1
    rows += [("wiggle", 100.0 + i * 100, float(i % 2)) for i in range(8)]
    # brief: 3 identical points but only 20 s span → fails min_duration
    rows += [("brief", 100.0 + i * 10, 2.0) for i in range(3)]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = {r.pvname: r for r in
           timeseries.flatlines(df, min_points=3, min_duration_s=60.0).collect()}
    assert out["stuck"].stuck and out["stuck"].n_stuck_runs == 1
    assert out["stuck"].longest_run == 6
    assert out["stuck"].longest_run_s == pytest.approx(500.0)
    assert not out["wiggle"].stuck and out["wiggle"].longest_run == 1
    assert not out["brief"].stuck  # long enough in points, too short in time
    assert out["brief"].longest_run == 3


def test_linear_attribution_splits_equally_and_respects_lookback(spark):
    from epicsarchiver_spark.operators.events import linear_attribution

    base = 1_700_000_000.0
    rows = [
        # user 1: view + click inside the window, old_view outside it
        (1, 1, base - 10 * 86400, "view", 0.0, None),     # outside 7d lookback
        (2, 1, base - 3600, "view", 0.0, None),
        (3, 1, base - 60, "click", 0.0, None),
        (4, 1, base, "purchase", 100.0, None),
        # user 2: conversion with no touches → no credit anywhere
        (5, 2, base, "purchase", 50.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts double, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_type: r for r in linear_attribution(df).collect()}
    # 100.00 → 10000 cents → 5e9 micros each for view and click
    assert out["view"].credit == pytest.approx(50.0)
    assert out["click"].credit == pytest.approx(50.0)
    assert out["view"].touches == 1 and out["view"].conversions == 1
    assert "purchase" not in out  # conversions are not their own touches here
    # total credit never exceeds total converted value
    assert sum(r.credit for r in out.values()) <= 150.0


def test_dispersion_identity_matches_brute_force(spark):
    """The sum-vector identity must reproduce the literal mean pairwise
    dot of the quantized vectors; identical vectors → dispersion =
    mean squared norm; a singleton cell reports null."""
    import numpy as np
    from epicsarchiver_spark.operators.similarity import dispersion

    rows = [
        (1, [1.0, 0.0], 0), (2, [0.8, 0.1], 0), (3, [0.6, 0.2], 0),
        (4, [0.0, 1.0], 0),  # alone in the y cell
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.cell: r for r in dispersion(df, centroids=[[1.0, 0.0], [0.0, 1.0]]).collect()}
    xs = [r[1] for r in rows[:3]]
    Q = np.array([[round(c * 100) for c in np.asarray(v, dtype=np.float32).astype(np.float64)] for v in xs])
    dots = [Q[i] @ Q[j] for i in range(3) for j in range(3) if i != j]
    want = sum(dots) / len(dots) / 1e4
    xcell = [c for c, r in out.items() if r.n_vectors == 3][0]
    assert out[xcell].mean_pairwise_dot == pytest.approx(round(want, 6), abs=1e-9)
    ycell = [c for c, r in out.items() if r.n_vectors == 1][0]
    assert out[ycell].mean_pairwise_dot is None
    # identical vectors: mean pairwise dot == mean squared norm
    df2 = spark.createDataFrame(
        [(i, [0.5, 0.5], 0) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    r2 = dispersion(df2, centroids=[[1.0, 0.0], [0.0, 1.0]]).collect()[0]
    assert r2.mean_pairwise_dot == pytest.approx(r2.mean_sq_norm)


def test_grid_pivot_columns_follow_name_order_and_locf(spark):
    from epicsarchiver_spark.operators import timeseries

    rows = [
        ("a", 100.0, 1.0), ("a", 130.0, 2.0),
        ("b", 115.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = {r.t: r for r in
           timeseries.grid_pivot(df, ["a", "b", "absent"], 100.0, 140.0, 10.0).collect()}
    assert set(out) == {100.0, 110.0, 120.0, 130.0, 140.0}
    assert out[100.0].v0 == 1.0 and out[100.0].v1 is None   # b starts later
    assert out[120.0].v0 == 1.0 and out[120.0].v1 == 5.0    # both held
    assert out[130.0].v0 == 2.0 and out[140.0].v0 == 2.0    # step + hold
    assert all(getattr(out[t], "v2") is None for t in out)  # absent PV → nulls


def test_position_attribution_u_shape_and_degenerate_paths(spark):
    """k=1 → 100%; k=2 → 50/50; k>=3 → 40/40 first+last, middles split
    the remaining 20% in floor micro-cents."""
    from epicsarchiver_spark.operators.events import position_attribution

    base = 1_700_000_000.0
    rows = [
        # user 1: view → click → email → purchase(100) — k=3 path
        (1, 1, base - 300, "view", 0.0, None),
        (2, 1, base - 200, "click", 0.0, None),
        (3, 1, base - 100, "email", 0.0, None),
        (4, 1, base, "purchase", 100.0, None),
        # user 2: single touch, 100% to 'ad'
        (5, 2, base - 50, "ad", 0.0, None),
        (6, 2, base, "purchase", 40.0, None),
        # user 3: two touches, 50/50
        (7, 3, base - 80, "sms", 0.0, None),
        (8, 3, base - 40, "push", 0.0, None),
        (9, 3, base, "purchase", 10.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts double, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_type: r.credit for r in position_attribution(df).collect()}
    assert out["view"] == pytest.approx(40.0)    # first of 3
    assert out["email"] == pytest.approx(40.0)   # last of 3
    assert out["click"] == pytest.approx(20.0)   # sole middle
    assert out["ad"] == pytest.approx(40.0)      # k=1 → full value
    assert out["sms"] == pytest.approx(5.0) and out["push"] == pytest.approx(5.0)


def test_graph_profile_known_shapes(spark):
    """A path (chain) and a triangle produce the textbook histograms:
    path of 4 → degrees {1:2, 2:2}, one size-4 component; triangle →
    degrees {2:3}, one size-3 component."""
    from epicsarchiver_spark.operators.dedup import graph_profile

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    rows = {(r.metric, r.k): r.n for r in graph_profile(pairs).collect()}
    assert rows[("degree", 1)] == 2      # chain endpoints
    assert rows[("degree", 2)] == 2 + 3  # chain middles + triangle nodes
    assert rows[("component", 4)] == 1
    assert rows[("component", 3)] == 1
    assert sum(n for (m, _), n in rows.items() if m == "component") == 2


def test_pagerank_subunit_weights_survive_quantization(spark):
    """Cosine-sized edge scores (< 1.0) must not truncate to zero weight
    — the cent quantization keeps them, and a genuinely zero edge drops
    instead of null-poisoning the division."""
    from epicsarchiver_spark.operators.related import pagerank

    edges = spark.createDataFrame(
        [("A", "B", 0.9), ("B", "C", 0.3), ("C", "D", 0.0)],
        "pv1 string, pv2 string, score double",
    )
    got = {r.pvname: r for r in pagerank(edges, rounds=3).collect()}
    # D's only edge has zero weight → D drops from the graph entirely
    assert set(got) == {"A", "B", "C"}
    # B bridges the two live edges → highest centrality
    assert got["B"].rank_units > got["A"].rank_units
    assert got["B"].rank_units > got["C"].rank_units
    assert all(r.rank_units >= (15 * 10**9) // 100 for r in got.values())


def test_flatlines_null_values_split_islands_like_sql(spark):
    """NULL values follow IS DISTINCT FROM semantics (the oracle's
    rule): a NULL between identical readings breaks the run, and
    consecutive NULLs form one island of their own."""
    from epicsarchiver_spark.operators import timeseries

    rows = [
        ("pv", 100.0, 5.0),
        ("pv", 110.0, None),
        ("pv", 120.0, None),
        ("pv", 130.0, 5.0),
        ("pv", 140.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = timeseries.flatlines(df, min_points=2, min_duration_s=0.0).collect()[0]
    # islands: [5], [NULL, NULL], [5, 5] → longest has 2 points
    assert out.longest_run == 2
    assert out.n_points == 5
    # two islands reach 2 points: the NULL pair and the trailing 5s
    assert out.n_stuck_runs == 2


def test_corpus_drift_identical_and_shifted_releases(spark):
    """Identical releases → cosine 1.0 everywhere and equal shares; a
    release missing one cell reports (n_b=0, null cosine) for it."""
    from epicsarchiver_spark.operators.similarity import corpus_drift

    cents = [[1.0, 0.0], [0.0, 1.0]]
    a = _vecs(
        spark,
        [(1, [1.0, 0.1], 0), (2, [0.9, 0.2], 0), (3, [0.1, 1.0], 0)],
    )
    same = corpus_drift(a, a, centroids=cents).collect()
    assert all(r.centroid_cosine == pytest.approx(1.0) for r in same)
    assert all(r.n_a == r.n_b and r.share_a == r.share_b for r in same)
    # release b drops the y-cell vector entirely
    b = _vecs(spark, [(1, [1.0, 0.1], 0), (2, [0.9, 0.2], 0)])
    out = {r.cell: r for r in corpus_drift(a, b, centroids=cents).collect()}
    ycell = [c for c, r in out.items() if r.n_b == 0][0]
    assert out[ycell].n_a == 1 and out[ycell].centroid_cosine is None
    assert out[ycell].share_b == 0.0
    xcell = [c for c in out if c != ycell][0]
    assert out[xcell].share_b == pytest.approx(1.0)


def test_nb_label_audit_learns_separable_domains(spark):
    """Two clearly separable vocabularies: every doc's predicted class
    matches its label; a deliberately mislabeled doc disagrees (the
    audit's purpose); smoothing keeps unseen-term classes finite."""
    from epicsarchiver_spark.operators.text_ops import nb_label_audit

    rows = [
        (1, "proton beam lattice magnet quadrupole", "physics"),
        (2, "beam magnet dipole vacuum lattice", "physics"),
        (3, "sourdough flour yeast crumb bake", "baking"),
        (4, "bake oven flour starter crust", "baking"),
        # mislabeled: baking vocabulary recorded as physics
        (5, "yeast flour bake crust sourdough", "physics"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in nb_label_audit(df, label_col="source").collect()}
    for i in (1, 2):
        assert out[i].predicted == "physics" and out[i].agree
    for i in (3, 4):
        assert out[i].predicted == "baking" and out[i].agree
    assert out[5].predicted == "baking" and not out[5].agree
    assert all(r.score is not None for r in out.values())


def test_seasonal_anomalies_ignores_the_cycle_flags_the_spike(spark):
    """A clean daily cycle never flags; the same cycle with one
    injected departure flags exactly that instant."""
    from epicsarchiver_spark.operators import timeseries

    rows = []
    for day in range(6):
        for h in range(24):
            t = day * 86400.0 + h * 3600.0
            # square daily cycle + small deterministic jitter (a
            # perfectly flat residual stream has MAD 0, which the
            # degenerate-scale guard correctly suppresses)
            v = 20.0 + 10.0 * (1 if 8 <= h < 18 else 0)
            v += 0.01 * ((day * 7 + h) % 5)
            rows.append(("cyc", t, v))
    spike_t = 3 * 86400.0 + 12 * 3600.0
    rows = [(p, t, (99.0 if (p, t) == ("cyc", spike_t) else v)) for p, t, v in rows]
    df = spark.createDataFrame(rows, "pvname string, time double, value double")
    out = timeseries.seasonal_anomalies(df, k=5.0).collect()
    flagged = {r.time: r for r in out}
    # the spike is flagged, with the largest departure of anything
    assert spike_t in flagged
    assert abs(flagged[spike_t].residual) == max(abs(r.residual) for r in out)
    # everything flagged lives in the contaminated hour (the spike
    # shifts hour-12's own baseline, so its siblings deviate too —
    # correct behavior for a mean baseline); no OTHER hour fires
    assert all(int(t // 3600) % 24 == 12 for t in flagged)
    # the step edges of the clean cycle itself never fire
    assert all(int(t // 3600) % 24 not in (8, 18) for t in flagged)


def test_minhash_quality_counts_are_consistent(spark):
    """On the shared gate corpus the report's identities must hold:
    hits <= both sides, false+hit = candidates, missed+hit = true, and
    the banding guarantee (recall 1.0 at this parameterization)."""
    from epicsarchiver_spark.operators.dedup import minhash_quality

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = minhash_quality(docs, threshold=0.5, shingle_k=2, basis="md5").collect()[0]
    assert r.n_hit <= r.n_candidates and r.n_hit <= r.n_true
    assert r.n_false == r.n_candidates - r.n_hit
    assert r.n_missed == r.n_true - r.n_hit
    assert r.n_true > 0 and r.recall == 1.0


def test_minhash_quality_sample_frac_dial(spark):
    """sample_frac bounds the block-quadratic truth set by contract:
    the draw is deterministic (same result twice), sample_frac=1.0 is
    the identity, the report identities hold on the subsample, and the
    banding recall guarantee survives sampling (it holds on any subset
    of the corpus). Bad fractions fail fast."""
    import pytest as _pytest

    from epicsarchiver_spark.operators.dedup import minhash_quality

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = minhash_quality(docs, threshold=0.5, shingle_k=2, basis="md5").collect()[0]
    ident = minhash_quality(
        docs, threshold=0.5, shingle_k=2, basis="md5", sample_frac=1.0
    ).collect()[0]
    assert ident.asDict() == full.asDict()

    s1 = minhash_quality(
        docs, threshold=0.5, shingle_k=2, basis="md5", sample_frac=0.5
    ).collect()[0]
    s2 = minhash_quality(
        docs, threshold=0.5, shingle_k=2, basis="md5", sample_frac=0.5
    ).collect()[0]
    assert s1.asDict() == s2.asDict()  # hash draw, not RNG
    # subsample shrinks both pair sets and keeps the report identities
    assert s1.n_true <= full.n_true and s1.n_candidates <= full.n_candidates
    assert s1.n_false == s1.n_candidates - s1.n_hit
    assert s1.n_missed == s1.n_true - s1.n_hit
    assert s1.n_true > 0 and s1.recall == 1.0
    # a different seed draws a different subsample
    s3 = minhash_quality(
        docs, threshold=0.5, shingle_k=2, basis="md5", sample_frac=0.5, seed=7
    ).collect()[0]
    assert s3.asDict() != s1.asDict()

    with _pytest.raises(ValueError, match="sample_frac"):
        minhash_quality(docs, sample_frac=0.0)
    with _pytest.raises(ValueError, match="sample_frac"):
        minhash_quality(docs, sample_frac=1.5)
