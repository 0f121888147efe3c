"""Cross-formulation consistency: independent formulations of the same
semantics must agree — the as-of window variant vs the union-tag-LOCF
join, and the lag deadband vs the sequential compressor under conditions
where they coincide."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from epicsarchiver_spark.operators.deadband import compress_sequential, deadband_lag
from epicsarchiver_spark.operators.timeseries import asof_join, value_at_time


def _random_points(spark, seed=7, n_series=6, n_rows=80):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for s in range(n_series):
        t = 0.0
        for _ in range(n_rows):
            t += rng.uniform(0.5, 30.0)
            rows.append((f"PV:{s}", t, round(rng.uniform(-50, 50), 3), eid))
            eid += 1
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["pvname", "time", "value", "event_id"])
    )


def test_asof_join_agrees_with_value_at_time(spark):
    pts = _random_points(spark)
    for t in (100.0, 555.5, 1200.0):
        via_window = {
            (r.pvname, r.time, r.value)
            for r in value_at_time(pts, t).select("pvname", "time", "value").collect()
        }
        probes = pts.select("pvname").distinct().withColumn("t", F.lit(t))
        via_join = {
            (r.pvname, r.asof_time, r.value)
            for r in asof_join(pts.select("pvname", "time", "value", "event_id"), probes)
            .filter(F.col("asof_time").isNotNull())
            .select("pvname", "asof_time", "value")
            .collect()
        }
        assert via_window == via_join, f"t={t}"


def test_banded_cosine_neardups_subset_of_exact(spark):
    """The banded (LSH candidate-generation) near-dup operator must emit a
    subset of the exact O(n²) operator's pairs — verification is exact, so
    banding can only lose pairs, never invent them."""
    from epicsarchiver_spark.operators.similarity import (
        cosine_near_duplicates,
        cosine_near_duplicates_banded,
    )

    rng = random.Random(3)
    rows = []
    for i in range(120):
        base = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in base]))
        if i % 10 == 0:  # planted near-duplicate
            rows.append((1000 + i, [float(x + rng.gauss(0, 0.01)) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in cosine_near_duplicates(df, threshold=0.8).collect()
    }
    banded = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in cosine_near_duplicates_banded(
            df, threshold=0.8, n_planes=16, bands=8
        ).collect()
    }
    assert banded <= exact
    planted = {(i, 1000 + i) for i in range(0, 120, 10)}
    assert planted <= {(a, b) for a, b, _ in exact}
    # near-identical vectors agree on almost every hyperplane sign → banding
    # keeps them; require high recall on the planted pairs
    assert len(planted & {(a, b) for a, b, _ in banded}) >= len(planted) - 1


def test_minhash_recall_against_exact_jaccard(spark):
    """Quantified cross-check of the approximate family against the exact
    oracle-checked one, at the driver's correctness scale (sf0.01):

    - RECALL: every pair the exact blocked-Jaccard operator reports at
      threshold 0.5 must also be found by MinHash+LSH (measured 6/6; LSH
      with 16 bands × 4 rows has >0.9999 candidate probability at J=0.5).
    - PRECISION: every MinHash-reported pair must have TRUE (unblocked)
      Jaccard ≥ 0.8 — the found-but-not-in-truth pairs are cross-block
      near-dups the blocking key hides, not estimator false positives
      (measured: all 25 found pairs have true J ≥ 0.9)."""
    from pyspark.sql import functions as F

    from epicsarchiver_spark.catalog import load_table
    from epicsarchiver_spark.functions.hashing import shingle_hashes
    from epicsarchiver_spark.functions.text import tokens
    from epicsarchiver_spark.operators import dedup
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    truth = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.5).collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_near_duplicates(docs, threshold=0.5, shingle_k=2).collect()
    }
    assert truth <= found, f"minhash missed exact pairs: {sorted(truth - found)}"

    sh = {
        r.doc_id: set(r.sh)
        for r in docs.select(
            "doc_id", shingle_hashes(tokens(F.col("text")), 2).alias("sh")
        ).collect()
    }
    for a, b in found:
        true_j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        assert true_j >= 0.8, f"false positive ({a},{b}): true jaccard {true_j:.3f}"


def test_lag_deadband_agrees_with_sequential_when_deadtime_zero(spark):
    """With deadtime=0 and strictly increasing times, 'compare to
    previous kept' and 'compare to previous row' coincide only when every
    change exceeds the band — use deadband=0 where both reduce to
    keep-on-change."""
    pts = _random_points(spark, seed=11)
    a = {
        (r.pvname, r.time)
        for r in deadband_lag(pts, deadtime=0.0, deadband=0.0).collect()
    }
    b = {
        (r.pvname, r.time)
        for r in compress_sequential(pts, deadtime=0.0, deadband=0.0).collect()
    }
    assert a == b


def test_connected_components_and_dedup_near(spark):
    """Pairs → groups → one survivor per group: a 3-chain (1-2-3) and a
    2-clique (5-6) resolve to min-id components; unpaired doc 4 survives."""
    from epicsarchiver_spark.operators.dedup import connected_components, dedup_near

    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (5, 6, 0.95)], "id_a long, id_b long, jaccard double"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in dedup_near(docs, pairs).collect())
    assert kept == [1, 4, 5]


def test_connected_components_long_chain(spark):
    """Diameter > 1 path graph exercises multi-round propagation."""
    from epicsarchiver_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(10)], "id_a long, id_b long, jaccard double"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {i: 0 for i in range(11)}


def test_jaccard_pairs_incremental_matches_filtered_full(spark):
    """new_ids mode must produce EXACTLY the full run's pairs that touch
    at least one new id — canonical orientation, same jaccard values —
    while pruning the left join side to the batch."""
    from epicsarchiver_spark.operators.dedup import jaccard_pairs_blocked

    docs = spark.createDataFrame(
        [
            (i, "alpha beta gamma delta " + ("x" if i % 3 == 0 else "y"), "en")
            for i in range(30)
        ],
        "doc_id long, text string, lang string",
    )
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs_blocked(docs, shingle_k=2, threshold=0.3).collect()
    }
    new = spark.createDataFrame([(i,) for i in range(0, 30, 5)], "doc_id long")
    newset = set(range(0, 30, 5))
    inc = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs_blocked(
            docs, shingle_k=2, threshold=0.3, new_ids=new
        ).collect()
    }
    want = {k: v for k, v in full.items() if k[0] in newset or k[1] in newset}
    assert inc == want and len(want) > 0


def test_merge_components_hand_graphs(spark):
    """Incremental CC vs hand answers: a bridge pair merges two old
    components onto the global min; a novel chain hanging off an old
    component inherits its label; an intra-component pair is a no-op;
    untouched components keep their labels."""
    from epicsarchiver_spark.operators.dedup import merge_components

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5), (9, 9)], "id long, component long"
    )
    # bridge 2-6 merges {1,2} and {5,6}; novel 7-8 chain hangs off 6;
    # 5-6 is intra-component noise; {9} untouched
    new_pairs = spark.createDataFrame(
        [(2, 6), (6, 7), (7, 8), (5, 6)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in merge_components(comp, new_pairs).collect()}
    assert got == {1: 1, 2: 1, 5: 1, 6: 1, 7: 1, 8: 1, 9: 9}


def test_merge_components_matches_from_scratch(spark):
    """The soundness property the gate certifies: CC(old) + merge(new
    pairs) == CC(old ∪ new), on randomized graphs split into an 'old'
    edge set and a batch touching both old and novel nodes."""
    from epicsarchiver_spark.operators.dedup import (
        connected_components_star,
        merge_components,
    )

    for seed in (3, 4):
        rng = random.Random(seed)
        all_edges = sorted(
            {tuple(sorted(rng.sample(range(50), 2))) for _ in range(70)}
        )
        # old = both endpoints < 40; the batch is everything else
        old = [(a, b) for a, b in all_edges if a < 40 and b < 40 and rng.random() < 0.8]
        new = [e for e in all_edges if e not in old]
        if not old or not new:
            continue
        mk = lambda es: spark.createDataFrame(es, "id_a long, id_b long")  # noqa: E731
        base = connected_components_star(mk(old))
        inc = {
            r.id: r.component
            for r in merge_components(base, mk(new)).collect()
        }
        full = {
            r.id: r.component
            for r in connected_components_star(mk(all_edges)).collect()
        }
        assert inc == full, f"seed {seed}"


def test_ivf_trained_centroids_recall(spark):
    """MLlib-KMeans-trained centroids must give the IVF search ≥0.8
    recall@10 vs brute force on clustered synthetic data (and the
    operator must accept external centroids at all)."""
    from epicsarchiver_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    rng = random.Random(5)
    centers = [[rng.uniform(-5, 5) for _ in range(8)] for _ in range(4)]
    rows = []
    for i in range(400):
        c = centers[i % 4]
        rows.append((i, [float(x + rng.gauss(0, 0.3)) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = [float(x + 0.1) for x in centers[0]]

    cents = train_ivf_centroids(df, n_cells=4, max_iter=10)
    assert len(cents) == 4 and len(cents[0]) == 8

    exact = [r.vec_id for r in brute_force_topk(df, query, k=10).collect()]
    approx = [
        r.vec_id
        for r in ivf_topk(df, query, k=10, n_cells=4, n_probe=1, centroids=cents).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"recall@10 {recall}"


def test_connected_components_matches_union_find(spark):
    """Randomized graphs vs a driver-side union-find spec: identical
    (vertex → min-id-of-component) maps."""
    from epicsarchiver_spark.operators.dedup import connected_components

    for seed in (1, 2):
        rng = random.Random(seed)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(60), 2)))
                for _ in range(80)
            }
        )
        parent = list(range(60))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        members = [v for v in range(60) if any(v in e for e in edges)]
        expected = {}
        roots = {}
        for v in sorted(members):
            r = find(v)
            roots.setdefault(r, v)  # min id first encountered
            expected[v] = roots[r]

        pairs = spark.createDataFrame(
            [(a, b, 1.0) for a, b in edges], "id_a long, id_b long, jaccard double"
        )
        got = {r.id: r.component for r in connected_components(pairs).collect()}
        assert got == expected, f"seed {seed}"


def test_star_cc_agrees_with_propagation_and_union_find(spark):
    """large-star/small-star CC: same (vertex → min-id) map as both the
    propagation operator and a driver-side union-find, on random graphs
    and on shapes that stress it (clique, two components, self-dup)."""
    from epicsarchiver_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    cases = [
        [(1, 2), (2, 3), (5, 6)],
        [(a, b) for a in range(5) for b in range(a + 1, 5)],  # clique
        [(10, 11), (12, 13), (11, 12), (20, 21)],
    ]
    for seed in (3, 4):
        rng = random.Random(seed)
        cases.append(sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(50)}))
    for edges in cases:
        pairs = spark.createDataFrame(
            [(a, b, 1.0) for a, b in edges], "id_a long, id_b long, jaccard double"
        )
        via_star = {r.id: r.component for r in connected_components_star(pairs).collect()}
        via_prop = {r.id: r.component for r in connected_components(pairs).collect()}
        assert via_star == via_prop, edges


def test_star_cc_converges_on_1000_node_path(spark):
    """The adversarial case the star variant exists for: a 10³-node path
    (diameter 999 — propagation would need 999 rounds) must fully
    converge within the default ~log²n round budget."""
    from epicsarchiver_spark.operators.dedup import connected_components_star

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "id_a long, id_b long, jaccard double"
    )
    comp = {r.id: r.component for r in connected_components_star(pairs).collect()}
    assert comp == {i: 0 for i in range(n)}


def test_incremental_dedup_exact_and_near(spark):
    """Cross-corpus dedup: verbatim re-crawls drop, new/edited docs
    survive; the minhash variant also drops shingle-level near-dups the
    exact fingerprint misses."""
    from epicsarchiver_spark.operators.dedup import (
        dedup_against_corpus,
        dedup_against_corpus_near,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different reference text about spark plans")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),                              # exact re-crawl → drop
            (11, base + " extra"),                   # near-dup → near drops it
            (12, "entirely novel content with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )
    exact_kept = sorted(r.doc_id for r in dedup_against_corpus(new, corpus).collect())
    assert exact_kept == [11, 12]
    near_kept = sorted(
        r.doc_id
        for r in dedup_against_corpus_near(
            new, corpus, threshold=0.5, shingle_k=3, num_hashes=64, bands=16
        ).collect()
    )
    assert near_kept == [12]


def test_lsh_pairwise_exclude_self_dial(spark):
    """exclude_self: a probe whose id collides with a corpus id drops
    that corpus row by default (self-match suppression for in-corpus
    probes) and keeps it with exclude_self=False (external query vectors
    that merely reuse an id); both paths find the planted near-identical
    vector, and single-probe lsh_bucket_topk agrees with the
    exclude_self=False pairwise result on the same query."""
    from epicsarchiver_spark.operators.similarity import (
        lsh_bucket_topk,
        lsh_pairwise_topk,
    )

    dim = 16
    base = [1.0 if j % 3 else -1.0 for j in range(dim)]
    rows = [(i, [v * (1.0 + 0.01 * i) for v in base]) for i in range(8)]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    probe = spark.createDataFrame([rows[0]], "vec_id bigint, embedding array<double>")

    with_self = lsh_pairwise_topk(
        vecs, probe, k=8, n_planes=4, max_hamming=1, exclude_self=False
    ).collect()
    without = lsh_pairwise_topk(
        vecs, probe, k=8, n_planes=4, max_hamming=1
    ).collect()
    ids_with = {r.corpus_id for r in with_self}
    ids_without = {r.corpus_id for r in without}
    assert 0 in ids_with and 0 not in ids_without
    assert ids_with - {0} == ids_without

    single = lsh_bucket_topk(
        vecs, rows[0][1], k=8, n_planes=4, max_hamming=1
    ).collect()
    assert {(r.vec_id, r.cosine_sim) for r in single} == {
        (r.corpus_id, r.cosine_sim) for r in with_self
    }


def test_sessionize_matches_python_reference(spark):
    """Randomized series through the gaps-and-islands operator vs a
    straight-line python fold — session boundaries, extents and counts
    must agree exactly, including equality-at-gap merges and
    single-event sessions."""
    rng = random.Random(99)
    rows = []
    for s in range(40):
        t = 0.0
        for _ in range(rng.randint(1, 60)):
            t += rng.choice([0.5, 1.0, 5.0, 10.0, 10.0001, 25.0])
            rows.append((f"S:{s}", round(t, 4), 0.0))
    gap = 10.0

    def py_sessions(rows):
        out = {}
        for pv, t, _ in rows:
            out.setdefault(pv, []).append(t)
        want = set()
        for pv, ts in out.items():
            ts.sort()
            start = prev = ts[0]
            n = 1
            for t in ts[1:]:
                if t - prev > gap:  # inclusive merge boundary
                    want.add((pv, start, prev, n))
                    start, n = t, 0
                n += 1
                prev = t
            want.add((pv, start, prev, n))
        return want

    from epicsarchiver_spark.operators.timeseries import sessionize

    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pvname", "time", "value"])
    )
    got = {
        (r.pvname, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, gap_s=gap).collect()
    }
    assert got == py_sessions(rows)


def test_dedup_substrings_excises_shared_and_repeated_spans(spark):
    """ExactSubstr semantics: a length-8 token window shared across two
    docs is excised from BOTH; a window repeated twice WITHIN one doc is
    excised too; unique text survives; docs shorter than the window are
    untouched."""
    from epicsarchiver_spark.operators.dedup import dedup_substrings

    shared = "a b c d e f g h"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (0, f"intro one two {shared} outro three"),
            (1, f"{shared} completely different tail here"),
            (2, f"{shared} mid x y z {shared}"),  # within-doc repeat
            (3, "totally unique text with no duplicated window at all"),
            (4, "short doc"),  # < window tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_substrings(docs, window=8).collect()}

    # doc 0: the 8 shared tokens vanish, the unique frame survives
    assert out[0].text_clean == "intro one two outro three"
    assert out[0].n_dup_tokens == 8 and out[0].n_dup_windows == 1
    # doc 1: same window excised at position 0
    assert out[1].text_clean == "completely different tail here"
    # doc 2: both occurrences of the repeated window excised
    assert out[2].text_clean == "mid x y z"
    assert out[2].n_dup_tokens == 16 and out[2].n_dup_windows == 2
    # docs 3/4: untouched
    assert out[3].n_dup_tokens == 0 and out[3].text_clean.startswith("totally unique")
    assert out[4].n_dup_tokens == 0 and out[4].text_clean == "short doc"


def test_dedup_substrings_overlapping_windows_merge(spark):
    """Overlapping duplicated windows cover a merged span, not 2x window
    tokens: two docs share a 9-token run -> two overlapping 8-windows,
    9 excised tokens (not 16)."""
    from epicsarchiver_spark.operators.dedup import dedup_substrings

    run9 = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = spark.createDataFrame(
        [(0, f"{run9} unique tail alpha"), (1, f"prefix beta {run9}")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_substrings(docs, window=8).collect()}
    assert out[0].n_dup_windows == 2 and out[0].n_dup_tokens == 9
    assert out[0].text_clean == "unique tail alpha"
    assert out[1].text_clean == "prefix beta"


def test_bloom_dedup_matches_exact_path(spark):
    """Bloom-accelerated incremental dedup returns EXACTLY the plain
    anti-join result (no false negatives by construction), at normal and
    at adversarially tiny bloom sizes (high fp rate -> more confirm-join
    traffic, same answer)."""
    from epicsarchiver_spark.operators.dedup import (
        build_fingerprint_bloom,
        dedup_against_corpus,
        dedup_against_corpus_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} body") for i in range(200)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        # 0-49: verbatim re-crawls (dups); 100-139: novel
        [(1000 + i, f"corpus document number {i} body") for i in range(50)]
        + [(2000 + i, f"novel text {i}") for i in range(40)],
        "doc_id long, text string",
    )
    expect = sorted(r.doc_id for r in dedup_against_corpus(new, corpus).collect())
    assert expect == [2000 + i for i in range(40)]

    for fpp, expected_items in ((0.01, None), (0.5, 10)):  # second = tiny/undersized
        bloom = build_fingerprint_bloom(corpus, fpp=fpp, expected_items=expected_items)
        got = sorted(
            r.doc_id
            for r in dedup_against_corpus_bloom(new, corpus, bloom).collect()
        )
        assert got == expect, f"fpp={fpp}"


def test_bloom_prefilter_clears_most_novel_rows(spark):
    """The scale property the bloom buys: novel rows overwhelmingly skip
    the confirm join. With 1% fpp, >=90% of 200 novel docs must be
    cleared by the bloom alone (and every duplicate must be flagged
    maybe)."""
    from pyspark.sql import functions as F

    from epicsarchiver_spark.operators.dedup import (
        _bloom_hashes,
        build_fingerprint_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"standing doc {i}") for i in range(500)], "doc_id long, text string"
    )
    bloom = build_fingerprint_bloom(corpus, fpp=0.01)
    batch = spark.createDataFrame(
        [(i, f"standing doc {i}") for i in range(100)]  # dups
        + [(10_000 + i, f"fresh doc {i}") for i in range(200)],  # novel
        "doc_id long, text string",
    )
    h1, h2 = _bloom_hashes(F.col("text"))
    flags = {
        r.doc_id: r.maybe
        for r in batch.select("doc_id", bloom.contains_udf()(h1, h2).alias("maybe")).collect()
    }
    assert all(flags[i] for i in range(100)), "a true duplicate escaped the bloom"
    novel_cleared = sum(not flags[10_000 + i] for i in range(200))
    assert novel_cleared >= 180


def test_bigram_logprob_hand_computed(spark):
    """JM-interpolated bigram scores on a 3-doc corpus, checked against
    closed-form math: vocab a(3) b(2) c(1), N=6 V=3, c(a,b)=2 c(a,c)=1,
    c_left(a)=3."""
    import math

    from epicsarchiver_spark.operators.text_ops import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_logprob(docs, alpha=0.5, lam=0.8).collect()}

    def p_uni(c):
        return (c + 0.5) / (6 + 0.5 * 3)

    s_first = -math.log(p_uni(3))  # all docs start with 'a'
    ab = -math.log(0.8 * 2 / 3 + (1.0 - 0.8) * p_uni(2))
    ac = -math.log(0.8 * 1 / 3 + (1.0 - 0.8) * p_uni(1))
    assert out[0].n_tokens == 2
    assert out[0].mean_neg_logprob == round((s_first + ab) / 2, 6)
    assert out[1].mean_neg_logprob == out[0].mean_neg_logprob
    assert out[2].mean_neg_logprob == round((s_first + ac) / 2, 6)
    # rarer continuation must score strictly worse
    assert out[2].mean_neg_logprob > out[0].mean_neg_logprob


def test_quality_classifier_orders_prose_above_noise(spark):
    """Fixed-weight logistic gate: natural prose with stopwords scores
    above punctuation soup, digit dumps, and SHOUTING."""
    from epicsarchiver_spark.operators.text_ops import quality_classifier

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and looked out of the window to the garden"),
            (1, ";;;, ,.!? ::: ()[] ,,.. !!! ??? ;;; ,.,., ()() !?!?"),
            (2, "4920 1123 9583 2291 0042 7731 5550 9182 3311 8822"),
            (3, "ALL CAPS HEADER DUMP SECTION TWO CONTENTS INDEX TABLE"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in quality_classifier(docs).collect()}
    assert out[0].keep is True
    for bad in (1, 2, 3):
        assert out[0].quality_prob > out[bad].quality_prob
    assert out[1].keep is False


def test_semantic_contamination_flags_members_and_near_copies(spark):
    """Benchmark members flag contaminated (cosine 1 with themselves),
    a scaled copy too (cosine invariant to scale), an orthogonal vector
    does not; n_hits counts benchmark rows above threshold."""
    from epicsarchiver_spark.operators.similarity import semantic_contamination

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),   # benchmark member
            (1, [2.0, 0.0, 0.0]),   # scaled copy of it
            (2, [0.0, 1.0, 0.0]),   # orthogonal
            (3, [1.0, 0.05, 0.0]),  # near copy
        ],
        "vec_id long, embedding array<float>",
    )
    bench = corpus.filter("vec_id = 0")
    out = {r.vec_id: r for r in semantic_contamination(corpus, bench, 0.9).collect()}
    assert out[0].contaminated and out[0].max_cosine == 1.0 and out[0].n_hits == 1
    assert out[1].contaminated and out[1].max_cosine == 1.0
    assert not out[2].contaminated and out[2].n_hits == 0
    assert out[3].contaminated  # cos ~= 0.99875


def test_ann_recall_small_index_reaches_one(spark):
    """On an index smaller than k, the exact top-k has < k rows; recall
    must divide by the ACTUAL brute-force row count so a perfect match
    reports 1.0 (dividing by the literal k understated it — ADVICE r4)."""
    from epicsarchiver_spark.operators.similarity import ann_recall

    # 3 vectors, k=10: brute top-k = all 3; exhaustive LSH probing
    # (max_hamming = n_planes) retrieves everything too → recall 1.0
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    row = ann_recall(
        corpus, [1.0, 0.0], k=10, n_planes=4, max_hamming=4
    ).head()
    assert row.n_matched == 3
    assert row.recall == 1.0


def test_cdc_chunks_stable_under_edits(spark):
    """The CDC property (r6): inserting tokens near the start of a
    document only redraws chunk boundaries within one window of the
    edit — downstream chunk signatures are IDENTICAL, which is why
    chunk-level dedup survives page re-crawls with small diffs (fixed-
    width chunking shifts every subsequent chunk)."""
    import random

    from epicsarchiver_spark.operators.dedup import cdc_chunk_signatures

    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(400)]
    base = " ".join(words)
    edited = " ".join(words[:3] + ["INSERTED", "TOKENS"] + words[3:])
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    sigs = cdc_chunk_signatures(docs, window=4, boundary_bits=4).collect()
    a = {
        (r.n_windows, r.sig_sum, r.sig_min, r.sig_max)
        for r in sigs
        if r.doc_id == 1
    }
    b = {
        (r.n_windows, r.sig_sum, r.sig_min, r.sig_max)
        for r in sigs
        if r.doc_id == 2
    }
    shared = a & b
    # all chunks after the edit's window re-sync: at boundary_bits=4 the
    # expected chunk is ~16 windows, so ≥ half the chunks must survive
    assert len(shared) >= max(2, len(a) // 2), (len(shared), len(a), len(b))


def test_cdc_duplicate_chunks_finds_shared_boilerplate(spark):
    """Two docs sharing a long boilerplate block + unique bodies: the
    shared block's chunks are reported as duplicated signatures."""
    import random

    from epicsarchiver_spark.operators.dedup import cdc_duplicate_chunks

    rng = random.Random(11)
    boiler = " ".join(f"b{rng.randrange(100)}" for _ in range(200))
    u1 = " ".join(f"x{rng.randrange(10**6)}" for _ in range(150))
    u2 = " ".join(f"y{rng.randrange(10**6)}" for _ in range(150))
    docs = spark.createDataFrame(
        [(1, boiler + " " + u1), (2, boiler + " " + u2), (3, u1 + " solo tail here")],
        "doc_id long, text string",
    )
    dups = cdc_duplicate_chunks(docs, window=4, boundary_bits=4).collect()
    assert len(dups) >= 2  # several interior boilerplate chunks shared
    assert all(r.n_chunks >= 2 for r in dups)


def test_cdc_incremental_catches_edited_recrawls(spark):
    """The lane's point: an edited re-crawl (new exact fingerprint, so
    the exact anti-join keeps it) still drops at chunk level, while a
    genuinely novel doc survives."""
    import random

    from epicsarchiver_spark.operators.dedup import (
        cdc_dedup_against_corpus,
        cdc_dedup_report,
    )

    rng = random.Random(3)
    texts = [
        " ".join(f"t{rng.randrange(300)}" for _ in range(250)) for _ in range(6)
    ]
    corpus = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (100, texts[0]),                        # verbatim re-crawl
            (101, texts[1] + " tiny appended edit"),  # edited re-crawl
            (102, " ".join(f"z{rng.randrange(10**6)}" for _ in range(250))),  # novel
        ],
        "doc_id long, text string",
    )
    rep = {r.doc_id: r for r in cdc_dedup_report(batch, corpus, boundary_bits=4).collect()}
    assert rep[100].dropped and rep[100].n_matched == rep[100].n_chunks
    assert rep[101].dropped and 0 < rep[101].n_matched  # edit caught
    assert not rep[102].dropped and rep[102].n_matched == 0
    survivors = {r.doc_id for r in cdc_dedup_against_corpus(batch, corpus, boundary_bits=4).collect()}
    assert survivors == {102}


def test_cdc_chunk_texts_partition_document_and_align_with_signatures(spark):
    """chunk_texts is a PARTITION of each document's token stream (space-
    joined concat in chunk order == the tokenized doc) and its chunk set
    aligns 1:1 with cdc_chunk_signatures' (id, chunk_idx) keys."""
    import random

    from epicsarchiver_spark.operators.dedup import (
        cdc_chunk_signatures,
        cdc_chunk_texts,
    )

    rng = random.Random(5)
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{rng.randrange(200)}" for _ in range(rng.randrange(0, 300))))
            for i in range(8)
        ],
        "doc_id long, text string",
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    chunks = cdc_chunk_texts(docs, window=4, boundary_bits=4).collect()
    sigs = cdc_chunk_signatures(docs, window=4, boundary_bits=4).collect()
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    for did, parts in by_doc.items():
        joined = " ".join(t for _, t in sorted(parts))
        assert joined == " ".join(texts[did].split()), did
    # every signature chunk has a text chunk for docs long enough to
    # have windows (text chunks also cover the tail past the last window)
    sig_keys = {(r.doc_id, r.chunk_idx) for r in sigs}
    text_keys = {(r.doc_id, r.chunk_idx) for r in chunks}
    assert sig_keys <= text_keys


def test_dsir_scores_rank_target_like_docs_higher(spark):
    """Documents drawn from the target domain's vocabulary must outscore
    off-domain documents — the property importance resampling relies on."""
    import random

    from epicsarchiver_spark.operators.text_ops import dsir_scores

    rng = random.Random(9)
    tgt_vocab = [f"med{j}" for j in range(50)]
    gen_vocab = [f"gen{j}" for j in range(50)]
    rows = []
    for i in range(10):
        rows.append((i, " ".join(rng.choice(tgt_vocab) for _ in range(80))))
    for i in range(10, 20):
        rows.append((i, " ".join(rng.choice(gen_vocab) for _ in range(80))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100 + i, " ".join(rng.choice(tgt_vocab) for _ in range(80))) for i in range(5)],
        "doc_id long, text string",
    )
    scores = {r.doc_id: r.dsir_score for r in dsir_scores(docs, target).collect()}
    in_domain = [scores[i] for i in range(10)]
    off_domain = [scores[i] for i in range(10, 20)]
    assert min(in_domain) > max(off_domain)


def test_rolling_outliers_flag_glitches_not_drift(spark):
    """A spike against the trailing window flags; a slow monotonic ramp
    moves the rolling median with it and must NOT flag (the global
    median/MAD operator would flag the ramp's tails — that contrast is
    the point of the rolling variant)."""
    from epicsarchiver_spark.operators.timeseries import rolling_robust_outliers

    rows = []
    # drifting series: slow ramp 0..99
    for i in range(100):
        rows.append((i, "DRIFT", float(i), float(i)))
    # glitch series: flat with one spike at t=50
    for i in range(100):
        v = 500.0 if i == 50 else 10.0 + (i % 3) * 0.1
        rows.append((1000 + i, "GLITCH", float(i), v))
    pts = spark.createDataFrame(
        rows, "event_id long, pvname string, time double, value double"
    )
    out = rolling_robust_outliers(pts, window=25, k=5.0).collect()
    by = {}
    for r in out:
        by.setdefault(r.pvname, []).append(r.time)
    assert "DRIFT" not in by, by.get("DRIFT")
    assert by.get("GLITCH") == [50.0]


def test_decontaminate_spans_excises_benchmark_collisions_only(spark):
    """A corpus doc quoting a benchmark passage loses exactly the quoted
    span; clean docs pass through untouched; a fully-contaminated doc
    empties."""
    from epicsarchiver_spark.operators.dedup import decontaminate_spans

    passage = " ".join(f"q{j}" for j in range(20))
    clean = " ".join(f"c{j}" for j in range(30))
    docs = spark.createDataFrame(
        [
            (1, clean + " " + passage + " tail tok here and more padding words"),
            (2, clean),
            (3, passage),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, passage)], "doc_id long, text string")
    out = {r.doc_id: r for r in decontaminate_spans(docs, bench, window=8).collect()}
    assert out[2].n_dup_tokens == 0 and out[2].text_clean == clean
    assert out[3].text_clean == "" and out[3].n_dup_tokens == 20
    assert "q5" not in out[1].text_clean.split()
    assert out[1].text_clean.startswith(clean)
    assert out[1].text_clean.split()[-1] == "words"


def test_lttb_selection_lies_within_bucket_envelope(spark):
    """Every LTTB-selected point must be one of its bucket's own points
    (value inside the bucket's min/max envelope, bucket populations
    conserved) — cross-checks the bucketing against decimate_minmax."""
    from epicsarchiver_spark.catalog import points_view
    from epicsarchiver_spark.operators.timeseries import lttb_downsample

    T0, T1, STEP = 1704672000.0, 1705881600.0, 6 * 3600.0
    pts = points_view(spark, "/root/testdata/sf0.001")
    sel = lttb_downsample(pts, T0, T1, STEP).collect()
    raw = (
        pts.filter((F.col("time") >= T0) & (F.col("time") < T1))
        .withColumn("b", F.floor((F.col("time") - T0) / STEP).cast("long"))
        .groupBy("pvname", "b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    )
    env = {(r.pvname, r.b): r for r in raw}
    assert len(sel) == len(env)  # exactly one selection per populated bucket
    for r in sel:
        e = env[(r.pvname, r.bucket)]
        assert e.lo <= r.value <= e.hi
        assert r.n_in_bucket == e.n


def test_budget_selection_is_exact_quality_prefix(spark):
    """The selected set must equal the pandas-computed greedy prefix of
    docs sorted by (quality desc, id) — the decomposed distributed
    prefix-sum agrees with the obvious single-machine formulation."""
    from epicsarchiver_spark.operators.text_ops import budget_selection

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = budget_selection(docs, token_budget=5000).collect()
    rows = sorted(out, key=lambda r: (-r.quality_prob, r.doc_id))
    cum, expected = 0, set()
    for r in rows:
        cum += r.n_tokens
        if cum <= 5000:
            expected.add(r.doc_id)
    assert {r.doc_id for r in out if r.selected} == expected


def test_pipeline_verdicts_agree_with_component_operators(spark):
    """Each verdict must be reproducible from the standalone certified
    operator it composes: 'gopher' docs fail gopher_rules, 'exact_dup'
    docs have a smaller-id identical text, 'kept' docs pass gopher and
    have no smaller identical copy."""
    from epicsarchiver_spark.operators.curation import pipeline_verdicts
    from epicsarchiver_spark.operators.text_ops import gopher_rules

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    v = {r.doc_id: r.stage for r in pipeline_verdicts(docs).collect()}
    keep = {r.doc_id for r in gopher_rules(docs).filter(F.col("keep")).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    first_by_text = {}
    for i in sorted(texts):
        first_by_text.setdefault(texts[i], i)
    for i, stage in v.items():
        if stage == "benchmark":
            assert i % 97 == 0
            continue
        assert i % 97 != 0
        if stage == "gopher":
            assert i not in keep
        else:
            assert i in keep
        if stage == "exact_dup":
            assert first_by_text[texts[i]] < i
        if stage == "kept":
            assert first_by_text[texts[i]] == i
