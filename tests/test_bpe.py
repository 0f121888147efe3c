"""BPE training loop vs a literal pure-python Sennrich mirror — the
loop's correctness pin (bpe_pair_counts, round 1's statistics, carries
the full DuckDB oracle; this covers rounds 2..n and the apply step)."""

from __future__ import annotations

from collections import Counter

import pytest

from epicsarchiver_spark.operators import bpe


def _mirror_learn(texts: list[str], n_merges: int, min_count: int = 2):
    words = Counter(w for t in texts for w in t.lower().split() if w)
    syms = {w: tuple(list(w) + [bpe.END]) for w in words}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        # count desc, then pair lexicographic — the engine's tie rule
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((a, b))
        new = {}
        for w, s in syms.items():
            out = []
            for tok in s:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            new[w] = tuple(out)
        syms = new
    return merges, syms, words


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide wide widest",
    "low new wide lower",
]


def test_learn_bpe_matches_python_mirror(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe.learn_bpe(df, n_merges=8)
    want, _, _ = _mirror_learn(TEXTS, 8)
    assert got == want
    assert len(got) == 8  # this corpus supports ≥8 merges above the floor


def test_learn_bpe_stops_below_min_count(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    # every pair occurs once → below the default floor of 2 → no merges
    assert bpe.learn_bpe(df, n_merges=5) == []


def test_apply_bpe_token_counts_match_mirror(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges, syms, _ = _mirror_learn(TEXTS, 6)
    out = {r.doc_id: r for r in bpe.apply_bpe(df, merges).collect()}
    for i, t in enumerate(TEXTS):
        ws = [w for w in t.lower().split() if w]
        # a still-bare end marker is not a token; a marker-fused symbol is
        want_tokens = sum(
            len(syms[w]) - (1 if syms[w][-1] == bpe.END else 0) for w in ws
        )
        assert out[i].n_words == len(ws)
        assert out[i].n_bpe_tokens == want_tokens
        assert out[i].fertility == pytest.approx(want_tokens / len(ws), abs=1e-6)
    # merges genuinely compress: fewer BPE units than raw characters
    assert out[0].n_bpe_tokens < sum(len(w) for w in TEXTS[0].split())


def test_apply_merge_non_overlapping_left_to_right(spark):
    """aaa with merge (a,a) fuses the FIRST pair only: [aa, a, </w>]."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("aaa",)], "word string")
    out = df.select(
        bpe._apply_merge(
            bpe._chars_with_marker(F.col("word")), "a", "a"
        ).alias("s")
    ).collect()[0].s
    assert out == ["aa", "a", bpe.END]


def test_apply_bpe_pandas_lane_matches_expr_lane(spark):
    """The Arrow replay lane must agree row-for-row with the expression
    folds on the same merges — including empty docs and the fertility
    rounding rule."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)] + [(99, "")],
        "doc_id long, text string",
    )
    merges, _, _ = _mirror_learn(TEXTS, 6)
    a = {r.doc_id: (r.n_words, r.n_bpe_tokens, r.fertility)
         for r in bpe.apply_bpe(df, merges, engine="expr").collect()}
    b = {r.doc_id: (r.n_words, r.n_bpe_tokens, r.fertility)
         for r in bpe.apply_bpe(df, merges, engine="pandas").collect()}
    assert a == b
    assert a[99] == (0, 0, None)
    # auto cut-over: a >64-entry merge table routes to the pandas lane
    # (padding with never-matching merges keeps the semantics identical)
    big = merges + [(f"zz{i}", f"qq{i}") for i in range(70)]
    c = {r.doc_id: (r.n_words, r.n_bpe_tokens, r.fertility)
         for r in bpe.apply_bpe(df, big, engine="auto").collect()}
    assert c == a


def _mirror_learn_batched(
    texts: list[str], n_merges: int, min_count: int = 2, batch: int = 16,
    oversample: int = 4,
):
    """Pure-python mirror of learn_bpe_batched: per round, rank all
    pairs (count desc, pair lexicographic), greedily select a
    non-interacting batch via the ENGINE's own select_batch, apply in
    order."""
    words = Counter(w for t in texts for w in t.lower().split() if w)
    syms = {w: tuple(list(w) + [bpe.END]) for w in words}
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        pc: Counter = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        cand = sorted(
            ((a, b, c) for (a, b), c in pc.items() if c >= min_count),
            key=lambda x: (-x[2], x[0], x[1]),
        )[: max(want * oversample, want)]
        picked = bpe.select_batch(cand, want)
        if not picked:
            break
        merges.extend(picked)
        for a, b in picked:
            new = {}
            for w, s in syms.items():
                out = []
                for tok in s:
                    if out and out[-1] == a and tok == b:
                        out[-1] = a + b
                    else:
                        out.append(tok)
                new[w] = tuple(out)
            syms = new
    return merges


def test_learn_bpe_batched_batch1_is_sequential(spark):
    """batch=1 must be bit-identical to learn_bpe (same argmax, same
    tie-break) — the exact-order reference lane."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    assert bpe.learn_bpe_batched(df, n_merges=8, batch=1) == bpe.learn_bpe(
        df, n_merges=8
    )


def test_learn_bpe_batched_matches_python_mirror(spark):
    """The batched lane against a pure-python mirror of the same
    algorithm, at a batch size that genuinely groups merges."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    for batch in (2, 4):
        got = bpe.learn_bpe_batched(df, n_merges=8, batch=batch)
        want = _mirror_learn_batched(TEXTS, 8, batch=batch)
        assert got == want, batch
        assert len(got) == 8


def test_learn_bpe_batched_disjoint_equals_sequential(spark):
    """On a corpus whose top pairs are pairwise symbol-disjoint, one
    batched round IS the sequential result — the documented
    non-interaction guarantee."""
    # (a,a)/(b,b)/(c,c)/(d,d) each count 15 and share no symbol — the
    # (x,</w>) pairs are far below at 5 so the marker never interacts
    texts = ["aaaa bbbb cccc dddd " * 5]
    df = spark.createDataFrame([(1, texts[0])], "doc_id long, text string")
    seq = bpe.learn_bpe(df, n_merges=4)
    bat = bpe.learn_bpe_batched(df, n_merges=4, batch=4)
    assert set(bat) == set(seq) and len(bat) == 4


def test_select_batch_blocks_interacting_pairs():
    """A pair sharing a part or colliding with a fused symbol must wait
    for the next round."""
    cand = [("a", "b", 10), ("b", "c", 9), ("c", "d", 8), ("ab", "x", 7)]
    # ('b','c') shares 'b'; ('ab','x') collides with fused 'ab'
    assert bpe.select_batch(cand, 4) == [("a", "b"), ("c", "d")]


def test_apply_bpe_marker_fused_words_count_one_token(spark):
    """Token accounting with marker-fusing merges (r9 fix): a word fully
    fused into one '<word></w>' symbol is ONE token, never zero; both
    lanes agree; and the auto cutoff routes >40-merge tables away from
    the expression lane's analyzer cliff (maxIterations at 48 nested
    transforms)."""
    df = spark.createDataFrame([(0, "in in out")], "doc_id long, text string")
    # fully fuse 'in': i+n -> in, in+</w> -> in</w>
    merges = [("i", "n"), ("in", bpe.END)]
    for eng in ("expr", "pandas"):
        r = bpe.apply_bpe(df, merges, engine=eng).collect()[0]
        # 'in' -> 1 token (fused with marker), 'out' -> 3 bare chars
        assert (r.n_words, r.n_bpe_tokens) == (3, 5), eng
    # a >40-entry table must run (pandas route), not die in analysis
    big = merges + [(f"zz{i}", f"qq{i}") for i in range(50)]
    r = bpe.apply_bpe(df, big, engine="auto").collect()[0]
    assert (r.n_words, r.n_bpe_tokens) == (3, 5)
