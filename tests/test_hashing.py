"""The Arrow-vectorized MinHash/SimHash fast paths must agree exactly
with the pure-expression reference formulations."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from epicsarchiver_spark.functions.hashing import (
    hashed_shingles,
    minhash_signature,
    minhash_signature_udf,
    simhash64,
    simhash64_udf,
)
from epicsarchiver_spark.functions.text import word_shingles

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely different content here entirely",
    "",  # empty → sentinel signature
    "single",
]


def _base(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}))
    return df.select(
        "doc_id", hashed_shingles(word_shingles(F.col("text"), 2)).alias("bh")
    )


def test_minhash_udf_matches_expression(spark):
    base = _base(spark)
    expr = {
        r.doc_id: list(r.sig)
        for r in base.select("doc_id", minhash_signature(F.col("bh"), 16, 42).alias("sig")).collect()
    }
    udf = {
        r.doc_id: list(r.sig)
        for r in base.select(
            "doc_id", minhash_signature_udf(16, 42)(F.col("bh")).alias("sig")
        ).collect()
    }
    assert expr == udf


def test_simhash_udf_matches_expression(spark):
    base = _base(spark)
    expr = {r.doc_id: r.sh for r in base.select("doc_id", simhash64(F.col("bh")).alias("sh")).collect()}
    udf = {
        r.doc_id: r.sh
        for r in base.select("doc_id", simhash64_udf()(F.col("bh")).alias("sh")).collect()
    }
    assert expr == udf


def test_shingle_hashes_matches_string_shingles_cardinality(spark):
    """The string-free sliding combine must produce one distinct hash per
    distinct word shingle (no spurious collisions on real-ish text), and
    be order-sensitive."""
    from epicsarchiver_spark.functions.hashing import shingle_hashes
    from epicsarchiver_spark.functions.text import tokens

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    got = df.select(
        "doc_id",
        F.size(shingle_hashes(tokens(F.col("text")), 2)).alias("n_hash"),
        F.size(F.array_distinct(word_shingles(F.col("text"), 2))).alias("n_str"),
    ).collect()
    assert all(r.n_hash == r.n_str for r in got)

    ab = spark.createDataFrame(pd.DataFrame({"text": ["a b", "b a"]}))
    h = [r.h[0] for r in ab.select(shingle_hashes(tokens(F.col("text")), 2).alias("h")).collect()]
    assert h[0] != h[1]


def test_similar_docs_high_estimated_jaccard(spark):
    from epicsarchiver_spark.operators.dedup import minhash_candidates

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}))
    cands = {(r.id_a, r.id_b): r.est_jaccard for r in minhash_candidates(df).collect()}
    assert (0, 1) in cands and cands[(0, 1)] > 0.5  # one-word difference


def test_md5_basis_matches_python_reference(spark):
    """basis="md5": the 60-bit token hash, the two-lane k-shingle fold,
    and the affine-mod-p MinHash family must match an independent
    pure-python recompute bit-for-bit — the property the DuckDB oracle
    relies on."""
    import hashlib

    from epicsarchiver_spark.functions.hashing import (
        LANE_MASK,
        MERSENNE31,
        P30_HI,
        P30_LO,
        R_HI,
        R_LO,
        affine31_params,
        md5_hash60,
        minhash_signature_udf,
        shingle_hashes_md5,
    )
    from epicsarchiver_spark.functions.text import tokens

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}))
    got = {
        r.doc_id: r.h
        for r in df.select("doc_id", md5_hash60(F.col("text")).alias("h")).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == int(hashlib.md5(t.encode()).hexdigest()[:15], 16)

    def py_shingles(t: str, k: int) -> list[int]:
        th = [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in t.split() if w]
        lo = [h & LANE_MASK for h in th]
        hi = [h >> 30 for h in th]
        out = []
        for j in range(len(th) - k + 1):
            al, ah = lo[j], hi[j]
            for s in range(1, k):
                al = (al * R_LO + lo[j + s]) % P30_LO
                ah = (ah * R_HI + hi[j + s]) % P30_HI
            out.append(al + (ah << 30))
        seen, dedup = set(), []
        for h in out:
            if h not in seen:
                seen.add(h)
                dedup.append(h)
        return dedup

    for k in (2, 3):
        base = df.select(
            "doc_id", shingle_hashes_md5(tokens(F.col("text")), k).alias("bh")
        )
        engine = {r.doc_id: list(r.bh) for r in base.collect()}
        for i, t in enumerate(TEXTS):
            assert engine[i] == py_shingles(t, k), f"doc {i} k={k}"

    # affine signature over the md5 basis vs python
    base = df.select("doc_id", shingle_hashes_md5(tokens(F.col("text")), 2).alias("bh"))
    sigs = {
        r.doc_id: list(r.sig)
        for r in base.select(
            "doc_id", minhash_signature_udf(16, 42, family="affine31")(F.col("bh")).alias("sig")
        ).collect()
    }
    params = affine31_params(16, 42)
    for i, t in enumerate(TEXTS):
        hs = py_shingles(t, 2)
        if not hs:
            expect = [MERSENNE31] * 16
        else:
            expect = [
                min((a * (h % MERSENNE31) + b) % MERSENNE31 for h in hs) for a, b in params
            ]
        assert sigs[i] == expect, f"doc {i}"


def test_minhash_signature_table_reuse(spark, tmp_path):
    """The production shape: write the signature table once, read it back,
    feed it to both the self-join and the incremental between-crawls
    candidate generators — results identical to the inline path and the
    corpus text is never re-read."""
    from epicsarchiver_spark.operators.dedup import (
        minhash_candidates,
        minhash_candidates_between,
        minhash_signatures,
    )

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}))
    sig_path = str(tmp_path / "sigs")
    minhash_signatures(df, shingle_k=2).write.parquet(sig_path)
    stored = spark.read.parquet(sig_path)

    inline = sorted(
        (r.id_a, r.id_b, r.est_jaccard)
        for r in minhash_candidates(df, shingle_k=2).collect()
    )
    reused = sorted(
        (r.id_a, r.id_b, r.est_jaccard)
        for r in minhash_candidates(None, signatures=stored).collect()
    )
    assert inline == reused and inline

    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [TEXTS[0]]})
    )
    between = minhash_candidates_between(
        new, None, shingle_k=2, corpus_signatures=stored
    ).collect()
    assert {(r.new_id, r.corpus_id) for r in between} >= {(100, 0)}
    exact = [r for r in between if r.new_id == 100 and r.corpus_id == 0]
    assert exact[0].est_jaccard == 1.0


def test_winnow_fingerprint_table_reuse(spark, tmp_path):
    """Mirror of the MinHash signatures= contract for winnowing: write
    the fingerprint table once, read it back, feed winnow_matches —
    identical pairs to the inline path, and the corpus text is never
    re-read (no 8-10 s fingerprint rebuild per query)."""
    from epicsarchiver_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_matches,
    )

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}))
    fp_path = str(tmp_path / "fps")
    winnow_fingerprints(df, k=2, w=2).write.parquet(fp_path)
    stored = spark.read.parquet(fp_path)

    inline = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_matches(df, min_shared=1, k=2, w=2).collect()
    )
    reused = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_matches(None, min_shared=1, fingerprints=stored).collect()
    )
    assert inline == reused and inline
