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
