"""Round-14 optimization tests: the private_persist privacy invariant
(ADVICE r13 — the mechanism silently breaks if a future Spark version
normalizes trivially-true literal filters before cache lookup, re-opening
the r13 stale-read bug), and the hardened SQ8 stage-1 Arrow key
(null/empty degradation, contract-violation errors, single-evaluation
plan pin per guide §4.4)."""

from __future__ import annotations

import pandas as pd
import pytest


# ------------------------------------------------- private_persist

def test_private_persist_not_matchable_by_bare_same_path_read(spark, tmp_path):
    """The invariant the r13 cache-poisoning fix rests on: a bare
    spark.read of the SAME path must NOT be served a private_persist
    entry — after an out-of-band file swap (the CLI's two-rename shape,
    no Spark-side invalidation) the fresh read returns the new rows
    while the held frame still serves its cached ones."""
    import shutil

    from epicsarchiver_spark.operators.dedup import private_persist

    p = str(tmp_path / "tbl")
    spark.range(0, 5).toDF("v").write.parquet(p)
    held = private_persist(spark.read.parquet(p))
    assert held.count() == 5  # materialize the cache entry

    swap = str(tmp_path / "tbl_new")
    spark.range(10, 17).toDF("v").write.parquet(swap)
    shutil.rmtree(p)
    shutil.move(swap, p)

    fresh = {r.v for r in spark.read.parquet(p).collect()}
    assert fresh == set(range(10, 17)), "bare same-path read hit the private entry"
    assert held.count() == 5, "the held frame lost its cached rows"
    held.unpersist()


# ------------------------------------------------- SQ8 stage-1 key UDF

def _key_rows(spark, qq, rows):
    from epicsarchiver_spark.operators.similarity import _sq8_key_udf

    # one partition → one Arrow batch, so intra-batch checks (ragged
    # rows) are actually exercised rather than split across batches
    df = spark.createDataFrame(rows, "vec_id long, qvec string").coalesce(1)
    return {
        r.vec_id: r.k
        for r in df.select("vec_id", _sq8_key_udf(qq)("qvec").alias("k")).collect()
    }


def test_sq8_key_udf_null_and_empty_rows_rank_last(spark):
    """quantize_embeddings can emit '' (empty embedding) and null (null
    embedding); the vectorized key must degrade them to −2.0 — ranked
    below any cosine, like the pre-Arrow SQL fold — instead of crashing
    the stage on the join/reshape (ADVICE r13)."""
    import math

    qq = [3, -2, 5]
    got = _key_rows(
        spark,
        qq,
        [(0, "1,2,3"), (1, None), (2, ""), (3, "0,0,0"), (4, "-4,0,1")],
    )
    assert got[1] == -2.0 and got[2] == -2.0 and got[3] == -2.0
    assert got[0] == (1 * 3 + 2 * -2 + 3 * 5) / math.sqrt(1 + 4 + 9)
    assert got[4] == (-4 * 3 + 0 + 1 * 5) / math.sqrt(16 + 0 + 1)


def test_sq8_key_udf_contract_violations_raise(spark):
    """Ragged rows and query-width mismatches are artifact-contract
    violations — they must fail loudly with the widths in the message,
    not silently mis-reshape the code matrix."""
    with pytest.raises(Exception, match="ragged qvec rows"):
        _key_rows(spark, [1, 2, 3], [(0, "1,2,3"), (1, "1,2")])
    with pytest.raises(Exception, match="width"):
        _key_rows(spark, [1, 2], [(0, "1,2,3"), (1, "4,5,6")])


def test_sq8_stage1_exactly_one_arrow_eval(spark):
    """Guide §4.4: the stage-1 key is marked non-deterministic so the
    optimizer cannot duplicate the GEMM into a pushed-down sort key —
    the candidate plan must contain exactly ONE ArrowEvalPython node."""
    from pyspark.sql import functions as F

    from epicsarchiver_spark.operators.similarity import (
        _sq8_key_udf,
        quantize_embeddings,
    )

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(8),
                "embedding": [[float(i + j) for j in range(4)] for i in range(8)],
            }
        )
    )
    art = quantize_embeddings(emb)
    cand = (
        art.select("vec_id", _sq8_key_udf([1, 2, 3, 4])("qvec").alias("_a"))
        .orderBy(F.desc("_a"), "vec_id")
        .limit(5)
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
