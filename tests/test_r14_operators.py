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


# ---------------------------------------- iterative-loop job barriers


class _NoDriverActions:
    """Context manager that pins 'no separate per-round driver action':
    every DataFrame action that the r13 loops used for convergence /
    lane statistics (count, head, collect, take) RAISES if called, and
    lineage truncations are counted. Job counts are useless here — AQE
    legitimately splits one action into many stage-materialization jobs
    — but an operator calling .count()/.head() mid-loop is exactly the
    extra job barrier VERDICT r13 items 1/3 banned, and it is visible
    at the API layer."""

    def __init__(self):
        self.truncations = 0

    def __enter__(self):
        from pyspark.sql import DataFrame

        from epicsarchiver_spark.operators import dedup

        self._df = DataFrame
        self._orig = {n: getattr(DataFrame, n) for n in ("count", "head", "collect", "take")}
        self._dedup = dedup
        self._orig_trunc = dedup._truncate_lineage

        def forbid(name):
            def fn(*a, **k):
                raise AssertionError(f"driver action DataFrame.{name} inside the loop")

            return fn

        for n in self._orig:
            setattr(DataFrame, n, forbid(n))

        def counting_trunc(df):
            self.truncations += 1
            return self._orig_trunc(df)

        dedup._truncate_lineage = counting_trunc
        return self

    def __exit__(self, *exc):
        for n, f in self._orig.items():
            setattr(self._df, n, f)
        self._dedup._truncate_lineage = self._orig_trunc
        return False


def test_star_cc_no_per_round_driver_action(spark):
    """r14 (VERDICT r13 item 3): the star-CC convergence fingerprint is
    OBSERVED during the round's checkpoint materialization — no
    per-round count/head action remains (the second sequential job the
    r13 driver measured as the 32-core wall on doc_dedup_shards). A
    12-node path cannot converge in 3 rounds, so max_iter=3 pins the
    round count; truncations: 1 (edge list) + 3 (one per round)."""
    from epicsarchiver_spark.operators.dedup import connected_components_star

    pairs = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(11)], columns=["id_a", "id_b"])
    )
    with _NoDriverActions() as guard:
        connected_components_star(pairs, max_iter=3)
    assert guard.truncations == 4


def test_propagation_cc_no_per_round_driver_action(spark):
    """Same pin for the propagation loop: the convergence sum rides the
    checkpoint job's accumulators (Dataset.observe), never a separate
    .agg().head() action."""
    from epicsarchiver_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(7)], columns=["id_a", "id_b"])
    )
    with _NoDriverActions():
        connected_components(pairs, max_iter=2)


def test_pagerank_no_pre_round_count_job(spark):
    """r14 (VERDICT r13 item 1): the lane pick is observed on the
    out-weight aggregate during the edge-list checkpoint and round 1
    folds r0 = scale into the edge frame — no initial-rank frame
    truncation, no pre-round .count(). Truncations for rounds=8 with
    cadence 4: 1 (edge list) + 2 (checkpoints at rounds 4 and 8);
    r13 paid 5 (initial-ranks truncate + count, per-round barriers)."""
    from epicsarchiver_spark.operators.related import pagerank

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("a", "b", 4.0), ("b", "c", 2.0), ("c", "d", 3.0)],
            columns=["pv1", "pv2", "score"],
        )
    )
    with _NoDriverActions() as guard:
        pagerank(edges, rounds=8)
    assert guard.truncations == 3


def test_pagerank_round1_fold_matches_mirror(spark):
    """rounds=1 exercises ONLY the r14 r0-fold path (no rank join at
    all) — pin it against the literal integer-recurrence mirror."""
    from epicsarchiver_spark.operators.related import pagerank

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("A", "B", 1.0), ("B", "C", 3.0), ("C", "D", 1.0)],
            columns=["pv1", "pv2", "score"],
        )
    )
    scale, base = 10**9, (15 * 10**9) // 100
    w = {("A", "B"): 1, ("B", "C"): 3, ("C", "D"): 1}
    adj: dict = {}
    for (u, v), ww in w.items():
        adj.setdefault(u, {})[v] = ww
        adj.setdefault(v, {})[u] = ww
    wt = {u: sum(nb.values()) for u, nb in adj.items()}
    c = {u: 0 for u in adj}
    for u, nb in adj.items():
        for v, ww in nb.items():
            c[v] += (scale * ww) // wt[u]
    expect = {u: base + (85 * c[u]) // 100 for u in adj}
    got = {r.pvname: r.rank_units for r in pagerank(edges, rounds=1).collect()}
    assert got == expect
