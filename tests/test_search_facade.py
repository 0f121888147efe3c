"""SearchPipeline facade: every method must delegate to the certified
operator — the facade adds handles, never semantics. One end-to-end
index-once / query-many loop plus lane-by-lane equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from epicsarchiver_spark.operators import similarity, text_ops
from epicsarchiver_spark.search import SearchPipeline
from tests.conftest import SF_ORACLE

TERMS = ["spark", "join"]


def _frames(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    return docs, emb, qvec


def test_inline_lanes_delegate_to_operators(spark):
    docs, emb, qvec = _frames(spark)
    sp = SearchPipeline(spark, docs, emb)

    assert sp.bm25(TERMS, k=15).collect() == text_ops.bm25_topk(
        docs, TERMS, k=15
    ).collect()
    assert sp.ann(qvec, k=10, exact=True).collect() == similarity.brute_force_topk(
        emb, qvec, k=10
    ).collect()
    assert sp.expanded(TERMS, k=10).collect() == text_ops.bm25_prf(
        docs, TERMS, k=10
    ).collect()
    assert sp.diversified(qvec, k=5, n_candidates=20).collect() == (
        similarity.mmr_topk(emb, qvec, k=5, n_candidates=20).collect()
    )
    assert sp.seeds(k=4).collect() == similarity.farthest_first_init(
        emb, k=4
    ).collect()
    assert sp.qld(TERMS, k=10).collect() == text_ops.qld_topk(
        docs, TERMS, k=10
    ).collect()
    mq = {"a": TERMS, "b": ["table"]}
    assert sorted(map(tuple, sp.standing(mq, k=5).collect())) == sorted(
        map(tuple, text_ops.bm25_multi(docs, mq, k=5).collect())
    )


def test_index_once_query_many_loop(spark, tmp_path):
    """build_indexes → bm25 reads the postings, ann reads the IVF-PQ
    table; both lanes answer IDENTICALLY to their inline twins."""
    docs, emb, qvec = _frames(spark)
    sp = SearchPipeline(spark, docs, emb)
    path = sp.build_indexes(str(tmp_path / "search_ix"))
    assert sp.indexes == path

    assert sp.bm25(TERMS, k=15).collect() == text_ops.bm25_topk(
        docs, TERMS, k=15
    ).collect()
    want = similarity.ivfpq_topk_rerank(
        emb, qvec, k=10, n_cells=8, n_probe=4
    ).collect()
    assert sp.ann(qvec, k=10).collect() == want

    # hybrid fuses the indexed lexical lane with the exact cosine lane
    fused = sp.hybrid(TERMS, qvec, k=10)
    assert fused.columns == ["doc_id", "n_lanes", "rrf_scaled", "rank"]
    rows = fused.collect()
    assert len(rows) == 10 and rows[0].rank == 1

    # evaluate the semantic lane against label relevance
    lbl0 = emb.filter(F.col("vec_id") == 0).head()["label"]
    rel = emb.filter(F.col("label") == int(lbl0)).select(
        "vec_id", F.lit(1).alias("gain")
    )
    lane = text_ops.ranked_lane(
        sp.ann(qvec, k=10, exact=True), "cosine_sim", id_col="vec_id"
    )
    report = sp.evaluate(lane.select("vec_id", "rank"), rel, k=10, id_col="vec_id").head()
    assert report.k == 10 and 0.0 <= report.ndcg_at_k <= 1.0
