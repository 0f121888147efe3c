"""Search facade: the retrieval surface as one object, the way
``corpus.CorpusPipeline`` wraps the curation loop. Each method delegates
to a certified operator (operators/text_ops.py, similarity.py) and
returns a DataFrame; the object carries only the handles (docs frame,
embeddings frame, column names, index paths) — no state beyond what a
search deployment keeps anyway.

Intended call pattern (index once, query many):

    sp = SearchPipeline(spark, docs, emb)
    sp.build_indexes("s3://corpus/release-42/search")   # once per release
    sp.bm25(["spark", "join"]).show()                   # lexical lane
    sp.ann(query_vec).show()                            # semantic lane
    sp.hybrid(["spark", "join"], query_vec).show()      # RRF fusion
    sp.diversified(query_vec).show()                    # MMR
    sp.expanded(["spark"]).show()                       # PRF
    sp.evaluate(sp.ann(query_vec), relevant).show()     # nDCG/MRR/P@k
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epicsarchiver_spark.operators import similarity, text_ops


class SearchPipeline:
    """Retrieval surface over a documents frame and its embeddings.

    Parameters
    ----------
    spark : SparkSession
    docs : DataFrame — ``(doc_id, text, ...)``
    embeddings : DataFrame — ``(vec_id, embedding, ...)``; ``vec_id``
        is assumed to share the doc id space (the driver corpus shape).
    indexes : optional path of a ``build_indexes`` output dir — when
        set, the lexical lane reads the persisted BM25 postings and the
        semantic candidate stage reads the persisted IVF-PQ index (the
        steady-state shape: no corpus scan at query time).
    """

    def __init__(
        self,
        spark: SparkSession,
        docs: DataFrame,
        embeddings: DataFrame,
        id_col: str = "doc_id",
        text: str = "text",
        vec_id_col: str = "vec_id",
        vec_col: str = "embedding",
        indexes: str | None = None,
        n_cells: int = 8,
        n_probe: int = 4,
    ) -> None:
        self.spark = spark
        self.docs = docs
        self.embeddings = embeddings
        self.id_col = id_col
        self.text = text
        self.vec_id_col = vec_id_col
        self.vec_col = vec_col
        self.indexes = indexes.rstrip("/") if indexes else None
        self.n_cells = n_cells
        self.n_probe = n_probe

    # --- index build (once per release) -------------------------------
    def build_indexes(self, path: str) -> str:
        """Write the persisted query-time bases: the term-sorted BM25
        postings (+ stats) and the IVF-PQ ``(id, cell, codes)`` table.
        Point ``indexes=`` at the result and every later query is a
        pruned read — the production cadence."""
        path = path.rstrip("/")
        text_ops.build_bm25_index(
            self.docs, f"{path}/bm25", text=self.text, id_col=self.id_col
        )
        dim = len(
            self.embeddings.select(self.vec_col).head()[0]
        )
        cents = similarity._hyperplanes(dim, self.n_cells, 42)
        cells = (
            self.embeddings.select(
                F.col(self.vec_id_col),
                similarity.as_double(F.col(self.vec_col)).alias("_v"),
            )
            .withColumn("cell", similarity._nearest_cell_udf(cents)(F.col("_v")))
            .select(self.vec_id_col, "cell")
        )
        codes = similarity._pq_codes_wide(
            self.embeddings,
            dim=dim,
            id_col=self.vec_id_col,
            vec_col=self.vec_col,
            gemm=True,
        )
        cells.join(codes, self.vec_id_col).write.mode("overwrite").parquet(
            f"{path}/ivfpq"
        )
        self.indexes = path
        return path

    def _ivfpq_index(self) -> DataFrame | None:
        if self.indexes is None:
            return None
        return self.spark.read.parquet(f"{self.indexes}/ivfpq")

    # --- single lanes --------------------------------------------------
    def bm25(self, terms: list[str], k: int = 10) -> DataFrame:
        """Lexical lane — postings-index read when indexed, inline scan
        otherwise."""
        if self.indexes is not None:
            return text_ops.bm25_topk_indexed(
                self.spark, f"{self.indexes}/bm25", terms, k=k
            )
        return text_ops.bm25_topk(
            self.docs, terms, k=k, text=self.text, id_col=self.id_col
        )

    def qld(self, terms: list[str], k: int = 10, mu: float = 2000.0) -> DataFrame:
        """Query-likelihood (Dirichlet) lexical lane — the LM ranker
        beside BM25; inline scan (no postings formulation: every doc
        scores via its length term)."""
        return text_ops.qld_topk(
            self.docs, terms, k=k, mu=mu, text=self.text, id_col=self.id_col
        )

    def ann(self, query: list[float], k: int = 10, exact: bool = False) -> DataFrame:
        """Semantic lane: two-stage IVF-PQ → exact re-rank (persisted
        index when available); ``exact=True`` forces brute-force cosine."""
        if exact:
            return similarity.brute_force_topk(
                self.embeddings, query, k=k, id_col=self.vec_id_col, vec_col=self.vec_col
            )
        return similarity.ivfpq_topk_rerank(
            self.embeddings,
            query,
            k=k,
            id_col=self.vec_id_col,
            vec_col=self.vec_col,
            n_cells=self.n_cells,
            n_probe=self.n_probe,
            index=self._ivfpq_index(),
        )

    # --- composite lanes ------------------------------------------------
    def hybrid(
        self, terms: list[str], query: list[float], k: int = 10, lane_k: int = 50
    ) -> DataFrame:
        """RRF fusion of the lexical and semantic lanes (exact-integer
        contributions — engine-exact fused order)."""
        lex = self.bm25(terms, k=lane_k)
        sem = text_ops.ranked_lane(
            self.ann(query, k=lane_k, exact=True),
            "cosine_sim",
            id_col=self.vec_id_col,
        ).withColumnRenamed(self.vec_id_col, self.id_col)
        return text_ops.rrf_fuse(
            {
                "lex": lex.select(self.id_col, "rank"),
                "sem": sem.select(self.id_col, "rank"),
            },
            k=k,
            id_col=self.id_col,
        )

    def diversified(
        self, query: list[float], k: int = 5, n_candidates: int = 50,
        mmr_lambda: float = 0.5,
    ) -> DataFrame:
        """MMR-diversified top-k over the exact-cosine candidate set."""
        return similarity.mmr_topk(
            self.embeddings,
            query,
            k=k,
            n_candidates=n_candidates,
            mmr_lambda=mmr_lambda,
            id_col=self.vec_id_col,
            vec_col=self.vec_col,
        )

    def expanded(
        self, terms: list[str], k: int = 10, fb_docs: int = 5, fb_terms: int = 3
    ) -> DataFrame:
        """Pseudo-relevance-feedback BM25 (rank → mine → re-rank)."""
        return text_ops.bm25_prf(
            self.docs,
            terms,
            k=k,
            fb_docs=fb_docs,
            fb_terms=fb_terms,
            text=self.text,
            id_col=self.id_col,
        )

    def standing(self, queries: dict[str, list[str]], k: int = 10) -> DataFrame:
        """Q standing queries in one corpus pass (``bm25_multi``) — the
        subscription-server shape."""
        return text_ops.bm25_multi(
            self.docs, queries, k=k, text=self.text, id_col=self.id_col
        )

    # --- quality --------------------------------------------------------
    def evaluate(
        self, ranked: DataFrame, relevant: DataFrame, k: int = 10,
        id_col: str | None = None,
    ) -> DataFrame:
        """precision@k / MRR / nDCG@k of any ranked lane (attach a rank
        with ``text_ops.ranked_lane`` first if the lane is score-only)."""
        return text_ops.retrieval_eval(
            ranked, relevant, k=k, id_col=id_col or self.id_col
        )

    def seeds(self, k: int = 8) -> DataFrame:
        """Farthest-first exemplars over the embedding corpus (k-center
        seeding for ``similarity.kmeans_refine``)."""
        return similarity.farthest_first_init(
            self.embeddings, k=k, id_col=self.vec_id_col, vec_col=self.vec_col
        )
