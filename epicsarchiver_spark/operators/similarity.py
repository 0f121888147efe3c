"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline — one scan, JVM-side
  arithmetic (zip_with/aggregate), a top-k sort on the score. At cluster
  scale this is a full scan but embarrassingly parallel; Spark's
  TakeOrderedAndProject keeps only k rows per partition.
- LSH-bucketed variant (random hyperplane signs): candidates restricted to
  the probe's hamming-adjacent buckets — the scale path that avoids
  scanning every vector when the corpus no longer fits a scan budget.
- IVF-style variant: coarse k-means-ish centroid assignment via a small
  broadcast centroid table; probes search only the nearest n_probe cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epicsarchiver_spark.functions.vector import as_double, cosine


def brute_force_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. Deterministic
    tie-break on id. Scores computed in double; optional rounding for
    cross-engine comparisons."""
    q = F.array(*[F.lit(float(x)) for x in query])
    score = cosine(as_double(F.col(vec_col)), q)
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        vectors.select(F.col(id_col), score.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs probe→corpus top-k (broadcast the probe side). The probe
    table is assumed small (queries); corpus side streams."""
    corpus = vectors.select(
        F.col(id_col).alias("corpus_id"), as_double(F.col(vec_col)).alias("cv")
    )
    probe = F.broadcast(
        probes.select(F.col(id_col).alias("probe_id"), as_double(F.col(vec_col)).alias("pv"))
    )
    scored = corpus.crossJoin(probe).filter(F.col("corpus_id") != F.col("probe_id"))
    scored = scored.select(
        "probe_id", "corpus_id", cosine(F.col("cv"), F.col("pv")).alias("cosine_sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("cosine_sim").desc(), F.col("corpus_id"))
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def cosine_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.38,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine(a, b) >= threshold. The brute-force baseline for the dedup
    surface (brief: 'embedding-cosine near-dup') — an O(n²) theta-join that
    Spark executes as a broadcast nested-loop when one side is small.

    Scale path: this is the *verifier* semantics; at corpus scale use
    ``cosine_near_duplicates_banded`` (hyperplane-band candidate
    generation, equi-join shuffle instead of n²) and accept banding recall,
    or raise n_planes/bands until the miss rate is acceptable."""
    a = vectors.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_near_duplicates_banded(
    vectors: DataFrame,
    threshold: float = 0.38,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine near-dup at scale: random-hyperplane signature
    split into ``bands`` bit-blocks; candidate pairs share at least one
    block (equi-join on (band_idx, band_bits) — a shuffle join on bucket
    keys, never n²); candidates are then verified with the exact cosine.
    Output ⊆ the exact operator's output; recall governed by
    (n_planes, bands) vs the angle implied by ``threshold``."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bits_per_band = n_planes // bands

    base = vectors.select(F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("v"))
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(F.zip_with(F.col("v"), p, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b)
        sig = sig + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    signed = base.withColumn("sig", sig)

    mask = (1 << bits_per_band) - 1
    banded = signed.select(
        "_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("sig"), i * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("bits"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "v", F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits"))

    left = banded.select(
        F.col("band"), F.col("bits"), F.col("_id").alias("id_a"), F.col("v").alias("va")
    )
    right = banded.select(
        F.col("band"), F.col("bits"), F.col("_id").alias("id_b"), F.col("v").alias("vb")
    )
    cand = (
        left.join(right, ["band", "bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= threshold)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from an LCG —
    reproducible across runs without RNG state."""
    planes, x = [], seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((x / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane signature buckets;
    search only buckets within `max_hamming` bits of the query's bucket.
    Recall/VS-cost dial = (n_planes, max_hamming)."""
    planes = _hyperplanes(len(query), n_planes, seed)

    def signature(vec_col_expr):
        sig = F.lit(0).cast("long")
        for j, plane in enumerate(planes):
            p = F.array(*[F.lit(float(v)) for v in plane])
            d = F.aggregate(
                F.zip_with(vec_col_expr, p, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b
            )
            sig = sig + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        return sig

    q = F.array(*[F.lit(float(x)) for x in query])
    corpus = vectors.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("sig", signature(F.col("v")))
    qsig = corpus.sparkSession.range(1).select(signature(q).alias("qsig"))
    cand = corpus.crossJoin(F.broadcast(qsig)).filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= max_hamming
    )
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col("v"), q), 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-flat ANN: corpus assigned to its nearest of `n_cells` seed
    centroids (deterministic LCG seeds — a stand-in for trained k-means
    centroids, which would come from MLlib KMeans on a sample); the query
    searches the `n_probe` nearest cells. Centroids broadcast; assignment
    is a scan + argmin over a small array, no shuffle until top-k."""
    dim = len(query)
    cents = _hyperplanes(dim, n_cells, seed)
    cent_arr = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in cents])

    def nearest_cell(vexpr):
        dists = F.transform(
            cent_arr,
            lambda c: F.aggregate(
                F.zip_with(vexpr, c, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda a, b: a + b
            ),
        )
        return F.array_position(dists, F.array_min(dists)).cast("int")

    corpus = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    assigned = corpus.withColumn("cell", nearest_cell(F.col("v")))

    import heapq

    qd = [(sum((a - b) ** 2 for a, b in zip(query, c)), i + 1) for i, c in enumerate(cents)]
    probe_cells = [cell for _, cell in heapq.nsmallest(n_probe, qd)]

    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        assigned.filter(F.col("cell").isin(probe_cells))
        .select(F.col(id_col), F.round(cosine(F.col("v"), q), 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
