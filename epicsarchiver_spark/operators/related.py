"""Related-item ("pairs") graph operators — SURVEY §2 J5/A3/A4/O3/U2/U3.

The reference keeps a weighted undirected edge table ``pairs(pv1, pv2,
score)`` (epicsarchiver/schema.py:71-78) with reversed/duplicate rows
deduped by canonicalize+max (cache.py:804-835) and neighbor queries as a
two-direction union + top-k (cache.py:785-802). Here the edge table is any
DataFrame (a, b, score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_pairs(edges: DataFrame, a: str = "pv1", b: str = "pv2", score: str = "score") -> DataFrame:
    """A3 — canonicalize edge direction and dedupe duplicate/reversed rows
    keeping the max score (ref epicsarchiver/cache.py:804-835
    get_pair_score: sorted([pv1,pv2]) + max over duplicates).

    least/greatest + hash aggregate: one shuffle on the canonical key,
    map-side partial max."""
    return (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("pv1"),
            F.greatest(F.col(a), F.col(b)).alias("pv2"),
            F.col(score).alias("score"),
        )
        .groupBy("pv1", "pv2")
        .agg(F.max("score").alias("score"))
    )


def neighbors(edges: DataFrame, node: str, a: str = "pv1", b: str = "pv2", score: str = "score") -> DataFrame:
    """J5/U2 — all neighbors of `node`: forward ∪ reverse edges, max score
    per neighbor (ref epicsarchiver/cache.py:785-802 get_related_pvs)."""
    fwd = edges.filter(F.col(a) == node).select(F.col(b).alias("pvname"), F.col(score).alias("score"))
    rev = edges.filter(F.col(b) == node).select(F.col(a).alias("pvname"), F.col(score).alias("score"))
    return fwd.unionByName(rev).groupBy("pvname").agg(F.max("score").alias("score"))


def related_topk(edges: DataFrame, node: str, k: int = 20, **kw) -> DataFrame:
    """O3 — top-k related by score desc (ref epicsarchiver/cache.py:796-802
    limit 20; webapp.py:422-431 top-5 per plotted PV). Deterministic
    tie-break on name so limits are stable across engines."""
    return neighbors(edges, node, **kw).orderBy(F.col("score").desc(), F.col("pvname")).limit(k)


def score_sums(edges: DataFrame, nodes: list[str]) -> DataFrame:
    """A4 — accumulate scores of everything related to a *set* of nodes,
    globally ordered (ref epicsarchiver/webapp.py:419-445: related_work
    dict summing scores across plotted PVs)."""
    canon = canonical_pairs(edges)
    fwd = canon.filter(F.col("pv1").isin(nodes)).select(F.col("pv2").alias("pvname"), "score")
    rev = canon.filter(F.col("pv2").isin(nodes)).select(F.col("pv1").alias("pvname"), "score")
    return (
        fwd.unionByName(rev)
        .filter(~F.col("pvname").isin(nodes))
        .groupBy("pvname")
        .agg(F.sum("score").alias("total_score"))
        .orderBy(F.col("total_score").desc(), F.col("pvname"))
    )


# Broadcast-vs-shuffle crossover for pagerank's per-round rank join,
# in NODES. SCALE r12c measured the co-partitioned shuffle lane already
# cheaper at 10⁶ nodes (5.7 vs 7.9 s/round) while broadcast is ~10×
# faster at the dimension-sized 10⁴–10⁵ range (sf0.1): re-broadcasting
# a node-sized frame every round costs more than exchanging it once.
# 2·10⁵ splits the measured decade geometrically-ish while keeping the
# broadcast frame ≤ ~5 MB (16 B/node) — far under the memory wall, by
# design: the switch is sized by when shuffle WINS, not by when the
# broadcast OOMs.
PAGERANK_BROADCAST_MAX_NODES = 200_000

# Checkpoint the rank frame every Nth power-iteration round (plus the
# final round) instead of every round. Eager checkpoints are sequential
# materialization barriers — each one is its own job — and at the
# dimension-sized rank frame the per-job fixed cost dominates the
# per-round work, while a 4-deep nested plan is still far from the
# doubling-analysis-cost wall that made per-round truncation necessary
# in the first place (the cadence keeps lineage depth ≤ 4 regardless of
# total rounds, so the bound is unchanged at any scale). Interleaved
# same-JVM A/B at sf0.1, idle machine, outputs proven identical:
# every-1 9.21 s / every-2 7.66 s / every-4 6.93 s median; every-8 was
# no faster than every-4 on a second run and gives up the depth bound.
PAGERANK_CKPT_EVERY = 4


def _pagerank_use_broadcast(n_nodes: int) -> bool:
    """Lane decision for :func:`pagerank`'s per-round rank join (pure
    arithmetic, unit-pinned in tests/test_r13_operators.py): broadcast
    while the rank frame is dimension-sized, degrade to the
    co-partitioned shuffle beyond the measured crossover."""
    return int(n_nodes) <= PAGERANK_BROADCAST_MAX_NODES


def pagerank(
    edges: DataFrame,
    rounds: int = 8,
    scale: int = 10**9,
    a: str = "pv1",
    b: str = "pv2",
    score: str = "score",
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """Global centrality over the undirected pairs graph — "which PVs
    (or documents) sit at the center of the relatedness structure".
    The reference ranks neighbors per node (get_related_pvs); this is
    the corpus-wide companion the webapp's 'related work' view implies:
    weighted PageRank with damping 0.85 over the canonicalized edge
    table, run a FIXED number of power-iteration rounds.

    Every quantity is fixed-point int64 (``scale`` units = rank 1.0)
    and the recurrence uses only integer multiply / floor-divide:

        r0(v)    = scale
        r_k+1(v) = (15·scale) DIV 100
                   + (85 · Σ_{u~v} (r_k(u) · w(u,v) DIV W(u))) DIV 100

    so every engine reproduces every round bit-for-bit — no
    summation-order slack, ever. Weights quantize to integer CENTS
    (sub-unit scores like cosines would truncate to zero under a bare
    cast, and a zero out-weight would null-poison the DIV); edges with
    non-positive quantized weight drop. Overflow budget: r ≤ Σr ≈
    N·scale, so N·(100·w_max)·scale must stay < 2⁶³ ≈ 9.2e18; the
    default scale=1e9 is exact to N·w_max ≈ 9.2e7 — at a 100 TB graph
    drop scale to 1e6 (the same dial as ``similarity.gram_matrix``).

    Scale shape: the weighted edge list materializes ONCE
    (lineage-truncated); per round the node-sized rank frame BROADCASTS
    into a map-side hash join over it (the edges never re-shuffle) and
    the only exchange is the dst-keyed partial aggregate, whose
    map-side combine reduces to ≤ nodes rows per partition. In an
    undirected graph every node receives ≥1 contribution row (it is a
    dst of each incident edge), so no per-round spine re-join is needed
    — each round is exactly join + aggregate, and the tiny rank frame
    is checkpointed on a fixed cadence (``PAGERANK_CKPT_EVERY``, plus
    the final round) so the plan never nests more than that many rounds
    deep (unbounded nesting made the rounds serialize into one long
    final job — 6 s vs 0.6 s/round at sf0.1 — while per-round eager
    checkpoints paid a sequential job barrier each: 9.2 s vs 6.9 s for
    the cadence, outputs identical). The crossover comes
    EARLIER than the broadcast memory wall — measured at 10⁶ nodes /
    10⁷ edges (SCALE r12c) the shuffle lane is already the cheaper one
    (5.7 vs 7.9 s/round on local[32]): re-broadcasting a node-sized
    frame every round costs more than exchanging it once. Broadcast is
    the right lane only while the rank frame is dimension-sized
    (≲10⁵ nodes — the sf0.1 graph).

    ``broadcast_ranks=None`` (default) therefore AUTO-SELECTS: the
    node count is OBSERVED on the out-weight aggregate while the edge
    list materializes (``Dataset.observe`` — one row per src IS the
    node count, collected by accumulator during the checkpoint job),
    so the pick costs zero extra jobs; the lane is broadcast iff
    nodes ≤ ``PAGERANK_BROADCAST_MAX_NODES`` (the r12c crossover,
    sized by when shuffle WINS, not by when the broadcast OOMs; SCALE
    r13a re-measures both sides of the boundary through the auto
    pick). Pass True/False to override — the probes' and tests'
    pin-one-lane dial. (r13 paid a pre-round checkpoint + count() of
    the distinct-src rank frame for this — two extra sequential jobs
    the driver measured at ~2.5 s of the gate; r14 removes both: the
    initial rank frame itself is gone, because round 1's recurrence
    reads r0(u) = scale — a constant the first join folds to.)
    Weights fold in exact integer cents; canonical dedup
    (least/greatest + max) runs once up front.
    """
    from pyspark.sql import Observation

    from epicsarchiver_spark.operators.dedup import _truncate_lineage

    canon = canonical_pairs(edges, a, b, score)
    # integer-CENT weights (sub-unit scores like cosine similarities
    # would truncate to 0 under a bare cast — a zero out-weight then
    # null-poisons the DIV); non-positive edges drop explicitly
    wq = F.round(F.col("score") * 100).cast("long")
    both = (
        canon.select(
            F.col("pv1").alias("src"), F.col("pv2").alias("dst"), wq.alias("w")
        )
        .unionByName(
            canon.select(
                F.col("pv2").alias("src"), F.col("pv1").alias("dst"), wq.alias("w")
            )
        )
        .filter(F.col("w") > 0)
    )
    wout = both.groupBy("src").agg(F.sum("w").alias("wt"))
    obs = None
    if broadcast_ranks is None and int(rounds) >= 2:
        # wout has exactly one row per node — count it as it flows into
        # the join, inside the same checkpoint job (guide §1/§2.5: no
        # separate driver action for a statistic the running job already
        # computes). Rounds 0/1 never join a rank frame, so no pick.
        obs = Observation()
        wout = wout.observe(obs, F.count(F.lit(1)).alias("n"))
    g = _truncate_lineage(both.join(wout, "src"))
    base = (15 * int(scale)) // 100
    if int(rounds) <= 0:
        ranks = _truncate_lineage(
            g.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("r", F.lit(int(scale)).cast("long"))
        )
        return ranks.select(
            F.col("id").alias("pvname"),
            F.col("r").alias("rank_units"),
            F.round(F.col("r") / float(scale), 6).alias("rank"),
        )
    if obs is not None:
        broadcast_ranks = _pagerank_use_broadcast(obs.get["n"])
    ranks = None
    for i in range(int(rounds)):
        if i == 0:
            # r0(u) = scale for every node: the rank join of round 1
            # folds to a constant column — no initial rank frame, no
            # join, same integer arithmetic (`r * w DIV wt` with
            # r = scale), bit-identical to joining the all-scale frame
            contrib = (
                g.withColumn("r", F.lit(int(scale)).cast("long"))
                .select(F.col("dst").alias("id"), F.expr("r * w DIV wt").alias("c"))
                .groupBy("id")
                .agg(F.sum("c").alias("c"))
            )
        else:
            rk = F.broadcast(ranks) if broadcast_ranks else ranks
            contrib = (
                g.join(rk, g["src"] == ranks["id"])
                .select(F.col("dst").alias("id"), F.expr("r * w DIV wt").alias("c"))
                .groupBy("id")
                .agg(F.sum("c").alias("c"))
            )
        ranks = contrib.select(
            "id",
            (F.lit(base) + F.expr("85 * c DIV 100")).cast("long").alias("r"),
        )
        # every checkpoint is a sequential job barrier — truncate on a
        # cadence (see PAGERANK_CKPT_EVERY), always including the final
        # round so callers receive a materialized 16-byte-per-node frame
        if (i + 1) % PAGERANK_CKPT_EVERY == 0 or i == int(rounds) - 1:
            ranks = _truncate_lineage(ranks)
    return ranks.select(
        F.col("id").alias("pvname"),
        F.col("r").alias("rank_units"),
        F.round(F.col("r") / float(scale), 6).alias("rank"),
    )
