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
