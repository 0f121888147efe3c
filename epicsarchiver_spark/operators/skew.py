"""Skew-mitigation utilities for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these helpers cover the two places AQE can't: a single hot *group*
in an aggregation whose per-group state is large (top-k, collect-style),
and a broadcast-infeasible join against a dimension with a few hot keys.

Salting = spread one logical key over `salt` physical keys, combine
partials. Works for any algebraic aggregate (sum/count/min/max)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(frame: DataFrame, key: str, salt: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Add a random-ish deterministic salt derived from the row content
    (xxhash64 of all columns mod salt) — reproducible, no RNG state."""
    return frame.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in frame.columns]), F.lit(salt)).cast("int")
    )


def salted_agg(
    frame: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: groupBy(key, salt) partials, then
    groupBy(key) combine. ``aggs`` maps output name → (partial_agg_expr,
    combine_agg_expr) where the combine expr references the partial's
    output name.

    Example — skew-safe count+sum:
        salted_agg(df, "k", {
            "n":   (F.count(F.lit(1)),   F.sum("n")),
            "tot": (F.sum("v"),          F.sum("tot")),
        })
    """
    stage1 = (
        salted(frame, key, salt)
        .groupBy(key, "_salt")
        .agg(*[p.alias(name) for name, (p, _) in aggs.items()])
    )
    return stage1.groupBy(key).agg(*[c.alias(name) for name, (_, c) in aggs.items()])


def skew_safe_counts(points: DataFrame, key: str = "pvname", salt: int = 16) -> DataFrame:
    """A1/A8 under a hot series: two-stage count/min/max — identical
    result to the direct aggregate, bounded partition size at any skew."""
    return salted_agg(
        points,
        key,
        {
            "n_points": (F.count(F.lit(1)), F.sum("n_points")),
            "t_first": (F.min("time"), F.min("t_first")),
            "t_last": (F.max("time"), F.max("t_last")),
        },
        salt=salt,
    )
