"""Vector math over array<float> embedding columns — JVM higher-order
functions only (zip_with/aggregate); no UDF, no driver collect. Elements
are cast to double before arithmetic so results are bit-reproducible in the
DuckDB oracle (which computes in double)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _finite(x: float) -> bool:
    return x == x and x not in (float("inf"), float("-inf"))


def lit_double_array(values) -> Column:
    """A constant ``array<double>`` as ONE Literal node, parsed from a
    SQL ``array(…)`` string. Two reasons over ``F.array(*[F.lit(x)…])``:
    the plan gets a single node instead of len(values) CreateArray
    children, and construction is one JVM parse instead of a py4j round
    trip per element (~0.5 ms each — a 2048-wide array costs ~1 s to
    BUILD the slow way, measured). ``repr(float)`` is the shortest
    round-trip decimal, and Java's correctly-rounded parse returns the
    identical IEEE double, so values are bit-exact. Falls back to the
    per-element form if any value is non-finite (no SQL literal)."""
    vals = [float(x) for x in values]
    if not all(_finite(x) for x in vals):
        return F.array(*[F.lit(x) for x in vals])
    return F.expr("array(" + ",".join(f"{x!r}D" for x in vals) + ")")


def lit_long_array(values) -> Column:
    """``lit_double_array`` for a constant ``array<bigint>``."""
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in values) + ")")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
