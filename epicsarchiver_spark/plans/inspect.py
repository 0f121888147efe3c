"""Plan-inspection helpers: assert that the physical plan is the plan you
want — filters pushed to the parquet scan, columns pruned, partitions
pruned. Used by tests/test_plans.py so plan regressions fail CI, not a
100 TB production run."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of column names in every scan's ReadSchema — what actually
    gets read off disk (column pruning check)."""
    text = explain_str(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def scan_partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries (partition pruning check)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (bigger spans = more fused)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
