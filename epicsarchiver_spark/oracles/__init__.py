"""DuckDB oracle SQL for every driver-gate query — the data half of
the former __spark_entry__.py monolith (VERDICT r9 task 9), split per
gate family (VERDICT r10 task 8: the single oracles.py had grown to
~5.9k lines). Each entry is the ANSI-SQL statement the driver runs
side-by-side with the Spark query of the same key at sf=0.01; column
names/aliases MUST match the Spark side exactly (the driver sorts
columns by name before hashing).

Family modules each expose ``build(o)``; ``oracle_sql()`` composes
them. Support helpers a family needs are duplicated into its module
verbatim (pure string builders — cheap), keeping every module
self-contained and under ~2k lines.

Pure data: importing this package starts no SparkSession."""

from __future__ import annotations

from epicsarchiver_spark.oracles import (
    _doc_dedup,
    _doc_text,
    _emb,
    _ev,
    _misc,
    _rel,
    _ts,
)


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    _ts.build(o)
    _doc_dedup.build(o)
    _doc_text.build(o)
    _emb.build(o)
    _rel.build(o)
    _ev.build(o)
    _misc.build(o)
    return o
