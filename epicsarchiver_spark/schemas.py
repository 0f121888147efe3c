"""Explicit StructType schemas for the domain tables.

The reference's schema system is fixed DDL (epicsarchiver/schema.py), not
inferred — the engine mirrors that: every domain frame is declared here
and constructed with these types, never schema-inferred (FIXTURES.md
carries the generator notes). Values stay StringType at rest for parity
with the reference's VARCHAR storage (schema.py:22,47-48); typed views
re-impose numeric semantics via functions.scalar.clean_value_num (C4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# epicsarchiver/schema.py:6-19
PV_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("description", StringType()),
        StructField("data_table", StringType()),
        StructField("deadtime", DoubleType()),
        StructField("deadband", DoubleType()),
        StructField("graph_hi", StringType()),
        StructField("graph_lo", StringType()),
        StructField("graph_type", StringType()),  # normal|log|discrete
        StructField("type", StringType()),  # int|double|string|enum
        StructField("active", StringType()),  # yes|no
        StructField("enum_strs", ArrayType(StringType())),  # pvextra C19
    ]
)

# epicsarchiver/schema.py:21-23 (+ engine run partition column)
POINTS_SCHEMA = StructType(
    [
        StructField("pv_id", IntegerType()),
        StructField("time", DoubleType()),  # epoch seconds, <= MAX_EPOCH
        StructField("value", StringType()),  # VARCHAR at rest (parity)
        StructField("run", StringType()),
    ]
)

# epicsarchiver/schema.py:43-53
CACHE_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("pvname", StringType()),
        StructField("type", StringType()),
        StructField("value", StringType()),
        StructField("cvalue", StringType()),  # hformat'd (C6)
        StructField("ts", DoubleType()),
        StructField("active", StringType()),
    ]
)

# epicsarchiver/schema.py:96-104
RUNS_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("db", StringType()),
        StructField("notes", StringType()),
        StructField("start_time", DoubleType()),
        StructField("stop_time", DoubleType()),
    ]
)

# epicsarchiver/schema.py:29-41
ALERTS_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("pvname", StringType()),
        StructField("name", StringType()),
        StructField("mailto", StringType()),
        StructField("mailmsg", StringType()),
        StructField("trippoint", StringType()),
        StructField("timeout", DoubleType()),
        StructField("compare", StringType()),  # eq|ne|le|lt|ge|gt
        StructField("status", StringType()),  # alarm|ok
        StructField("active", StringType()),
    ]
)

# epicsarchiver/schema.py:71-78
PAIRS_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("pv1", StringType()),
        StructField("pv2", StringType()),
        StructField("score", LongType()),
    ]
)

# epicsarchiver/schema.py:88-94
REQUESTS_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("pvname", StringType()),
        StructField("ts", DoubleType()),
        StructField("action", StringType()),  # add|drop|suspend|ignore
    ]
)

DOMAIN_SCHEMAS: dict[str, StructType] = {
    "pv": PV_SCHEMA,
    "points": POINTS_SCHEMA,
    "cache": CACHE_SCHEMA,
    "runs": RUNS_SCHEMA,
    "alerts": ALERTS_SCHEMA,
    "pairs": PAIRS_SCHEMA,
    "requests": REQUESTS_SCHEMA,
}


def empty_frame(spark: SparkSession, table: str) -> DataFrame:
    return spark.createDataFrame([], schema=DOMAIN_SCHEMAS[table])


def read_domain_table(spark: SparkSession, table: str, path: str) -> DataFrame:
    """Read with the DECLARED schema — never inferred."""
    return spark.read.schema(DOMAIN_SCHEMAS[table]).parquet(path)
