"""Declared domain schemas: construct, round-trip, never inferred."""

from __future__ import annotations

from epicsarchiver_spark.schemas import DOMAIN_SCHEMAS, empty_frame, read_domain_table


def test_empty_frames_have_declared_types(spark):
    for table, schema in DOMAIN_SCHEMAS.items():
        df = empty_frame(spark, table)
        assert df.schema == schema, table
        assert df.count() == 0


def test_declared_read_round_trip(spark, tmp_path):
    import pandas as pd

    path = str(tmp_path / "pairs")
    spark.createDataFrame(
        pd.DataFrame({"id": [1], "pv1": ["A"], "pv2": ["B"], "score": [10]}),
        schema=DOMAIN_SCHEMAS["pairs"],
    ).write.parquet(path)
    back = read_domain_table(spark, "pairs", path)
    assert back.schema == DOMAIN_SCHEMAS["pairs"]
    assert back.head().score == 10
