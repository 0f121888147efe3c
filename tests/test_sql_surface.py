"""The engine's SQL surface: register_views + spark.sql over the driver
tables — users can query the same catalog in pure SQL."""

from __future__ import annotations

from epicsarchiver_spark.catalog import TABLES, register_views
from tests.conftest import SF_SMOKE


def test_register_views_and_sql(spark):
    register_views(spark, SF_SMOKE)
    for t in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").head().n > 0

    got = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        ORDER BY n DESC, c_mktsegment
        """
    ).collect()
    assert len(got) >= 3 and got[0].n >= got[-1].n


def test_sql_over_points_view(spark):
    from epicsarchiver_spark.catalog import points_view

    points_view(spark, SF_SMOKE).createOrReplaceTempView("points")
    r = spark.sql(
        "SELECT count(DISTINCT pvname) AS n_series, min(time) AS t0 FROM points"
    ).head()
    assert r.n_series > 0 and r.t0 > 1.7e9
