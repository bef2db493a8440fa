"""SQL-frontend queries: HLL accuracy property + frontend smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.queries.sql_queries import q_approx_distinct

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_rsd(spark):
    got = {r.event_type: r.approx_users for r in q_approx_distinct(spark, SF).collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k in exact:
        # default rsd is 5%; allow 3 sigma
        assert abs(got[k] - exact[k]) <= max(3, 0.15 * exact[k]), (k, got[k], exact[k])


def test_parameterized_sql_binds_safely(spark):
    from providenciasbigdata_spark.io import register_views

    register_views(spark, SF)
    # a would-be injection payload arrives as a harmless string literal
    out = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = :status",
        args={"status": "'; DROP TABLE orders; --"},
    ).collect()
    assert out[0].n == 0
    assert spark.table("orders").count() > 0
