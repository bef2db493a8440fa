"""Skew operators: salted plans must produce EXACTLY the plain results."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import skew

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain(spark):
    lineitem = load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "okey")
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "okey")
    plain = lineitem.join(orders.select("okey", "o_orderstatus"), "okey")
    salted = skew.salted_join(lineitem, orders.select("okey", "o_orderstatus"), "okey", buckets=4)
    assert _sorted_rows(salted.select("okey", "l_linenumber", "o_orderstatus")) == \
        _sorted_rows(plain.select("okey", "l_linenumber", "o_orderstatus"))


def test_salted_join_left_outer(spark):
    events = load_table(spark, SF, "events").select(F.col("user_id").alias("k"), "event_id")
    dim = spark.createDataFrame([(13, "x")], "k long, tag string")
    plain = events.join(dim, "k", "left")
    salted = skew.salted_join(events, dim, "k", buckets=3, how="left")
    assert _sorted_rows(salted.select("k", "event_id", "tag")) == \
        _sorted_rows(plain.select("k", "event_id", "tag"))


def test_two_phase_topk_equals_window(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        # total order within key -> deterministic top-k on both paths
        (F.col("l_extendedprice") * 100000 + F.col("l_orderkey")).alias("v"),
    )
    got = skew.two_phase_topk(li, key="l_suppkey", order_by="v", k=3, buckets=4)
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("v"))
    want = (
        li.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= 3)
    )
    cols = ["l_suppkey", "l_orderkey", "l_linenumber", "rank"]
    assert _sorted_rows(got.select(*cols)) == _sorted_rows(want.select(*cols))


def test_salted_distinct_count_exact(spark):
    events = load_table(spark, SF, "events")
    got = skew.salted_distinct_count(events, key="event_type", value="user_id", buckets=8)
    want = events.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_distinct"))
    assert _sorted_rows(got) == _sorted_rows(want)


def test_two_phase_topk_plan_has_no_global_hot_partition(spark):
    import contextlib, io

    li = load_table(spark, SF, "lineitem")
    df = skew.two_phase_topk(li, key="l_returnflag", order_by="l_extendedprice", k=2, buckets=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    # the first (sharded) window partitions by (key, salt), so the hot
    # key never lands in a single sort
    assert "__salt" in buf.getvalue()
