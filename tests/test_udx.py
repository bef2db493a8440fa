"""UDTF / grouped-agg UDAF surface: sentence-split semantics on
synthetic text; geometric mean vs a hand-computed value."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.udx import geo_mean_udaf, split_sentences


def test_split_sentences_boundaries(spark):
    df = spark.createDataFrame(
        [
            (1, "One sentence. Two!  Three? Trailing"),
            (2, "No terminator here"),
            (3, ""),
            (4, None),
        ],
        "doc_id int, text string",
    )
    rows = sorted(
        (r.doc_id, r.sentence_id, r.sentence, r.sentence_chars)
        for r in split_sentences(df).collect()
    )
    assert rows == [
        (1, 0, "One sentence.", 13),
        (1, 1, "Two!", 4),
        (1, 2, "Three?", 6),
        (1, 3, "Trailing", 8),
        (2, 0, "No terminator here", 18),
    ]


def test_geo_mean_matches_hand_computed(spark):
    vals = [1.0, 2.0, 4.0, 8.0]
    df = spark.createDataFrame([("a", v) for v in vals], "k string, v double")
    got = df.groupBy("k").agg(geo_mean_udaf()(F.col("v")).alias("gm")).first().gm
    expected = math.exp(sum(math.log(v) for v in vals) / len(vals))
    assert abs(got - expected) < 1e-12


def test_polymorphic_udtf_analyze_schema_and_padding(spark):
    from pyspark.sql import functions as F

    from providenciasbigdata_spark.functions.udx import split_fixed_udtf

    df = spark.createDataFrame([("A-B-C-D",), ("A",), (None,)], "code string")
    out = df.lateralJoin(split_fixed_udtf()(F.col("code").outer(), F.lit(3)))
    # analyze() derived exactly 3 part columns from the constant arg
    assert [c for c in out.columns if c.startswith("part")] == ["part0", "part1", "part2"]
    rows = {r.code: (r.part0, r.part1, r.part2) for r in out.collect()}
    assert rows["A-B-C-D"] == ("A", "B", "C")      # extras dropped
    assert rows["A"] == ("A", None, None)          # short padded
    assert rows[None] == ("", None, None)          # null -> empty first part

    wider = df.lateralJoin(split_fixed_udtf()(F.col("code").outer(), F.lit(5)))
    assert [c for c in wider.columns if c.startswith("part")] == [
        "part0", "part1", "part2", "part3", "part4",
    ]


def test_polymorphic_udtf_rejects_bad_arity(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from providenciasbigdata_spark.functions.udx import split_fixed_udtf

    df = spark.createDataFrame([("A-B",)], "code string")
    with _pytest.raises(Exception, match="positive constant int"):
        df.lateralJoin(split_fixed_udtf()(F.col("code").outer(), F.lit(0))).collect()


def test_cogroup_self_source_attribute_dedup_pin(spark):
    """Spark gotcha pin: cogrouping two slices of ONE source plan
    de-duplicates right-side attributes against the left's expression
    IDs — without the defensive re-alias inside cogroup_asof_prices
    the right pandas frames arrive MISSING ts/value (observed, no
    error raised). This asserts the defense works end-to-end: the
    as-of reference values actually materialize."""
    from providenciasbigdata_spark.functions.udx import cogroup_asof_prices

    base = spark.createDataFrame(
        [
            (1, "p", 100.0, 1.0),
            (1, "c", 50.0, 7.0),
            (1, "c", 90.0, 9.0),
            (2, "p", 10.0, 2.0),
        ],
        "user_id long, et string, tsd double, value double",
    ).withColumn("ts", F.timestamp_micros((F.col("tsd") * 1e6).cast("long")))
    trades = base.filter(F.col("et") == "p").select("user_id", "ts", "value")
    quotes = base.filter(F.col("et") == "c").select("user_id", "ts", "value")
    out = {r.user_id: r.ref_value for r in
           cogroup_asof_prices(trades, quotes).collect()}
    # user 1: latest click at-or-before t=100 is t=90 -> 9.0
    assert out[1] == 9.0
    assert out[2] is None  # no clicks for user 2 -> NULL, row kept
