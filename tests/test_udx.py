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
