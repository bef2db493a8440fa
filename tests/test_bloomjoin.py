"""Bloom semi-join reduction (operators/bloomjoin.py): exactness vs the
plain join, the no-false-negative guarantee, a measured false-positive
bound at the sized bitmap, and the plan shape (prefilter = broadcast
hash joins only — no exchange added to the fact side before the
pruning filter)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from providenciasbigdata_spark.operators.bloomjoin import (
    bloom_build,
    bloom_prefilter,
    bloom_prefilter_join,
)


def _plan(df, mode="simple"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _fixture(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 200).select((F.col("id") * 7).alias("dk"))
    return fact, dim


def test_bloom_join_equals_plain_join(spark):
    fact, dim = _fixture(spark)
    got = bloom_prefilter_join(fact, dim, "k", "dk", n_bits=1 << 12)
    want = fact.join(dim, fact.k == dim.dk, "inner")
    assert sorted(got.collect()) == sorted(want.collect())
    assert got.columns == want.columns


def test_bloom_no_false_negatives(spark):
    # every dim key fed to the build must pass the prefilter
    _, dim = _fixture(spark)
    bloom = bloom_build(dim, "dk", n_bits=1 << 12)
    keys = dim.select(F.col("dk").alias("k"))
    kept = bloom_prefilter(keys, "k", bloom, n_bits=1 << 12)
    assert kept.count() == keys.count()


def test_bloom_false_positive_rate_bounded(spark):
    # 200 keys x 2 probes in 4096 bits -> fpr ~ (1-e^-400/4096)^2 ~ 0.9%
    fact, dim = _fixture(spark)
    n_bits = 1 << 12
    bloom = bloom_build(dim, "dk", n_bits=n_bits)
    pruned = bloom_prefilter(fact, "k", bloom, n_bits=n_bits)
    true_matches = fact.join(dim, fact.k == dim.dk, "left_semi").count()
    kept = pruned.count()
    assert kept >= true_matches  # superset (no false drops)
    # false positives bounded: allow 5% of the non-matching population
    assert kept - true_matches <= 0.05 * (fact.count() - true_matches)


def test_bloom_null_keys_dropped(spark):
    fact = spark.createDataFrame([(None,), (7,), (3,)], "k int")
    dim = spark.createDataFrame([(7,)], "dk int")
    bloom = bloom_build(dim, "dk", n_bits=64)
    kept = [r.k for r in bloom_prefilter(fact, "k", bloom, 64).collect()]
    assert 7 in kept and None not in kept


def test_bloom_prefilter_plan_broadcast_only(spark):
    # the prefilter's probe joins must be broadcast hash joins; the
    # fact side must not gain a shuffle exchange before the pruning
    # filter (the entire point is to prune BEFORE any exchange)
    fact, dim = _fixture(spark)
    n_bits = 1 << 12
    bloom = bloom_build(dim, "dk", n_bits=n_bits)
    plan = _plan(bloom_prefilter(fact, "k", bloom, n_bits=n_bits))
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
