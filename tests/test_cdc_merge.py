"""MERGE INTO semantics pins (operators.cdc.merge_into): clause
precedence (delete beats update), pass-through of unmatched target
rows, NULL-key rows never match, schema stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.operators.cdc import merge_into


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "nk", 40.0)],
        "k long, name string, v double",
    )
    source = spark.createDataFrame(
        [(1, 100.0), (3, 5.0), (9, 7.0), (None, 99.0)],
        "k long, delta double",
    )
    return target, source


def test_merge_clause_precedence_and_passthrough(spark):
    target, source = _frames(spark)
    out = merge_into(
        target,
        source,
        keys=["k"],
        update_set={"v": F.col("t.v") + F.col("s.delta")},
        insert_values={"k": F.col("s.k"), "name": F.lit("new"), "v": F.col("s.delta")},
        delete_condition=F.col("s.delta") > 50,  # k=1 deleted, k=3 updated
    )
    rows = {(r["k"], r["name"]): r["v"] for r in out.collect()}
    assert (1, "a") not in rows                       # matched + delete wins
    assert rows[(3, "c")] == 35.0                     # matched -> update
    assert rows[(2, "b")] == 20.0                     # target-only passthrough
    assert rows[(9, "new")] == 7.0                    # source-only -> insert
    # NULL keys never match (ANSI ON-predicate): target NULL row passes
    # through untouched; source NULL row inserts as a fresh row.
    assert rows[(None, "nk")] == 40.0
    assert rows[(None, "new")] == 99.0
    assert out.columns == target.columns
    assert out.schema == target.schema


def test_merge_no_insert_clause_drops_unmatched_source(spark):
    target, source = _frames(spark)
    out = merge_into(
        target, source, keys=["k"],
        update_set={"v": F.col("t.v") + F.col("s.delta")},
    )
    keys = {(r["k"], r["name"]) for r in out.collect()}
    assert (9, "new") not in keys and len(keys) == 4


def test_merge_strict_rejects_multi_match_source(spark):
    """ANSI MERGE errors on a source with >1 row per key; strict=True
    (default) reproduces that loudly instead of silently duplicating
    target rows. NULL-key duplicates are exempt (they never match);
    strict=False restores the documented duplicate-rows behavior."""
    import pytest

    target = spark.createDataFrame([(1, 10.0)], "k long, v double")
    dup_source = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (None, 9.0), (None, 8.0)], "k long, delta double"
    )
    with pytest.raises(ValueError, match="at most one source match"):
        merge_into(target, dup_source, keys=["k"],
                   update_set={"v": F.col("s.delta")})
    # null-key dups alone pass strict
    null_only = dup_source.filter(F.col("k").isNull())
    out = merge_into(target, null_only, keys=["k"],
                     update_set={"v": F.col("s.delta")})
    assert out.count() == 1
    # strict=False: documented divergence — target row duplicated
    out = merge_into(target, dup_source, keys=["k"],
                     update_set={"v": F.col("s.delta")}, strict=False)
    assert out.filter(F.col("k") == 1).count() == 2

    # strict="join": same guarantee riding the merge job itself —
    # raises at EXECUTION time naming the duplicated key, costs no
    # separate validation pass (the count window shares the join's
    # hashpartitioning)
    lazy = merge_into(target, dup_source, keys=["k"],
                      update_set={"v": F.col("s.delta")}, strict="join")
    with pytest.raises(Exception, match="at most one source match"):
        lazy.collect()
    # clean source: strict="join" result == strict=True result
    clean = dup_source.filter(F.col("k").isNotNull()).limit(1)
    a = merge_into(target, clean, keys=["k"],
                   update_set={"v": F.col("s.delta")}, strict="join").collect()
    b = merge_into(target, clean, keys=["k"],
                   update_set={"v": F.col("s.delta")}).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # null-key dups exempt under "join" too
    out = merge_into(target, null_only, keys=["k"],
                     update_set={"v": F.col("s.delta")}, strict="join")
    assert out.count() == 1
    with pytest.raises(ValueError, match="strict"):
        merge_into(target, clean, keys=["k"],
                   update_set={"v": F.col("s.delta")}, strict="sometimes")


def test_merge_update_condition_keeps_nonqualifying_match(spark):
    target, source = _frames(spark)
    out = merge_into(
        target, source, keys=["k"],
        update_set={"v": F.col("t.v") + F.col("s.delta")},
        update_condition=F.col("s.delta") < 50,  # k=1 match doesn't qualify
    )
    rows = {r["k"]: r["v"] for r in out.filter(F.col("k").isNotNull()).collect()}
    assert rows[1] == 10.0 and rows[3] == 35.0


def test_snapshot_diff_classification_and_validation(spark):
    from providenciasbigdata_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 9.0), (4, "d", 4.0)], "k long, s string, v double"
    )
    got = {r.k: r.change for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}
    # restricting compare_cols hides the v change
    got2 = {r.k: r.change
            for r in snapshot_diff(old, new, keys=["k"], compare_cols=["s"]).collect()}
    assert got2 == {1: "removed", 4: "added"}
    import pytest
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(old, new.drop("v"), keys=["k"])


def test_train_val_test_split_deterministic_partition(spark):
    from providenciasbigdata_spark.io import load_table
    from providenciasbigdata_spark.operators.mix import train_val_test_split

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = train_val_test_split(docs).select("doc_id", "split")
    b = train_val_test_split(docs.repartition(7)).select("doc_id", "split")
    # identical across partitionings; every row in exactly one split
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = dict(
        (r.split, r.n) for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    n = docs.count()
    assert set(counts) == {"train", "val", "test"} and sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.8) < 0.08
    # independent salt -> a different (re-drawn) assignment
    c = train_val_test_split(docs, salt="other").select("doc_id", "split")
    assert c.exceptAll(a).count() > 0
    import pytest
    with pytest.raises(ValueError, match="train"):
        train_val_test_split(docs, train=0.9, val=0.2)
