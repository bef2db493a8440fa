"""operators.quality semantics on crafted frames: violation counts,
null handling, and the one-scan plan guarantee."""

from __future__ import annotations

import contextlib
import io

from providenciasbigdata_spark.operators import quality as Q


def _report(df, checks):
    out = Q.validate_expectations(df, checks).collect()
    return {r["check"]: (r["violations"], r["passed"]) for r in out}


def test_violation_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (2, "b", 3.0), (3, "zz", 200.0)],
        "id int, cat string, val double",
    )
    rep = _report(
        df,
        [
            Q.row_count_min(1),
            Q.not_null("cat"),
            Q.unique("id"),
            Q.min_value("val", 0.0),
            Q.max_value("val", 100.0),
            Q.in_set("cat", ["a", "b"]),
        ],
    )
    assert rep["row_count_min"] == (0, True)
    assert rep["not_null_cat"] == (1, False)
    assert rep["unique_id"] == (1, False)  # id=2 twice -> 1 duplicate
    assert rep["min_value_val"] == (1, False)  # -1.0
    assert rep["max_value_val"] == (1, False)  # 200.0
    # NULL is not an in_set violation (not_null owns that concern)
    assert rep["in_set_cat"] == (1, False)  # only 'zz'


def test_all_pass_on_clean_frame(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, cat string")
    rep = _report(
        df,
        [Q.row_count_min(2), Q.not_null("id"), Q.unique("id"), Q.in_set("cat", ["a", "b"])],
    )
    assert all(passed for _, passed in rep.values())


def test_row_count_min_fails_on_empty(spark):
    df = spark.createDataFrame([], "id int")
    rep = _report(df, [Q.row_count_min(1), Q.not_null("id")])
    assert rep["row_count_min"] == (1, False)
    assert rep["not_null_id"] == (0, True)  # vacuous on empty input


def test_single_scan_plan(spark):
    """All checks must fold into one aggregate over one scan — the
    property that keeps N checks O(1 pass) at 100 TB."""
    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS STRING) AS cat")
    rep_df = Q.validate_expectations(
        df, [Q.not_null("cat"), Q.unique("id"), Q.min_value("id", 0)]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rep_df.explain("simple")
    plan = buf.getvalue()
    assert plan.count("Scan") <= 1, plan
    assert "Join" not in plan, plan


def test_triangle_count_known_graph(spark, tmp_path):
    """4 vectors arranged so exactly vectors {0,1,2} are mutually
    similar (one triangle) and vector 3 is orthogonal to all."""
    rows = [
        (0, [1.0, 0.0, 0.01]),
        (1, [1.0, 0.01, 0.0]),
        (2, [1.0, 0.005, 0.005]),
        (3, [0.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    from providenciasbigdata_spark.queries.graph_ext import q_triangle_count

    out = q_triangle_count(spark, str(tmp_path)).collect()
    assert out[0]["n_triangles"] == 1


def test_merge_agg_state_sequential_folds(spark):
    """Folding batches one at a time must equal aggregating everything
    at once — the monoid property incremental maintenance rests on."""
    from providenciasbigdata_spark.operators.cdc import merge_agg_state, partial_agg

    full = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", 10.0), ("a", 3.0), ("b", 0.25), ("c", 7.0)],
        "k string, v double",
    )
    batches = [full.limit(2), full.offset(2).limit(2), full.offset(4)]
    state = partial_agg(batches[0], ["k"], ["v"])
    for b in batches[1:]:
        state = merge_agg_state(state, b, ["k"], ["v"])
    got = {r["k"]: (float(r["v"]), r["n"]) for r in state.collect()}
    want = {
        r["k"]: (float(r["v"]), r["n"])
        for r in partial_agg(full, ["k"], ["v"]).collect()
    }
    assert got == want


def test_observe_expectations_zero_extra_pass(spark):
    """Observation metrics ride the caller's own action: one job, no
    second scan, same counters as the standalone audit."""
    from providenciasbigdata_spark.io import load_table
    from providenciasbigdata_spark.operators import quality as q

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    checks = [
        q.not_null("o_orderkey"),
        q.min_value("o_totalprice", 0.0),
        q.in_set("o_orderstatus", ["O", "F", "P"]),
    ]
    observed, obs = q.observe_expectations(orders, checks)
    n = observed.count()  # the caller's action; metrics piggyback on it
    assert n == orders.count()
    got = obs.get
    want = {r.check: r.violations for r in q.validate_expectations(orders, checks).collect()}
    assert got == want
    assert all(v == 0 for v in got.values())


def test_ks_statistic_known_values(spark):
    """KS pins: identical samples -> 0; disjoint ranges -> 1; a hand
    case checked against the closed-form ECDF sup; NULLs excluded."""
    from providenciasbigdata_spark.operators.quality import ks_statistic

    a = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4]], "x double")
    same = ks_statistic(a, a, "x").first()
    assert same.ks == 0.0 and same.n_a == 4 and same.n_b == 4

    b = spark.createDataFrame([(float(x),) for x in [10, 11]], "x double")
    assert ks_statistic(a, b, "x").first().ks == 1.0

    # A = {1,2,3,4}, B = {2,2,5}: sup at v=4: |1 - 2/3| = 1/3
    c = spark.createDataFrame(
        [(2.0,), (2.0,), (5.0,), (None,)], "x double"
    )
    r = ks_statistic(a, c, "x").first()
    assert r.n_b == 3  # NULL excluded
    assert abs(r.ks - (1 - 2 / 3)) < 1e-15


def test_wasserstein_known_values(spark):
    """W1 pins: identical samples -> 0; a constant shift of a point
    mass moves W1 by exactly the shift; a hand case against the
    closed-form sum over ECDF gaps; scipy cross-check when available;
    NULLs excluded; single-shared-value edge -> 0 (no gaps)."""
    from providenciasbigdata_spark.operators.quality import wasserstein_1

    a = spark.createDataFrame([(x,) for x in [1, 2, 3, 4]], "x long")
    same = wasserstein_1(a, a, "x").first()
    assert same.w1 == 0.0 and same.n_a == 4 and same.n_b == 4

    # point masses at 0 and 7 -> W1 == shift
    p0 = spark.createDataFrame([(0,), (0,)], "x long")
    p7 = spark.createDataFrame([(7,), (7,)], "x long")
    assert wasserstein_1(p0, p7, "x").first().w1 == 7.0

    # A = {1,2,3,4}, B = {2,2,5}, union values 1,2,3,4,5 (gaps all 1):
    # |Fa-Fb| at 1..4 = 1/4 + 1/6 + 1/12 + 1/3 -> sum 5/6
    b = spark.createDataFrame([(2,), (2,), (5,), (None,)], "x long")
    r = wasserstein_1(a, b, "x").first()
    assert r.n_b == 3
    assert abs(r.w1 - 5 / 6) < 1e-15
    try:
        from scipy.stats import wasserstein_distance

        assert abs(r.w1 - wasserstein_distance([1, 2, 3, 4], [2, 2, 5])) < 1e-12
    except ImportError:
        pass

    only = spark.createDataFrame([(3,), (3,)], "x long")
    assert wasserstein_1(only, only, "x").first().w1 == 0.0


def test_psi_drift_hand_checked(spark):
    """Round 9: PSI contributions with Laplace smoothing — hand-checked
    against the closed form, one-sided category stays finite, total in
    the textbook 'shifted' band for a large shift."""
    import math

    from providenciasbigdata_spark.operators.quality import psi_drift
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("a",)] * 80 + [("b",)] * 20, "c string"
    )
    right = spark.createDataFrame(
        [("a",)] * 40 + [("b",)] * 50 + [("z",)] * 10, "c string"
    )
    rows = {r.category: r for r in psi_drift(left, right, "c").collect()}
    assert set(rows) == {"a", "b", "z"}

    def pq(o, n, k=3, s=0.5):
        return (o + s) / (n + s * k)

    for cat, o1, o2 in (("a", 80, 40), ("b", 20, 50), ("z", 0, 10)):
        p, q = pq(o1, 100), pq(o2, 100)
        want = (p - q) * math.log(p / q)
        assert abs(rows[cat].contrib - want) < 1e-12, cat
        assert rows[cat].o1 == o1 and rows[cat].o2 == o2

    total = sum(r.contrib for r in rows.values())
    assert total > 0.25  # a genuinely shifted distribution

    import pytest as _pytest

    with _pytest.raises(ValueError, match="smoothing"):
        psi_drift(left, right, "c", smoothing=-1.0)
