"""Stratified sampling: seeded determinism + per-stratum fraction
within binomial tolerance (the rows-only registry query's property)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.queries.extended import q_stratified_sample

SF = "/root/testdata/sf0.01"
SF001 = "/root/testdata/sf0.001"


def test_stratified_sample_fractions_and_determinism(spark):
    rows1 = {r.o_orderstatus: r for r in q_stratified_sample(spark, SF).collect()}
    rows2 = {r.o_orderstatus: r for r in q_stratified_sample(spark, SF).collect()}
    fractions = {"O": 0.1, "F": 0.5, "P": 1.0}
    assert set(rows1) == set(fractions)
    for status, frac in fractions.items():
        n, k = rows1[status].n_total, rows1[status].n_sampled
        # 5-sigma binomial bound — deterministic data, so no flakes
        tol = 5 * math.sqrt(n * frac * (1 - frac)) if 0 < frac < 1 else 0
        assert abs(k - n * frac) <= max(tol, 1), (status, n, k)
        # same seed + same partition layout => identical draw
        assert rows2[status].n_sampled == k


# ---- deterministic training mix (operators/mix.py) ------------------------

def test_hash_rate_sample_rate_and_determinism(spark):
    from providenciasbigdata_spark.operators.mix import hash_rate_sample

    docs = load_table(spark, SF001, "documents")
    n = docs.count()
    s1 = hash_rate_sample(docs, 0.5, "doc_id", salt="a")
    s2 = hash_rate_sample(docs, 0.5, "doc_id", salt="a")
    k = s1.count()
    assert k == s2.count()  # deterministic
    assert abs(k / n - 0.5) < 0.1  # uniform-ish at 500 docs
    ids1 = {r.doc_id for r in s1.collect()}
    ids2 = {r.doc_id for r in s2.collect()}
    assert ids1 == ids2
    # distinct salts draw independently: overlap near rate product
    s_other = hash_rate_sample(docs, 0.5, "doc_id", salt="b")
    other = {r.doc_id for r in s_other.collect()}
    overlap = len(ids1 & other) / n
    assert 0.1 < overlap < 0.45
    # rate 1.0 is identity, 0.0 empty
    assert hash_rate_sample(docs, 1.0, "doc_id").count() == n
    assert hash_rate_sample(docs, 0.0, "doc_id").count() == 0


def test_mix_corpus_tags_and_rates(spark):
    import pytest

    from providenciasbigdata_spark.operators.mix import mix_corpus

    docs = load_table(spark, SF001, "documents")
    mixed = mix_corpus(
        [
            ("en", docs.filter("lang = 'en'"), 1.0),
            ("es", docs.filter("lang = 'es'"), 0.5),
        ]
    )
    by_src = {r["mix_source"]: r["n"] for r in
              mixed.groupBy("mix_source").agg(F.count("*").alias("n")).collect()}
    n_en = docs.filter("lang = 'en'").count()
    n_es = docs.filter("lang = 'es'").count()
    assert by_src["en"] == n_en
    assert 0 < by_src["es"] < n_es
    assert "mix_source" in mixed.columns
    with pytest.raises(ValueError):
        mix_corpus([])
    from providenciasbigdata_spark.operators.mix import hash_rate_sample

    with pytest.raises(ValueError):
        hash_rate_sample(docs, 1.5, "doc_id")


def test_budget_rates_targets_and_caps(spark):
    from providenciasbigdata_spark.operators.mix import budget_rates, mix_corpus

    docs = load_table(spark, SF001, "documents")
    en = docs.filter("lang = 'en'")
    es = docs.filter("lang = 'es'")
    total_en = en.agg(F.sum("n_chars")).first()[0]
    budget = int(total_en * 0.6)  # en can only fill 0.3 of budget share? no:
    rated = budget_rates([("en", en, 1.0), ("es", es, 1.0)], budget)
    rates = {name: r for name, _, r in rated}
    # each source targets budget/2 chars; en's rate should be ~0.3
    assert abs(rates["en"] - (budget / 2) / total_en) < 1e-9
    # a tiny budget never exceeds 1.0; a huge one caps at 1.0
    huge = budget_rates([("en", en, 1.0)], budget=10**12)
    assert huge[0][2] == 1.0
    # achieved size lands near target (binomial tolerance)
    mixed = mix_corpus(rated)
    got = mixed.agg(F.sum("n_chars")).first()[0]
    assert abs(got - budget) / budget < 0.25
    import pytest

    with pytest.raises(ValueError):
        budget_rates([("en", en, 1.0)], budget=0)
    with pytest.raises(ValueError):
        budget_rates([("en", en, 0.0)], budget=10)


# ---- approximate percentiles (bounded-state scale path) --------------------

def test_approx_percentiles_rank_error_bound(spark):
    """percentile_approx(accuracy=1000) guarantees rank error <=
    n/accuracy: the empirical rank of each estimated quartile must sit
    within that bound of its target rank (per status group)."""
    from providenciasbigdata_spark.queries.extended import q_percentiles_approx

    orders = load_table(spark, SF, "orders")
    approx = {r.o_orderstatus: r for r in q_percentiles_approx(spark, SF).collect()}
    for status, row in approx.items():
        grp = orders.filter(F.col("o_orderstatus") == status)
        n = row.n
        assert n == grp.count()
        for q, est in ((0.25, row.p25), (0.5, row.p50), (0.75, row.p75)):
            rank = grp.filter(F.col("o_totalprice") <= est).count()
            assert abs(rank - q * n) <= n / 1000 + 1, (status, q, est, rank, n)
        assert row.p25 <= row.p50 <= row.p75


# ---- deterministic weighted sampling (Efraimidis-Spirakis) ---------------

def test_weighted_sample_matches_python_reference(spark, sf_dir):
    import hashlib
    import math

    from providenciasbigdata_spark.io import load_table
    from providenciasbigdata_spark.operators.mix import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        r.doc_id for r in weighted_sample_topk(docs, "n_chars", k=25).collect()
    )
    rows = docs.select("doc_id", "n_chars").collect()
    def clock(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(16**15)
        return -math.log(u) / w
    want = sorted(
        doc_id
        for doc_id, _ in sorted(
            ((r.doc_id, clock(r.doc_id, r.n_chars)) for r in rows if r.n_chars and r.n_chars > 0),
            key=lambda t: (t[1], t[0]),
        )[:25]
    )
    assert got == want


def test_weighted_sample_deterministic_under_repartition(spark, sf_dir):
    from providenciasbigdata_spark.io import load_table
    from providenciasbigdata_spark.operators.mix import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r.doc_id for r in weighted_sample_topk(docs, "n_chars", k=20).collect())
    b = sorted(
        r.doc_id
        for r in weighted_sample_topk(docs.repartition(13), "n_chars", k=20).collect()
    )
    assert a == b


def test_weighted_sample_huge_weight_dominates_and_nonpositive_excluded(spark):
    from pyspark.sql import functions as F

    from providenciasbigdata_spark.operators.mix import weighted_sample_topk

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 7, F.lit(1e12))
        .when(F.col("id") == 8, F.lit(0.0))
        .when(F.col("id") == 9, F.lit(None).cast("double"))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    kept = {r.doc_id for r in weighted_sample_topk(df, "w", k=10).collect()}
    assert 7 in kept          # ~1e12x the weight -> certain inclusion
    assert 8 not in kept and 9 not in kept


def test_weighted_sample_plan_is_takeordered(spark, sf_dir):
    import contextlib
    import io

    from providenciasbigdata_spark.io import load_table
    from providenciasbigdata_spark.operators.mix import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        weighted_sample_topk(docs, "n_chars", k=25).explain("simple")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan


def test_epoch_plan_known_arithmetic(spark):
    """epoch plan: share/target/epochs from exact ints; cap flag;
    token-less group -> null epochs (least() null-skip guarded);
    integer-weight and budget validation raise."""
    import pytest

    from providenciasbigdata_spark.operators.mix import epoch_plan

    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 50), ("c", 0)],
        "src string, n_tok long",
    )
    got = {r.src: r for r in epoch_plan(
        df, "src", "n_tok", {"a": 3, "b": 1}, budget_tokens=1000, max_epochs=4.0
    ).collect()}
    # a: tokens 200, target 750, epochs 3.75 (under cap)
    assert got["a"].tokens == 200 and got["a"].target_tokens == 750.0
    assert got["a"].epochs == 3.75 and got["a"].needs_cap is False
    # b: tokens 50, target 250, epochs 5 -> capped at 4
    assert got["b"].epochs == 5.0 and got["b"].capped_epochs == 4.0
    assert got["b"].needs_cap is True
    # c: weight 0 AND zero tokens -> null epochs, null cap fields
    assert got["c"].tokens == 0 and got["c"].epochs is None
    assert got["c"].capped_epochs is None and got["c"].needs_cap is None

    with pytest.raises(ValueError):
        epoch_plan(df, "src", "n_tok", {"a": 1.5}, 1000)
    with pytest.raises(ValueError):
        epoch_plan(df, "src", "n_tok", {"a": 1}, 0)
    with pytest.raises(ValueError):
        epoch_plan(df, "src", "n_tok", {"a": 0}, 1000)
