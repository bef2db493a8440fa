"""Distributed logistic-regression quality classifier pins
(operators/classifier.py): bit-determinism, numpy-twin agreement,
separable-corpus convergence, map-only scoring plan."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from providenciasbigdata_spark.operators import classifier


def _corpus(spark, n=120, seed_offset=0):
    """Separable synthetic corpus: positives speak quality-words,
    negatives speak spam-words, both share noise words. Deterministic
    (index-derived), no RNG."""
    pos_vocab = ["coherent", "citation", "methodology", "rigorous", "evidence"]
    neg_vocab = ["clickbait", "lottery", "miracle", "winner", "pills"]
    noise = ["the", "and", "data", "report", "value"]
    rows = []
    for i in range(n):
        y = i % 2
        vocab = pos_vocab if y else neg_vocab
        words = [vocab[(i + j + seed_offset) % len(vocab)] for j in range(4)]
        words += [noise[(i * 3 + j) % len(noise)] for j in range(3)]
        rows.append((i, " ".join(words), y))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _numpy_twin(X, y, dim, iters, lr):
    """The exact update rule train_logistic_hashed implements, dense."""
    w = np.zeros(dim)
    b = 0.0
    n = len(y)
    losses = []
    for _ in range(iters):
        m = X @ w + b
        p = 1.0 / (1.0 + np.exp(-m))
        pc = np.clip(p, 1e-12, 1 - 1e-12)
        losses.append(float(-(y * np.log(pc) + (1 - y) * np.log(1 - pc)).mean()))
        r = p - y
        w = w - lr * (X.T @ r) / n
        b = b - lr * r.sum() / n
    return w, b, losses


def test_logistic_trains_deterministically_and_matches_numpy(spark):
    dim, iters, lr = 64, 12, 0.5
    df = _corpus(spark)
    model = classifier.train_logistic_hashed(
        df, "label", dim=dim, iters=iters, lr=lr
    )

    # (1) loss decreases monotonically on a separable corpus
    assert all(a > b for a, b in zip(model.losses, model.losses[1:])), model.losses

    # (2) bit-determinism: DECIMAL gradient sums make a second run
    # produce the IDENTICAL model (float shuffle-order sums would not)
    again = classifier.train_logistic_hashed(
        df, "label", dim=dim, iters=iters, lr=lr
    )
    assert again.weights == model.weights and again.bias == model.bias

    # (3) numpy twin of the same updates over the same hashed features
    feats = classifier.hashed_presence_features(df, dim=dim).select(
        "label", "buckets"
    ).collect()
    X = np.zeros((len(feats), dim))
    y = np.zeros(len(feats))
    for i, r in enumerate(feats):
        y[i] = r.label
        for j in r.buckets:
            X[i, j] = 1.0
    w_np, b_np, losses_np = _numpy_twin(X, y, dim, iters, lr)
    assert np.max(np.abs(np.array(model.weights) - w_np)) < 1e-9
    assert abs(model.bias - b_np) < 1e-9
    assert max(abs(a - b) for a, b in zip(model.losses, losses_np)) < 1e-9

    # (4) the trained model separates train AND fresh holdout data
    holdout = _corpus(spark, n=60, seed_offset=1).withColumnRenamed(
        "label", "truth"
    )
    scored = classifier.predict_logistic(holdout, model)
    acc = scored.select(
        ((F.col("score") > 0.5).cast("int") == F.col("truth")).cast("int").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert acc >= 0.95, acc

    # (5) scoring is map-only: no exchange in the plan
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_logistic_edge_contracts(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="empty"):
        classifier.train_logistic_hashed(empty, "label", dim=8, iters=1)

    # empty-text rows (no buckets) still contribute to bias/loss
    df = spark.createDataFrame(
        [(0, "", 0), (1, "words here", 1), (2, "", 0), (3, "words here", 1)],
        "doc_id long, text string, label int",
    )
    m = classifier.train_logistic_hashed(df, "label", dim=16, iters=5, lr=1.0)
    assert len(m.losses) == 5 and m.losses[-1] < m.losses[0]
    scored = {r.doc_id: r.score for r in classifier.predict_logistic(df, m).collect()}
    assert scored[1] > 0.5 > scored[0]


def test_calibration_bins_hand_checked(spark):
    """Round 9: bin assignment (score 1.0 clamps into the last bin),
    null exclusion, per-bin means, and the ECE computed from the table."""
    from providenciasbigdata_spark.operators.classifier import calibration_bins
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (0.05, 0), (0.08, 0),          # bin 0: mean 0.065, frac 0.0
            (0.55, 1), (0.58, 0),          # bin 5: mean 0.565, frac 0.5
            (0.95, 1), (1.00, 1),          # bin 9 (1.0 clamps): frac 1.0
            (None, 1),                     # excluded
        ],
        "score double, label int",
    )
    rows = {r.bin: r for r in calibration_bins(df, "score", "label").collect()}
    assert set(rows) == {0, 5, 9}
    assert rows[0].n == 2 and rows[0].mean_score == 0.065 and rows[0].frac_pos == 0.0
    assert rows[5].n == 2 and rows[5].frac_pos == 0.5
    assert rows[9].n == 2 and rows[9].mean_score == 0.975 and rows[9].frac_pos == 1.0

    total = sum(r.n for r in rows.values())
    ece = sum(r.n / total * abs(r.mean_score - r.frac_pos) for r in rows.values())
    assert abs(ece - (2/6 * 0.065 + 2/6 * 0.065 + 2/6 * 0.025)) < 1e-9

    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, "score", "label", n_bins=0)


def test_score_margin_millionths_exact_and_decision_equivalent(spark):
    """Round 13 (verdict-r12 item 6): the integer-quantized scoring
    path. Pins: (a) the margin equals a pure-Python replay of the same
    md5 buckets and md5-derived millionths weights — EXACT, no
    tolerance; (b) margin > 0 decisions equal sigmoid > 0.5 on the
    float rendering of the same quantized model (monotone bijection);
    (c) the xxhash64 and md5 families produce valid bucket ranges and
    an unknown family raises."""
    import hashlib

    dim, bias_m = 64, -250000
    wm = [
        int(hashlib.md5(f"w{j}".encode()).hexdigest()[:6], 16) % 2000001 - 1000000
        for j in range(dim)
    ]
    df = _corpus(spark, n=40)
    out = classifier.score_margin_millionths(
        df, wm, bias_m, hash_family="md5"
    ).select("doc_id", "text", "buckets", "margin_millionths").collect()
    assert len(out) == 40
    for r in out:
        toks = r.text.split()
        exp_buckets = sorted(
            {int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim for t in toks}
        )
        assert list(r.buckets) == exp_buckets
        exp_m = bias_m + sum(wm[j] for j in exp_buckets)
        assert r.margin_millionths == exp_m  # exact integer arithmetic
        # decision equivalence with the float sigmoid of the SAME model
        p = 1.0 / (1.0 + math.exp(-(exp_m / 1e6)))
        assert (r.margin_millionths > 0) == (p > 0.5)

    # family hygiene
    x = classifier.hashed_presence_features(df, dim=dim).first()
    assert all(0 <= j < dim for j in x.buckets)
    with pytest.raises(ValueError, match="hash_family"):
        classifier.hashed_presence_features(df, dim=dim, hash_family="sha9")
