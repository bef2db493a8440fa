"""Classifier-driven corpus curation: the weak-label bootstrap loop.

The standard pipeline shape behind GPT-3's WebText filter and
RefinedWeb's quality gates: (1) derive cheap RULE-based labels for a
slice of the corpus, (2) train a lightweight distributed classifier on
them (operators/classifier.py: hashed presence features, decimal-exact
full-batch GD — bit-deterministic), (3) score the WHOLE corpus
map-only, (4) keep the high-scoring documents and re-weight the
training mix. Every stage is a DataFrame transformation; the model is
a dim-sized vector the driver holds.

The example asserts its own proofs:
- the classifier generalizes: held-out rule-agreement >= 95%;
- scoring is map-only (no exchange in the scoring plan);
- the curated corpus actually shifts composition (marker prevalence
  rises vs the raw corpus);
- training determinism is pinned separately (tests/test_classifier.py).

Usage:
    python examples/classifier_curation_flow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.text import tokenize
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators.classifier import (
    predict_logistic,
    train_logistic_hashed,
)
from providenciasbigdata_spark.session import get_spark

MARKERS = ["slow"]  # the weak rule: "mentions slowness"


def run(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    marker_arr = F.array(*[F.lit(m) for m in MARKERS])
    labeled = docs.withColumn(
        "label", F.arrays_overlap(tokenize(F.col("text")), marker_arr).cast("int")
    )

    # (1-2) train on even doc_ids, hold out odd ones
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    held = labeled.filter(F.col("doc_id") % 2 == 1)
    model = train_logistic_hashed(train, "label", dim=512, iters=50, lr=2.0)
    # loss must improve decisively (strict per-step monotonicity is a
    # property of small steps; lr=1 can ripple on a tiny corpus)
    assert model.losses[-1] < model.losses[0] * 0.5, model.losses

    # (bit-determinism of training is pinned in tests/test_classifier.py;
    # not re-proven here to keep the CI example lean)

    # (3) score the whole corpus; held-out agreement with the rule
    scored = predict_logistic(labeled, model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "scoring must stay map-only"
    held_scored = predict_logistic(held, model)
    agree = held_scored.select(
        ((F.col("score") > 0.5).cast("int") == F.col("label")).cast("int").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert agree >= 0.95, f"held-out rule agreement {agree:.3f}"

    # (4) curate: keep confident positives; composition must shift
    curated = scored.filter(F.col("score") > 0.5)
    raw_prev = labeled.agg(F.avg("label")).first()[0]
    cur_prev = curated.agg(F.avg("label")).first()[0]
    assert cur_prev > raw_prev, (cur_prev, raw_prev)

    n_raw, n_cur = labeled.count(), curated.count()
    print(
        f"[curate] corpus {n_raw} -> {n_cur} docs; "
        f"marker prevalence {raw_prev:.3f} -> {cur_prev:.3f}; "
        f"held-out agreement {agree:.3f}"
    )
    return {
        "n_raw": n_raw,
        "n_curated": n_cur,
        "held_out_agreement": float(agree),
        "raw_prevalence": float(raw_prev),
        "curated_prevalence": float(cur_prev),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="classifier_curation_flow")
    try:
        run(spark, sf_dir)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
