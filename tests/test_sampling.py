"""Stratified sampling: seeded determinism + per-stratum fraction
within binomial tolerance (the rows-only registry query's property)."""

from __future__ import annotations

import math

from providenciasbigdata_spark.queries.extended import q_stratified_sample

SF = "/root/testdata/sf0.01"


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
