"""HLL sketch accuracy: daily and merged-cumulative estimates must
track exact distinct counts within the lg_k=14 error bound (~1.6% at
3 sigma; we allow 2%), and merging sketches must equal sketching the
union — the mergeability property the incremental pattern relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators.sketch import hll_daily_cumulative

SF = "/root/testdata/sf0.01"


def test_hll_tracks_exact(spark):
    ev = load_table(spark, SF, "events")
    est = {r["day"]: (r["daily_users"], r["cum_users"]) for r in hll_daily_cumulative(ev).collect()}

    exact_daily = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact_daily.keys()
    for day, (d_est, _) in est.items():
        exact = exact_daily[day]
        assert abs(d_est - exact) <= max(2, 0.02 * exact), (day, d_est, exact)

    last_day = max(est)
    exact_total = ev.filter(
        F.date_trunc("day", "ts") <= last_day
    ).select("user_id").distinct().count()
    cum_last = est[last_day][1]
    assert abs(cum_last - exact_total) <= max(2, 0.02 * exact_total), (cum_last, exact_total)


def test_merge_equals_resketch(spark):
    """union(sketch(A), sketch(B)) must estimate like sketch(A ∪ B):
    split events in half by event_id parity, merge the halves, compare
    to the single-pass sketch over everything."""
    ev = load_table(spark, SF, "events")
    whole = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint")
    ).first()[0]
    halves = ev.groupBy((F.col("event_id") % 2).alias("h")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = halves.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint")
    ).first()[0]
    assert merged == whole
