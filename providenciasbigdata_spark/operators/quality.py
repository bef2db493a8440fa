"""Declarative data-quality expectations (single-scan validation).

A 100 TB ingest pipeline validates every batch before publishing it;
the non-negotiable constraint at that scale is ONE pass over the data
regardless of how many checks run. Every check here compiles to an
aggregate expression; all of them land in one ``agg`` over one scan
(verified by plan pin in tests/test_plans.py), and the per-check report
rows come from unpivoting the single 1-row aggregate — no per-check
jobs, no driver-side loops over data.

The reference has no validation surface at all (its result frames take
whatever schema the server returns — streamlit_app.py:36-41); this is
part of the north-star pipeline scope (SURVEY.md §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: ``name`` labels the report row; ``violations``
    is an aggregate Column counting offending rows (0 == pass)."""

    name: str
    violations: Column


def not_null(col: str) -> Check:
    return Check(
        f"not_null_{col}",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def unique(col: str) -> Check:
    # duplicates = non-null rows minus distinct non-null values
    return Check(
        f"unique_{col}",
        F.count(F.col(col)) - F.count_distinct(F.col(col)),
    )


def min_value(col: str, lo) -> Check:
    return Check(
        f"min_value_{col}",
        F.sum(F.when(F.col(col) < F.lit(lo), 1).otherwise(0)),
    )


def max_value(col: str, hi) -> Check:
    return Check(
        f"max_value_{col}",
        F.sum(F.when(F.col(col) > F.lit(hi), 1).otherwise(0)),
    )


def in_set(col: str, values) -> Check:
    return Check(
        f"in_set_{col}",
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(*values), 1
            ).otherwise(0)
        ),
    )


def row_count_min(n: int) -> Check:
    return Check(
        "row_count_min",
        F.when(F.count(F.lit(1)) < n, F.lit(1)).otherwise(F.lit(0)),
    )


def validate_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run all checks in one scan; returns one row per check:
    ``(check string, violations bigint, passed boolean)``."""
    # SUM over zero rows is NULL, not 0 — an empty input must read as
    # "no violations" for every check except row_count_min
    agg_row = df.agg(
        *[
            F.coalesce(c.violations.cast("bigint"), F.lit(0)).alias(c.name)
            for c in checks
        ]
    )
    stack_args = ", ".join(f"'{c.name}', `{c.name}`" for c in checks)
    return agg_row.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check, violations)"
    ).select(
        "check",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def observe_expectations(df: DataFrame, checks: list["Check"], name: str = "quality"):
    """Attach the expectation aggregates as an OBSERVATION on ``df``:
    the violation counters are computed as a side effect of whatever
    action the caller already runs — ZERO extra passes over the data,
    which at 100 TB is the difference between free metrics and a second
    full scan (``validate_expectations`` is the standalone-audit twin;
    this is the in-pipeline twin). Works on batch and streaming frames
    (Spark's Observation API).

    Batch: returns ``(observed_df, observation)``; after any action on
    ``observed_df``, ``observation.get`` is
    ``{check_name: violation_count}``.
    Streaming: the ``Observation`` helper is batch-only, so the named
    form is used instead — returns ``(observed_df, name)``; read the
    per-micro-batch counters from
    ``query.recentProgress[i].observedMetrics[name]`` (or a
    StreamingQueryListener) and sum across batches.
    """
    cols = [
        F.coalesce(c.violations.cast("bigint"), F.lit(0)).alias(c.name)
        for c in checks
    ]
    if df.isStreaming:
        return df.observe(name, *cols), name
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *cols), obs


def ks_statistic(a: DataFrame, b: DataFrame, col: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic — the standard
    distribution-drift monitor between a reference sample and a new
    batch (per-feature drift gates sit next to the expectation checks
    above in a training-data pipeline).

    D = sup_v |F_a(v) − F_b(v)|. Both ECDFs are right-continuous step
    functions that only jump at sample points, so the sup is the max
    over DISTINCT union values of the inclusive-count difference —
    exact, no binning.

    Scale shape: one union + one per-value hash aggregate collapse the
    samples to their distinct-value histogram; the global cumulative
    counts then come from the packed_positions two-phase prefix sum
    (range-partitioned within-partition window + a broadcast offset
    table over n_partitions rows — NO single-partition data window),
    computing BOTH running sums in the same pass. Totals derive from
    the already-aggregated histogram (no second scan of either input).

    Cross-engine determinism: cum/total is one IEEE division of exact
    BIGINTs, |·| and max are order-independent — value-hash-safe
    without rounding (the graph_link_prediction rule). NULLs are
    excluded from both samples (an ECDF is over values).

    Returns one row: (ks double, n_a bigint, n_b bigint).
    """
    from pyspark.sql import Window

    va = a.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    vb = b.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    hist = (
        va.withColumn("ca", F.lit(1)).withColumn("cb", F.lit(0))
        .unionAll(vb.withColumn("ca", F.lit(0)).withColumn("cb", F.lit(1)))
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    part = hist.repartitionByRange(32, F.col("v")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = part.withColumn("_cuma", F.sum("ca").over(w_in).cast("long")).withColumn(
        "_cumb", F.sum("cb").over(w_in).cast("long")
    )
    totals = part.groupBy("_pid").agg(
        F.sum("ca").alias("_ta"), F.sum("cb").alias("_tb")
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_ta").over(w_off), F.lit(0)).cast("long").alias("_offa"),
        F.coalesce(F.sum("_tb").over(w_off), F.lit(0)).cast("long").alias("_offb"),
    )
    grand = F.broadcast(
        totals.agg(
            F.sum("_ta").cast("long").alias("_na"), F.sum("_tb").cast("long").alias("_nb")
        )
    )
    diff = F.abs(
        (F.col("_cuma") + F.col("_offa")) / F.col("_na")
        - (F.col("_cumb") + F.col("_offb")) / F.col("_nb")
    )
    return (
        part.join(F.broadcast(offsets), "_pid")
        .crossJoin(grand)
        .agg(
            F.max(diff).alias("ks"),
            F.first("_na").alias("n_a"),
            F.first("_nb").alias("n_b"),
        )
    )


def wasserstein_1(a: DataFrame, b: DataFrame, col: str, exact: bool = True) -> DataFrame:
    """Exact first Wasserstein (earth-mover) distance between two
    empirical distributions — the drift monitor that, unlike KS
    (``ks_statistic`` above), weighs HOW FAR mass moved, not just the
    largest ECDF gap: W1 = ∫ |F_a(v) − F_b(v)| dv, and for step ECDFs
    the integral is a finite sum over distinct union values v_i of
    |F_a(v_i) − F_b(v_i)| · (v_{i+1} − v_i).

    Scale shape: identical to ``ks_statistic`` — one union + one
    per-value aggregate collapse both samples to the distinct-value
    histogram, then the two-phase range-partitioned prefix sum computes
    both cumulative counts with NO single-partition data window. The
    one extra ingredient W1 needs over KS is the NEXT distinct value
    (the gap): within a range partition that is a plain ``lead``; at
    partition boundaries it is the next non-empty partition's first
    value, read from the same broadcast per-partition summary table the
    offsets already ride (n_partitions rows — bounded, so its
    driver-ordered window is safe by construction, the $bucketAuto
    rule).

    Cross-engine determinism (``exact=True``, integral values): v is
    cast to BIGINT and every term |cum_a·n_b − cum_b·n_a| · gap is
    exact DECIMAL(38,0) integer arithmetic (the oracle's HUGEINT), so
    the sum is order-free; the ONE double division at the end is
    correctly rounded on both engines → value-hashes unrounded.
    Continuous values: pass ``exact=False`` (floating ECDF terms,
    order-dependent sum — correct, but rows-only territory) or
    quantize to integer micro-units first (the house floor-form rule).

    Returns one row: (w1 double, n_a bigint, n_b bigint).
    """
    from pyspark.sql import Window

    vexpr = F.col(col).cast("long") if exact else F.col(col).cast("double")
    va = a.select(vexpr.alias("v")).where(F.col("v").isNotNull())
    vb = b.select(vexpr.alias("v")).where(F.col("v").isNotNull())
    hist = (
        va.withColumn("ca", F.lit(1)).withColumn("cb", F.lit(0))
        .unionAll(vb.withColumn("ca", F.lit(0)).withColumn("cb", F.lit(1)))
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    part = hist.repartitionByRange(32, F.col("v")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = (
        part.withColumn("_cuma", F.sum("ca").over(w_in).cast("long"))
        .withColumn("_cumb", F.sum("cb").over(w_in).cast("long"))
        .withColumn("_leadv", F.lead("v").over(Window.partitionBy("_pid").orderBy("v")))
    )
    summary = part.groupBy("_pid").agg(
        F.sum("ca").alias("_ta"), F.sum("cb").alias("_tb"), F.min("v").alias("_firstv")
    )
    # bounded table: one row per non-empty range partition (<= 32)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_pid = Window.orderBy("_pid")
    offsets = summary.select(
        "_pid",
        F.coalesce(F.sum("_ta").over(w_off), F.lit(0)).cast("long").alias("_offa"),
        F.coalesce(F.sum("_tb").over(w_off), F.lit(0)).cast("long").alias("_offb"),
        F.lead("_firstv").over(w_pid).alias("_nextfirst"),
    )
    grand = F.broadcast(
        summary.agg(
            F.sum("_ta").cast("long").alias("_na"), F.sum("_tb").cast("long").alias("_nb")
        )
    )
    joined = part.join(F.broadcast(offsets), "_pid").crossJoin(grand)
    cum_a = F.col("_cuma") + F.col("_offa")
    cum_b = F.col("_cumb") + F.col("_offb")
    # gap to the NEXT distinct union value; the globally-last value has
    # none and contributes 0 (the integral ends at the last jump)
    gap = F.coalesce(F.col("_leadv"), F.col("_nextfirst")) - F.col("v")
    if exact:
        dec = "decimal(20,0)"
        term = F.abs(
            cum_a.cast(dec) * F.col("_nb").cast(dec)
            - cum_b.cast(dec) * F.col("_na").cast(dec)
        ) * F.coalesce(gap, F.lit(0)).cast(dec)
        w1 = (
            F.sum(term).cast("double")
            / F.first((F.col("_na").cast(dec) * F.col("_nb").cast(dec)).cast("double"))
        ).alias("w1")
    else:
        term = F.abs(cum_a / F.col("_na") - cum_b / F.col("_nb")) * F.coalesce(
            gap, F.lit(0.0)
        )
        w1 = F.sum(term).alias("w1")
    return joined.agg(
        w1,
        F.first("_na").alias("n_a"),
        F.first("_nb").alias("n_b"),
    )


def chisq_drift(
    left: DataFrame,
    right: DataFrame,
    col: str,
) -> DataFrame:
    """CATEGORICAL drift (round 7) — the chi-squared homogeneity
    statistic the numeric KS/W1 pair cannot express: per category c
    with observed counts (o1, o2) and totals (n1, n2, N = n1+n2),
    expected e_i = n_i·(o1+o2)/N and contribution
    (o1−e1)²/e1 + (o2−e2)²/e2; the statistic is the sum over
    categories with (k−1) degrees of freedom.

    Deliberately emitted PER CATEGORY: each row's value is one fixed
    IEEE expression over exact integer counts (a single division
    chain, no unordered double sum), so the oracle hash-matches
    unrounded; the consumer folds the total in category order (few
    categories — model-sized). Totals ride a broadcast 1-row
    aggregate; the category join is a map-side union + one grouped
    count per side — no corpus shuffle beyond the counts.

    Output: (category, o1, o2, contrib).
    """
    c1 = left.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("o1")
    )
    c2 = right.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("o2")
    )
    both = (
        c1.join(c2, "category", "full")
        .select(
            "category",
            F.coalesce("o1", F.lit(0)).alias("o1"),
            F.coalesce("o2", F.lit(0)).alias("o2"),
        )
    )
    totals = both.agg(
        F.sum("o1").alias("n1"), F.sum("o2").alias("n2")
    )
    j = both.crossJoin(F.broadcast(totals))
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    t = (F.col("o1") + F.col("o2")).cast("double")
    big_n = (F.col("n1") + F.col("n2")).cast("double")
    e1 = n1 * t / big_n
    e2 = n2 * t / big_n
    o1d = F.col("o1").cast("double")
    o2d = F.col("o2").cast("double")
    contrib = (o1d - e1) * (o1d - e1) / e1 + (o2d - e2) * (o2d - e2) / e2
    return j.select(
        "category",
        F.col("o1").cast("long").alias("o1"),
        F.col("o2").cast("long").alias("o2"),
        contrib.alias("contrib"),
    )


def psi_drift(
    left: DataFrame,
    right: DataFrame,
    col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index contributions per category
    (round 9) — the drift score model-monitoring dashboards quote
    beside KS/chi-squared: with p = share in ``left`` and q = share in
    ``right``, PSI = sum((p − q)·ln(p/q)). Categories absent from one
    side would make the log infinite, so counts are Laplace-smoothed
    by ``smoothing`` (added to every category count on both sides —
    the standard finite-PSI device; 0 disables it and absent
    categories then raise the documented infinity).

    Same shape discipline as ``chisq_drift``: per-category rows whose
    value is one fixed IEEE expression over exact integer counts (no
    unordered double sum), totals on a broadcast 1-row aggregate —
    value-hashable unrounded; the consumer folds the total in category
    order. Rule of thumb: total < 0.1 stable, 0.1–0.25 drifting,
    > 0.25 shifted.

    Output: (category, o1, o2, p, q, contrib).
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    c1 = left.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("o1")
    )
    c2 = right.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("o2")
    )
    both = c1.join(c2, "category", "full").select(
        "category",
        F.coalesce("o1", F.lit(0)).alias("o1"),
        F.coalesce("o2", F.lit(0)).alias("o2"),
    )
    totals = both.agg(
        F.sum("o1").alias("n1"),
        F.sum("o2").alias("n2"),
        F.count(F.lit(1)).alias("k"),
    )
    j = both.crossJoin(F.broadcast(totals))
    s = F.lit(float(smoothing))
    p = (F.col("o1").cast("double") + s) / (
        F.col("n1").cast("double") + s * F.col("k").cast("double")
    )
    q = (F.col("o2").cast("double") + s) / (
        F.col("n2").cast("double") + s * F.col("k").cast("double")
    )
    return j.select(
        "category",
        F.col("o1").cast("long").alias("o1"),
        F.col("o2").cast("long").alias("o2"),
        p.alias("p"),
        q.alias("q"),
        ((p - q) * F.log(p / q)).alias("contrib"),
    )
