"""Skew-mitigation operators for hot keys at 100 TB.

AQE's skew-join splitting (on in session defaults) handles most join
skew at runtime. These helpers cover the cases AQE cannot re-plan:

- ``salted_join``: explicit salting for a shuffle join where one side's
  key distribution is pathologically hot (e.g. the null/default key).
  The skewed fact side gets a deterministic salt in [0, n); the small
  side is replicated n times. Result is exactly the plain join.
- ``two_phase_topk``: per-key top-k without one giant window partition
  per hot key — partial top-k per (key, salt) shard, then final top-k
  over the k*n survivors. Result is exactly the single-window top-k.
- ``salted_distinct_count``: COUNT(DISTINCT x) per hot key as a
  two-stage exact aggregation (distinct within shards, sum of disjoint
  shard cardinalities via hashing x into the salt).

All salts are deterministic expressions (xxhash64 of the row's own
columns) — reruns and retries produce identical partitioning, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _salt(cols: list[str | Column], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join with explicit salt: the skewed side's hot key rows
    spread across ``buckets`` shuffle partitions; the small side is
    replicated ``buckets`` x (it must be replication-sized — dims, not
    facts). Deterministic; equals ``skewed.join(small, on, how)``.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # right/full outer would emit `buckets` copies of each unmatched
        # replicated small-side row — semantics diverge from a plain join
        raise ValueError(f"salted_join supports inner/left/left_semi, got {how!r}")
    salt_cols = salt_from or [c for c in skewed.columns if c != on]
    left = skewed.withColumn("__salt", _salt(salt_cols or [on], buckets))
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return left.join(right, [on, "__salt"], how).drop("__salt")


def two_phase_topk(
    df: DataFrame,
    key: str,
    order_by: str,
    k: int,
    buckets: int = 8,
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows per key, skew-resistant.

    A plain ``row_number() OVER (PARTITION BY key ORDER BY v)`` sorts
    every row of a hot key in ONE task. Here each (key, salt) shard
    keeps its local top-k (bounded window), then the final window ranks
    only k*buckets survivors per key. Identical output to the plain
    window (ties broken by the full order column only — supply a
    total order, e.g. round(score) desc + id asc, for determinism).
    """
    direction = F.asc(order_by) if ascending else F.desc(order_by)
    shard = df.withColumn("__salt", _salt([c for c in df.columns], buckets))
    w_shard = Window.partitionBy(key, "__salt").orderBy(direction)
    survivors = (
        shard.withColumn("__rn", F.row_number().over(w_shard))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w_final = Window.partitionBy(key).orderBy(direction)
    return (
        survivors.withColumn("rank", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rank") <= k)
    )


def salted_distinct_count(
    df: DataFrame, key: str, value: str, buckets: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT value) GROUP BY key for hot keys.

    Stage 1 dedups (key, value) within value-hash shards — each shard
    sees a disjoint slice of the value domain, so shard cardinalities
    add exactly. Stage 2 sums the shard counts. Both stages have
    bounded partition sizes; no single reducer ever holds a hot key's
    whole distinct set.
    """
    sharded = df.select(
        key, F.col(value).alias("__v"), _salt([value], buckets).alias("__salt")
    )
    per_shard = sharded.groupBy(key, "__salt").agg(
        F.count_distinct("__v").alias("__c")
    )
    return per_shard.groupBy(key).agg(F.sum("__c").alias("n_distinct"))


def skew_report(df: DataFrame, key: str | Column) -> DataFrame:
    """One-row key-skew diagnosis — the measurement that decides
    between a plain join/agg, AQE skew splitting, and explicit salting
    (``salted_join``/``two_phase_topk``): per-key counts reduced to
    n_keys, total, max/median/p99 key count, and skew_ratio =
    max/mean. A ratio near 1 means balanced tasks; >> 1 means one key
    will own a straggler task at scale. Two aggregates over one scan;
    the second runs over one row per key, not the data.

    Exact percentiles over the per-key counts (the count table is
    bounded by key cardinality, the thing being diagnosed).
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_n"),
        F.round(F.percentile("n", F.lit(0.5)), 4).alias("p50_n"),
        F.round(F.percentile("n", F.lit(0.99)), 4).alias("p99_n"),
        F.round(F.max("n") / (F.sum("n") / F.count(F.lit(1))), 6).alias("skew_ratio"),
    )
