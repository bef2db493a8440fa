"""Frequency-sketch operators: bounded-memory heavy hitters.

``heavy_hitters`` finds all values occurring in more than ``phi`` of
the rows with EXACT final counts, in two passes:

1. per-partition Misra-Gries sketches (``k = ceil(1/phi)`` counters,
   batch-weighted decrement) emit a candidate set. MG's guarantee
   composes across partitions by pigeonhole: an item with global count
   > phi*n must exceed phi*n_p on at least one partition p, so the
   union of partition sketches has NO false negatives.
2. exact counts for candidates only (semi-join + groupBy), filter
   > phi*n.

The result is therefore IDENTICAL to the exact
``GROUP BY .. HAVING cnt > phi*n`` — which is what the DuckDB oracle
runs — while pass 1 holds O(k) state per task no matter how many
distinct values stream through (the exact groupBy would hold the full
key space in the shuffle). At 100 TB with billions of distinct keys,
that's the difference between a bounded sketch and an OOM.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate values (one column
    ``candidate``, distinct). Batch-weighted updates: merge each Arrow
    batch's value_counts into the counter set; on overflow subtract the
    (k+1)-th largest counter value from all and drop non-positive —
    every decrement round removes >= k+1 units of mass per unit
    subtracted, preserving the classic MG bound."""
    import numpy as np
    import pandas as pd

    def sketch(batches):
        counters = pd.Series(dtype="int64")
        for b in batches:
            vc = b[col].dropna().value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                vals = counters.to_numpy()
                delta = np.partition(vals, -(k + 1))[-(k + 1)]
                counters = counters[counters > delta] - delta
        yield pd.DataFrame({"candidate": counters.index})

    return df.select(col).mapInPandas(
        sketch, f"candidate {df.schema[col].dataType.simpleString()}"
    ).distinct()


def heavy_hitters(df: DataFrame, col: str, phi: float = 0.01) -> DataFrame:
    """All values of ``col`` with count > phi * n, exact counts.
    Output: (col, cnt) — equal to the exact HAVING query by MG's
    no-false-negative guarantee + the exact second pass."""
    if not 0 < phi < 1:
        raise ValueError("phi must be in (0, 1)")
    k = math.ceil(1.0 / phi)
    n = df.count()
    cands = mg_candidates(df, col, k)
    exact = (
        df.join(F.broadcast(cands), df[col] == cands.candidate, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return exact.filter(F.col("cnt") > phi * n)


def hll_daily_cumulative(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    lg_k: int = 14,
) -> DataFrame:
    """Mergeable distinct-count sketches (Datasketches HLL, built into
    Spark >= 3.5): one sketch per day, then cumulative distincts by
    UNIONING the daily sketches — never rescanning the raw events.

    This is the 100 TB pattern for incremental distinct metrics: a
    nightly job appends one (day, sketch) row; any window's distinct
    count is a merge over the tiny sketch table (bytes per day,
    constant in data volume). The cumulative merge below is a
    triangular self-join over the per-day sketch rows — |days|^2 rows
    of kilobyte sketches, independent of event volume.

    Output: (day, daily_users, cum_users) — both estimates, bigint.
    """
    daily = events.groupBy(F.date_trunc("day", ts_col).alias("day")).agg(
        F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("sk")
    )
    upto = daily.select(F.col("day").alias("d2"), F.col("sk").alias("sk2"))
    cum = (
        daily.join(upto, F.col("d2") <= F.col("day"))
        .groupBy("day", "sk")
        .agg(F.hll_union_agg("sk2").alias("sk_cum"))
    )
    return cum.select(
        "day",
        F.hll_sketch_estimate("sk").cast("bigint").alias("daily_users"),
        F.hll_sketch_estimate("sk_cum").cast("bigint").alias("cum_users"),
    ).orderBy("day")


# ---- count-min sketch (pure DataFrame construction) ---------------------

def _cms_bucket(col: str, salt: int, width: int, hash_family: str):
    """One CMS row-hash bucket expression. ``"xxhash64"`` (default):
    fastest per value, JVM-side — the 100-TB build path. ``"md5"``:
    md5-prefix of ``value:salt`` mod width — 2-4x slower but
    replayable by any SQL engine (the same speed-vs-oracle trade the
    SimHash-v2 and quantized-classifier families made), which is what
    lets an external oracle rebuild the sketch bit-for-bit."""
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(F.col(col), F.lit(salt)), F.lit(width))
    if hash_family == "md5":
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col(col), F.lit(str(salt)))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % F.lit(width)
        )
    raise ValueError(f"unknown hash_family: {hash_family!r}")

def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
    weight_col: str | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Count-min sketch materialized as a (row, bucket, cnt) counter
    table: ``depth`` independent hash rows of ``width`` buckets.

    Built with one explode + one hash aggregate — entirely JVM-side
    (xxhash64/pmod, whole-stage codegen), no UDF. The counter key
    space is depth*width (small, bounded), so the shuffle after the
    map-side partial agg moves at most depth*width rows per partition
    regardless of input size — this is the point of a sketch at 100 TB:
    frequency structure in O(d*w) space from one scan. Sketches built
    shard-by-shard with the same (depth, width, seed) merge by summing
    counters (union + re-agg), which is how a 1000-executor fleet
    combines per-shard sketches without re-scanning.

    ``weight_col`` builds the identical sketch from pre-aggregated
    (value, weight) pairs — e.g. a vocabulary table of token counts —
    summing weights instead of counting rows. Mathematically the same
    counters as a raw-stream build (pinned by tests), at vocabulary
    cost instead of token-stream cost.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_bucket(col, seed + i, width, hash_family).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    w = F.lit(1).cast("bigint") if weight_col is None else F.col(weight_col)
    return (
        df.select(F.explode(cells).alias("h"), w.alias("w"))
        .groupBy(F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` against a
    ``cms_build`` table: est(x) = min over rows of counter[row,
    h_row(x)] — the classic CMS upper-bounding estimate (est >= true
    count always; est <= true + eps*N w.h.p. for width = ceil(e/eps)).

    The probe side is tiny (a candidate set), so the join against the
    bounded counter table broadcasts; no full-data rescan.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_bucket(col, seed + i, width, hash_family).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probe_cells = probes.select(F.col(col), F.explode(cells).alias("h")).select(
        col, F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket")
    )
    return (
        probe_cells.join(cms, ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(col)
        .agg(F.min("cnt").cast("bigint").alias("cms_count"))
    )
