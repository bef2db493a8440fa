"""Join operators Spark lacks natively: as-of join, range join.

The reference has no joins at all (SURVEY.md §2.4: "absent — the two
stores are never correlated in one query"); these are engine extensions
required by the driver harness and any time-series workload.

Scale design: the as-of join here is the union+window formulation —
ONE shuffle of (left ∪ right) hash-partitioned by key, then a
per-partition sort — instead of a per-key ``merge_asof`` in Python or
an O(n·m) range cross-join. At 100TB this is the only formulation that
doesn't blow up: the shuffle is linear in input size and AQE handles
key skew by splitting oversized partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row whose ``on``
    value is <= the left's (``strict=True`` => strictly <), optionally
    per ``by`` key group. pandas' ``merge_asof`` / DuckDB's ASOF JOIN
    semantics, expressed as pure DataFrame ops:

        1. tag both sides, union them aligned on (by, on, payload)
        2. window per ``by`` ordered by (on, side-tag): last non-null
           right payload seen so far = the as-of match
        3. keep left rows

    Right rows sort BEFORE left rows at equal ``on`` when inclusive
    (so an equal-timestamp right row matches), AFTER when strict.
    If several right rows share (by, on), the one with the greatest
    ``on`` (then latest in tag order) wins — deterministic given unique
    (by, on) on the right; document ties as unspecified otherwise.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_cols]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    l_tag = left.withColumn("__side", F.lit(1 if not strict else 0))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        *by_cols,
        F.col(on),
        F.lit(0 if not strict else 1).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    left_payload = [c for c in left.columns if c not in by_cols and c != on]
    for c in left_payload:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.select(
        *by_cols, on, "__side", *[f"__r_{c}" for c in right_cols], *left_payload
    ).unionByName(
        r_tag.select(*by_cols, on, "__side", *[f"__r_{c}" for c in right_cols], *left_payload)
    )

    w = (
        Window.partitionBy(*by_cols).orderBy(F.col(on).asc(), F.col("__side").asc())
        if by_cols
        else Window.orderBy(F.col(on).asc(), F.col("__side").asc())
    ).rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        *by_cols,
        on,
        "__side",
        *left_payload,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(out_names[c])
            for c in right_cols
        ],
    )
    is_left = F.col("__side") == (1 if not strict else 0)
    return filled.filter(is_left).drop("__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    by: list[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    containing them. Naive theta-join is O(n·m); with ``bucket_width``
    both sides are bucketized and equi-joined on (by, bucket) first —
    intervals are exploded over the buckets they span — turning the
    physical plan into a hash join + residual filter (the standard
    bucketed range-join trick; Databricks' range-join hint does the
    same). Pick ``bucket_width`` ~ the typical interval length.
    """
    by = by or []
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    for k in by:
        cond = cond & (left[k] == right[k])
    if bucket_width is None:
        return left.join(right, cond)

    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / F.lit(bucket_width)))
    rb = right.withColumn(
        "__buckets",
        F.sequence(
            F.floor(F.col(right_lo) / F.lit(bucket_width)),
            F.floor(F.col(right_hi) / F.lit(bucket_width)),
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    keys = [*by, "__bucket"]
    return (
        lb.join(rb, on=keys)
        .filter((F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi)))
        .drop("__bucket")
    )
