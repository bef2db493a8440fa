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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ONE right row by temporal proximity —
    pandas' ``merge_asof`` / DuckDB's ASOF JOIN semantics with the full
    direction matrix, expressed as pure DataFrame ops:

    - ``direction="backward"`` (default): most recent right row with
      ``on`` <= the left's (``strict=True`` => strictly <);
    - ``"forward"``: earliest right row with ``on`` >= the left's
      (strict => strictly >);
    - ``"nearest"``: the closer of the two candidates; exact ties
      prefer BACKWARD (pandas' rule). ``on`` must be castable to
      double for the distance compare (numerics and timestamps are).

    Mechanism: tag both sides, union aligned on (by, on, payload),
    then a cumulative window per ``by`` — ascending for backward
    (last right payload seen so far), descending for forward (the
    same "last seen" over the reversed order = first following) —
    keeps left rows. Side tags order right rows before left at equal
    ``on`` when inclusive, after when strict, in EITHER direction.
    If several right rows share (by, on), the winner is deterministic
    given unique (by, on) on the right; ties otherwise unspecified.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest: {direction}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_cols]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    # hidden payload: the matched right row's own `on`, needed for the
    # nearest distance compare (and harmless otherwise)
    carry = list(right_cols) + ["__on"]

    l_tag = left.withColumn("__side", F.lit(1 if not strict else 0))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("__r___on", F.lit(None).cast(right.schema[on].dataType))
    r_tag = right.select(
        *by_cols,
        F.col(on),
        F.lit(0 if not strict else 1).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(on).alias("__r___on"),
    )
    left_payload = [c for c in left.columns if c not in by_cols and c != on]
    for c in left_payload:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [*by_cols, on, "__side", *[f"__r_{c}" for c in carry], *left_payload]
    unioned = l_tag.select(*cols).unionByName(r_tag.select(*cols))

    def cum_window(descending: bool):
        order = [
            F.col(on).desc() if descending else F.col(on).asc(),
            F.col("__side").asc(),
        ]
        base = (
            Window.partitionBy(*by_cols).orderBy(*order)
            if by_cols
            else Window.orderBy(*order)
        )
        return base.rowsBetween(Window.unboundedPreceding, 0)

    if direction in ("backward", "forward"):
        w = cum_window(descending=direction == "forward")
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
    else:  # nearest: both passes, pick the closer (ties -> backward)
        wb, wf = cum_window(False), cum_window(True)
        picked = unioned.select(
            *by_cols,
            on,
            "__side",
            *left_payload,
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
                for c in carry
            ],
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
                for c in carry
            ],
        )
        here = F.col(on).cast("double")
        d_back = here - F.col("__b___on").cast("double")
        d_fwd = F.col("__f___on").cast("double") - here
        use_back = F.col("__f___on").isNull() | (
            F.col("__b___on").isNotNull() & (d_back <= d_fwd)
        )
        filled = picked.select(
            *by_cols,
            on,
            "__side",
            *left_payload,
            *[
                F.when(use_back, F.col(f"__b_{c}"))
                .otherwise(F.col(f"__f_{c}"))
                .alias(out_names[c])
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
