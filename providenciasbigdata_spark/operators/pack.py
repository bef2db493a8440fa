"""Sequence packing for LLM training-data prep (SURVEY.md §2.5 C-X).

``packed_positions`` assigns every item its position in the
concat-and-slice packing: order items by a key, lay their token runs
end-to-end, slice the stream into fixed-``capacity`` context windows.
Each item gets the bin it STARTS in and its offset within that bin
(items may straddle a boundary — that is the standard "pack then
slice" trade-off; the alternative first-fit packing is not
order-deterministic and not SQL-expressible).

The global running sum is computed as a two-phase distributed prefix
sum — per-range-partition partial sums plus a broadcast of the tiny
per-partition offset table — NOT a single-partition window. A naive
``Window.orderBy(key)`` with no partitionBy funnels the whole table
through ONE task; this version keeps every stage parallel, so it holds
at 100 TB (the offset table has one row per partition regardless of
data volume).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def packed_positions(
    df: DataFrame,
    order_col: str | list[str],
    size_col: str,
    capacity: int,
    n_partitions: int = 32,
) -> DataFrame:
    """Add ``cum_before`` / ``bin_id`` / ``bin_offset`` columns.

    ``cum_before`` = total size of all items strictly before this one in
    ``order_col`` order (exact, independent of partitioning; pass a
    LIST of columns for a composite order — multi-column range
    partitioning is native, unlike struct columns);
    ``bin_id`` = cum_before // capacity; ``bin_offset`` = cum_before %
    capacity.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    part = df.repartitionByRange(
        n_partitions, *[F.col(c) for c in order_cols]
    ).withColumn("_pid", F.spark_partition_id())
    # phase 1: running sum within each range partition (parallel)
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    part = part.withColumn(
        "_within", F.coalesce(F.sum(size_col).over(w_in), F.lit(0)).cast("long")
    )
    # phase 2: one row per partition -> cumulative offsets. The
    # single-partition window here is over n_partitions rows, not data.
    totals = part.groupBy("_pid").agg(F.sum(size_col).alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).cast("long").alias("_off")
    )
    out = part.join(F.broadcast(offsets), "_pid")
    cum: Column = (F.col("_within") + F.col("_off")).alias("cum_before")
    return (
        out.select(*df.columns, cum)
        .withColumn("bin_id", (F.col("cum_before") / capacity).cast("long"))
        .withColumn("bin_offset", (F.col("cum_before") % capacity).cast("long"))
    )


def pack_first_fit(
    df: DataFrame,
    size_col: str,
    capacity: int,
    id_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """First-fit-DECREASING bin packing, sharded for scale — the
    no-split alternative to ``packed_positions``' concat-and-slice:
    each item lands whole in one bin (no document straddles a context
    boundary), at the cost of some slack per bin. FFD's guarantee
    (<= 11/9 OPT + 6/9 bins, Dósa 2007) holds per shard; sharding by
    ``md5(id) % n_shards`` adds at most (n_shards - 1) partially
    filled bins versus global FFD — negligible when every shard holds
    many bins, which is exactly the 100 TB regime. The greedy scan is
    inherently sequential, so it runs per shard inside ONE
    applyInPandas kernel; Spark's only shuffle is the shard
    repartition.

    Deterministic: shard assignment is a hash (md5-prefix, the
    engine-agnostic key discipline of operators.mix — round 11
    switched from xxhash64 so a SQL oracle can replay the shard
    partition and hence the whole packing), in-shard order is
    (size DESC, id ASC), bins are scanned first-fit — no RNG, no
    partition-order dependence; re-runs and retries produce the same
    packing. Items with ``size > capacity`` (or NULL/non-positive)
    raise — they can never be placed.

    Output: one row per item — (``id_col``, ``size_col``, ``shard``,
    ``bin_id`` [globally unique: shard * 2^32 + in-shard bin index],
    ``bin_offset`` [fill level before placement]).
    """
    import pandas as pd

    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(size_col).cast("long").alias("size"),
        F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(n_shards),
        )
        .cast("int")
        .alias("shard"),
    )

    cap = int(capacity)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["size", "id"], ascending=[False, True])
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        fills: list[int] = []  # current fill per open bin
        bin_ids, offsets = [], []
        for sz in pdf["size"]:
            if sz is None or sz <= 0 or sz > cap:
                raise ValueError(
                    f"pack_first_fit: item size {sz} not in (0, {cap}]"
                )
            sz = int(sz)
            for j, fill in enumerate(fills):
                if fill + sz <= cap:
                    bin_ids.append(j)
                    offsets.append(fill)
                    fills[j] = fill + sz
                    break
            else:
                bin_ids.append(len(fills))
                offsets.append(0)
                fills.append(sz)
        return pd.DataFrame(
            {
                "id": pdf["id"].values,
                "size": pdf["size"].values,
                "shard": pdf["shard"].values,
                "bin_id": [shard * (2**32) + b for b in bin_ids],
                "bin_offset": offsets,
            }
        )

    out = base.groupBy("shard").applyInPandas(
        kernel, "id long, size long, shard int, bin_id long, bin_offset long"
    )
    return out.select(
        F.col("id").alias(id_col),
        F.col("size").alias(size_col),
        "shard",
        "bin_id",
        "bin_offset",
    )
