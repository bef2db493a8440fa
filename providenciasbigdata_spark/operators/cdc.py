"""Change-data-capture compaction: latest-wins merge of a keyed change
stream into a current-state snapshot (the batch half of a CDC ingest;
the SCD2 history build lives in queries.relational).

``latest_state`` is one window per key — at 100 TB the shuffle is by
key (no global order), AQE handles skewed keys, and the same function
compacts either a raw change log or (snapshot UNION changes) for
incremental merges, since a snapshot is just a change set with older
versions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_state(
    changes: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    delete_predicate: Column | None = None,
) -> DataFrame:
    """Current state per key: keep the most recent change row
    (``order_cols`` descending, with the LAST order col as the total-
    order tiebreak), then drop keys whose latest change is a delete.

    The delete filter must run AFTER picking the latest row — filtering
    deletes first would resurrect an older upsert.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_predicate is not None:
        latest = latest.filter(~delete_predicate)
    return latest


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    delete_predicate: Column | None = None,
) -> DataFrame:
    """Incremental merge: snapshot rows participate as just another
    change set (their versions are older by construction), so the merge
    is UNION + latest_state — one shuffle by key, no join."""
    return latest_state(
        snapshot.unionByName(changes), keys, order_cols, delete_predicate
    )


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n",
) -> DataFrame:
    """Incremental aggregate maintenance: fold a new batch's partial
    aggregate into an existing (keys, sums, count) state WITHOUT
    rescanning history — the sums/counts are commutative monoids, so
    state ⊕ agg(delta) == agg(history ∪ delta) exactly (decimal sums;
    no float reordering). At 100 TB this turns a daily full-table
    rollup into work proportional to the delta plus the touched state
    partitions; the equality to the from-scratch aggregate is
    oracle-checked (``incremental_daily_revenue``).

    ``state`` and the returned frame share one schema:
    (keys..., <sum_cols>..., count_col) — the output of
    ``partial_agg`` below.
    """
    d = partial_agg(delta, keys, sum_cols, count_col)
    merged = state.unionByName(d)
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.sum(count_col).cast("bigint").alias(count_col),
    )


def partial_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n",
) -> DataFrame:
    """The mergeable per-key state: exact DECIMAL(28,10) sums + count."""
    return df.groupBy(*keys).agg(
        *[F.sum(F.col(c).cast("decimal(28,10)")).alias(c) for c in sum_cols],
        F.count("*").cast("bigint").alias(count_col),
    )
