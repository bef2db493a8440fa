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
