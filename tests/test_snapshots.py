"""Versioned snapshot tables: time travel, crash-window invisibility,
retention vacuum."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from providenciasbigdata_spark.operators.snapshots import (
    snapshot_read,
    snapshot_vacuum,
    snapshot_versions,
    snapshot_write,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_snapshot_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = snapshot_write(_mk(spark, [(1, "a"), (2, "b")]), t, committed_at="t1")
    v2 = snapshot_write(_mk(spark, [(1, "a2"), (3, "c")]), t, committed_at="t2")
    assert (v1, v2) == (1, 2)
    hist = snapshot_versions(t)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["committed_at"] == "t1"

    latest = {r.k: r.val for r in snapshot_read(spark, t).collect()}
    assert latest == {1: "a2", 3: "c"}
    old = {r.k: r.val for r in snapshot_read(spark, t, version=1).collect()}
    assert old == {1: "a", 2: "b"}  # time travel: v1 unchanged after v2

    with pytest.raises(ValueError, match="not committed"):
        snapshot_read(spark, t, version=9)
    with pytest.raises(ValueError, match="no committed versions"):
        snapshot_read(spark, str(tmp_path / "empty"))


def test_snapshot_orphan_invisible_and_reclaimed(spark, tmp_path):
    """Crash between data rename and manifest publish: the version dir
    exists but was never committed — readers never resolve it, the
    next writer reclaims the slot, vacuum sweeps it."""
    t = str(tmp_path / "tbl")
    snapshot_write(_mk(spark, [(1, "a")]), t)
    # simulate the crashed writer: v2 directory on disk, no manifest entry
    _mk(spark, [(9, "GHOST")]).write.parquet(os.path.join(t, "v00000002"))
    assert [h["version"] for h in snapshot_versions(t)] == [1]
    assert {r.k for r in snapshot_read(spark, t).collect()} == {1}
    with pytest.raises(ValueError, match="not committed"):
        snapshot_read(spark, t, version=2)

    # next commit reclaims slot 2 with the REAL data
    v = snapshot_write(_mk(spark, [(2, "b")]), t)
    assert v == 2
    assert {r.val for r in snapshot_read(spark, t, version=2).collect()} == {"b"}


def test_snapshot_vacuum_retention(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(5):
        snapshot_write(_mk(spark, [(i, f"v{i}")]), t)
    # stale staging leftover
    os.makedirs(os.path.join(t, "_staging_v00000099"))
    removed = snapshot_vacuum(t, keep_last=2)
    assert removed == [1, 2, 3]
    assert [h["version"] for h in snapshot_versions(t)] == [4, 5]
    names = set(os.listdir(t))
    assert "v00000004" in names and "v00000005" in names
    assert not any(n.startswith("_staging") for n in names)
    assert "v00000001" not in names
    # dropped versions no longer readable; retained still are
    with pytest.raises(ValueError, match="not committed"):
        snapshot_read(spark, t, version=1)
    assert {r.val for r in snapshot_read(spark, t, version=4).collect()} == {"v3"}
    with pytest.raises(ValueError):
        snapshot_vacuum(t, keep_last=0)
    # vacuum never drops below one version
    snapshot_vacuum(t, keep_last=1)
    assert [h["version"] for h in snapshot_versions(t)] == [5]
    assert {r.val for r in snapshot_read(spark, t).collect()} == {"v4"}


def test_snapshot_diff_between_versions(spark, tmp_path):
    """The audit-trail composition: snapshot_diff over two committed
    versions reports exactly the rows that changed between them."""
    from providenciasbigdata_spark.operators.cdc import snapshot_diff

    t = str(tmp_path / "tbl")
    snapshot_write(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    snapshot_write(_mk(spark, [(1, "a"), (2, "B2"), (4, "d")]), t)
    d = snapshot_diff(
        snapshot_read(spark, t, version=1),
        snapshot_read(spark, t, version=2),
        keys=["k"],
    )
    got = {(r.k, r.change) for r in d.collect()}
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}
