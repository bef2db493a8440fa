"""Versioned snapshot tables: time travel over plain parquet.

The Delta/Iceberg core idea with no table-format dependency: a table
is a directory of immutable version directories (``v00000001``, ...)
plus ONE small manifest file that lists the COMMITTED versions. A
version becomes visible atomically when the manifest is replaced
(``os.replace`` — atomic on POSIX), so readers never see a
half-written snapshot: a crash after the data rename but before the
manifest update leaves an orphan directory that no reader resolves
and the next writer/vacuum clears.

This composes with the rest of the engine:
- ``streaming.upsert_sink`` maintains the LATEST state; wrapping its
  output (or any batch result) in ``snapshot_write`` per refresh adds
  history — "what did the table say yesterday" becomes a
  ``version=`` argument instead of a restore-from-backup ticket.
- ``queries.training_ext.q_snapshot_diff`` already diffs two frames;
  pointing it at ``snapshot_read(v1)`` / ``snapshot_read(v2)`` gives
  the audit trail between any two commits.

Scale notes: the manifest holds one small JSON record per RETAINED
version (retention is ``snapshot_vacuum``'s job), never data; each
version directory is written by a normal distributed parquet job.
At 100 TB you'd write each version partitioned and let vacuum drop
whole directories — both are plain filesystem namespace operations,
no data rewrite.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def _read_manifest(table_dir: str) -> dict:
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return {"versions": []}
    with open(p) as fh:
        return json.load(fh)


def _write_manifest_atomic(table_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(table_dir))  # atomic publish


def _vdir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v{version:08d}")


def snapshot_write(
    df: DataFrame,
    table_dir: str,
    committed_at: str | None = None,
    meta: dict | None = None,
) -> int:
    """Commit ``df`` as the next version of the table; returns the
    version number. Write path: distributed parquet job into a
    ``_staging`` dir, rename to the version dir, then atomically
    replace the manifest — the commit point. A crashed earlier writer
    may have left an orphan version dir (renamed but never committed);
    since it is NOT in the manifest it was never visible, and the new
    commit clears and reclaims that slot. ``committed_at``/``meta``
    are caller-provided (deterministic pipelines pass their own batch
    timestamps rather than wall-clock)."""
    os.makedirs(table_dir, exist_ok=True)
    m = _read_manifest(table_dir)
    version = (max((v["version"] for v in m["versions"]), default=0)) + 1
    staging = os.path.join(table_dir, f"_staging_v{version:08d}")
    shutil.rmtree(staging, ignore_errors=True)
    df.write.mode("overwrite").parquet(staging)
    final = _vdir(table_dir, version)
    shutil.rmtree(final, ignore_errors=True)  # orphan from a crashed writer
    os.rename(staging, final)
    entry = {"version": version}
    if committed_at is not None:
        entry["committed_at"] = committed_at
    if meta:
        entry["meta"] = meta
    m["versions"].append(entry)
    _write_manifest_atomic(table_dir, m)
    return version


def snapshot_versions(table_dir: str) -> list[dict]:
    """Committed version records, oldest first (the history listing)."""
    return sorted(_read_manifest(table_dir)["versions"], key=lambda v: v["version"])


def snapshot_read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (default: latest). Resolution goes
    through the MANIFEST only — an orphan ``v...`` directory from a
    crashed writer is invisible by construction. Unknown/uncommitted
    versions raise with the available range."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no committed versions at {table_dir!r}")
    known = [v["version"] for v in versions]
    if version is None:
        version = known[-1]
    if version not in known:
        raise ValueError(
            f"version {version} is not committed at {table_dir!r}; "
            f"available: {known[0]}..{known[-1]} ({known})"
        )
    return spark.read.parquet(_vdir(table_dir, version))


def snapshot_vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed
    versions (never fewer than one) plus every uncommitted leftover
    (orphan version dirs, stale staging). Directory removal happens
    AFTER the manifest shrink is atomically published, so a crash
    mid-vacuum leaves unreferenced dirs (harmless, re-vacuumable),
    never a referenced-but-deleted version. Returns removed versions.

    Single-writer contract (same as the upsert sink): vacuum must not
    run concurrently with a writer — it would sweep the writer's
    renamed-but-not-yet-committed version dir as an orphan."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    m = _read_manifest(table_dir)
    versions = sorted(m["versions"], key=lambda v: v["version"])
    keep = versions[-keep_last:]
    drop = versions[: -keep_last] if len(versions) > keep_last else []
    kept_nums = {v["version"] for v in keep}
    _write_manifest_atomic(table_dir, {**m, "versions": keep})
    removed = []
    for v in drop:
        shutil.rmtree(_vdir(table_dir, v["version"]), ignore_errors=True)
        removed.append(v["version"])
    # uncommitted leftovers: staging dirs and orphan version dirs
    for name in os.listdir(table_dir):
        full = os.path.join(table_dir, name)
        if name.startswith("_staging_v") and os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith("v") and os.path.isdir(full):
            try:
                num = int(name[1:])
            except ValueError:
                continue
            if num not in kept_nums:  # dropped commit or never-committed orphan
                shutil.rmtree(full, ignore_errors=True)
    return removed
