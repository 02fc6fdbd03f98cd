"""Transactional table manifest log (SURVEY.md §2 M208) — the
Delta-/Iceberg-style primitive the A6c/A6d/M24/M93 table-maintenance
family circles around: an ordered log of JSON commit files that *is*
the table, giving ACID append, snapshot-isolated reads, TIME TRAVEL,
and optimistic-concurrency conflict detection on plain parquet — no
table format dependency, just the public transaction-log design
(Armbrust et al., "Delta Lake: High-Performance ACID Table Storage
over Cloud Object Stores", VLDB 2020).

Layout::

    table_dir/
      _manifest/v000001.json   {"version": 1, "files": [...], "op": ...}
      _manifest/v000002.json
      data/<uuid>/part-*.parquet

Protocol (the Delta paper's, minus the checkpoint compaction):

- A writer stages data files under a unique subdirectory (invisible to
  readers — readers only trust the manifest), then COMMITS by creating
  ``_manifest/v{N+1}.json`` with O_CREAT|O_EXCL — the atomic
  put-if-absent every real object store provides.  If the file already
  exists, another writer won the race: ``ConflictError`` — the caller
  re-reads the latest snapshot and retries (optimistic concurrency).
- A reader lists ``_manifest`` once, picks the highest version (or the
  requested one — time travel), and scans exactly the files that
  version names.  Readers never see a torn write: either the commit
  file exists (all its data files were fully written first) or it
  doesn't.

Scale: the log holds FILE PATHS, not rows — commit cost is O(1)
metadata regardless of table size; a snapshot read is an explicit-file
parquet scan, so partition pruning / pushdown work unchanged.  At
100 TB the manifest of a 1e6-file table is ~100 MB of JSON — the
design point checkpointing exists for; ``log_versions`` is the hook a
checkpoint writer would consume.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifest"


class ConflictError(RuntimeError):
    """Another writer committed the version this writer targeted."""


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version:06d}.json")


def log_versions(table_dir: str) -> list[int]:
    """All committed versions, ascending.  Empty for a fresh table."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def latest_version(table_dir: str) -> int:
    """Highest committed version; 0 for a fresh table."""
    versions = log_versions(table_dir)
    return versions[-1] if versions else 0


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def log_append(
    df: DataFrame,
    table_dir: str,
    expected_version: int | None = None,
    op: str = "append",
) -> int:
    """Stage ``df`` as parquet files, then atomically commit them as
    the next table version.  Returns the committed version number.

    ``expected_version`` is the optimistic-concurrency token: the
    version the writer based its work on (``latest_version(...)`` at
    read time).  If another writer committed meanwhile, the O_EXCL
    create of the commit file fails and ``ConflictError`` is raised —
    the staged data files are orphans the manifest never references
    (a vacuum's job), so the table state is untouched.  Passing None
    skips the check ONLY for a fresh level-0 append convenience and
    still detects races on the chosen version.
    """
    if expected_version is None:
        expected_version = latest_version(table_dir)
    new_version = expected_version + 1

    stage = os.path.join(table_dir, "data", uuid.uuid4().hex)
    df.write.mode("error").parquet(stage)
    files = sorted(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    )

    prior_files: list[str] = []
    if expected_version > 0:
        prior_files = _read_manifest(table_dir, expected_version)["files"]

    manifest = {
        "version": new_version,
        "op": op,
        "files": prior_files + files,
        "added": files,
        "schema": df.schema.jsonValue(),
    }
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    path = _manifest_path(table_dir, new_version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise ConflictError(
            f"version {new_version} already committed (writer based on "
            f"v{expected_version} lost the race) — re-read and retry"
        ) from exc
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    return new_version


def log_overwrite(
    df: DataFrame, table_dir: str, expected_version: int | None = None
) -> int:
    """Commit a version that REPLACES the table contents (the
    ``mode("overwrite")`` analogue): prior versions stay readable via
    time travel; only the new version's file list drops the history."""
    if expected_version is None:
        expected_version = latest_version(table_dir)
    new_version = expected_version + 1
    stage = os.path.join(table_dir, "data", uuid.uuid4().hex)
    df.write.mode("error").parquet(stage)
    files = sorted(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    )
    manifest = {
        "version": new_version,
        "op": "overwrite",
        "files": files,
        "added": files,
        "schema": df.schema.jsonValue(),
    }
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    path = _manifest_path(table_dir, new_version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise ConflictError(
            f"version {new_version} already committed"
        ) from exc
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    return new_version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot-isolated read: scan exactly the files the manifest
    version names (latest if None) — TIME TRAVEL is just naming an
    older version.  Explicit file list, so concurrent commits cannot
    change what this plan reads."""
    if version is None:
        version = latest_version(table_dir)
    if version == 0:
        raise ValueError(f"no committed versions in {table_dir}")
    manifest = _read_manifest(table_dir, version)
    return spark.read.parquet(*manifest["files"])
