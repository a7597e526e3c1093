"""Minimal versioned table layer over parquet ("poor-man's lakehouse"):
manifest-listed snapshots with atomic commits, snapshot-isolated reads,
time travel, and vacuum.

Spark's file-based parquet tables have no multi-writer atomicity and no
history — a half-written directory is visible immediately, and overwrite
destroys the past. The standard open-table fix (Delta/Iceberg/Hudi) is a
TRANSACTION LOG: data files are immutable, and a tiny versioned manifest
names the files each snapshot comprises; commits are one atomic rename.
This module implements that core so the engine can demonstrate the
semantics without external table-format packages:

- `data-<version>-<uuid>/` immutable parquet directories, written once;
- `_log/v{N}.json` manifests, committed via temp-file + `os.rename`
  (atomic on POSIX) — a reader either sees a complete version or the
  previous one, never a partial write;
- readers resolve a manifest FIRST, then read exactly its file set:
  concurrent appends cannot tear a running query (snapshot isolation);
- `vacuum` deletes data dirs no LIVE manifest references — history
  pruning is an explicit, separate act, so time travel stays correct
  until the operator chooses retention.

At 100 TB the same design holds: manifests stay KB-sized (they list
directories, not rows), commits stay O(1), and data files are only ever
added or garbage-collected, never rewritten in place.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"v{version}.json")


def latest_version(path: str) -> int | None:
    """Highest committed version, or None for an empty/absent table."""
    log = _log_dir(path)
    if not os.path.isdir(log):
        return None
    versions = [
        int(f[1:-5])
        for f in os.listdir(log)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def _commit(
    path: str,
    version: int,
    dirs: list[str],
    mode: str,
    meta: dict | None = None,
) -> None:
    """Atomically publish a manifest: write to a temp name, fsync, then
    rename into place — readers never observe a partial manifest.
    ``meta`` carries committer bookkeeping (e.g. a streaming batch id
    for exactly-once sinks)."""
    os.makedirs(_log_dir(path), exist_ok=True)
    target = _manifest_path(path, version)
    if os.path.exists(target):
        raise ValueError(f"version {version} already committed")
    tmp = target + f".tmp-{uuid.uuid4().hex}"
    body = {"version": version, "mode": mode, "dirs": dirs}
    if meta:
        body["meta"] = meta
    with open(tmp, "w") as f:
        json.dump(body, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, target)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    meta: dict | None = None,
) -> int:
    """Commit ``df`` as a new version. ``append`` adds to the current
    snapshot's file set; ``overwrite`` starts a fresh set (history
    remains readable). Returns the committed version number."""
    if mode not in ("append", "overwrite"):
        raise ValueError(mode)
    prev = latest_version(path)
    version = 0 if prev is None else prev + 1
    data_dir = f"data-{version:05d}-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(os.path.join(path, data_dir))
    base = [] if (mode == "overwrite" or prev is None) else _read_manifest(
        path, prev
    )["dirs"]
    _commit(path, version, base + [data_dir], mode, meta=meta)
    return version


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: resolve the manifest (latest or the time-travel
    ``version``), then scan exactly its directories."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed versions at {path}")
    dirs = _read_manifest(path, v)["dirs"]
    if not dirs:
        raise ValueError(f"version {v} is empty")
    return spark.read.parquet(*[os.path.join(path, d) for d in dirs])


def table_history(path: str) -> list[dict]:
    """All committed manifests, oldest first (the audit trail)."""
    last = latest_version(path)
    if last is None:
        return []
    return [_read_manifest(path, v) for v in range(last + 1)]


def vacuum(path: str, keep_versions: int = 1) -> list[str]:
    """Drop manifests older than the newest ``keep_versions`` and delete
    data dirs no surviving manifest references. Returns removed dirs.
    Time travel beyond the retention window is traded for space — the
    explicit operator decision, never an implicit side effect."""
    last = latest_version(path)
    if last is None:
        return []
    cutoff = max(0, last - keep_versions + 1)
    live: set[str] = set()
    for v in range(cutoff, last + 1):
        live.update(_read_manifest(path, v)["dirs"])
    removed = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith("data-") and entry not in live:
            shutil.rmtree(os.path.join(path, entry))
            removed.append(entry)
    for v in range(cutoff):
        manifest = _manifest_path(path, v)
        if os.path.exists(manifest):
            os.remove(manifest)
    return removed


def merge_table(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    meta: dict | None = None,
) -> int:
    """MERGE (upsert): source rows UPDATE matching keys and INSERT new
    ones; untouched current rows carry over. Implemented as
    copy-on-write against the current snapshot — one full-outer join by
    key, then an atomic `overwrite` commit, so readers see the pre- or
    post-merge version, never a blend. This is the open-table MERGE INTO
    semantic on immutable files; at scale the join shuffles once on the
    key and AQE handles source/target size asymmetry (a small CDC batch
    broadcasts against the big snapshot)."""
    current = read_table(spark, path)
    cols = current.columns
    if source.columns != cols:
        raise ValueError(f"source columns {source.columns} != table {cols}")
    from pyspark.sql import functions as F

    src = source.select(
        *key_cols,
        F.struct(*[F.col(c) for c in cols]).alias("_src"),
    )
    cur = current.select(
        *key_cols,
        F.struct(*[F.col(c) for c in cols]).alias("_cur"),
    )
    merged = (
        cur.join(src, key_cols, "full_outer")
        .select(F.coalesce("_src", "_cur").alias("_row"))
        .select([F.col(f"_row.{c}").alias(c) for c in cols])
    )
    return write_table(merged, path, mode="overwrite", meta=meta)


def diff_versions(
    spark: SparkSession, path: str, old: int, new: int
) -> DataFrame:
    """Change feed between two snapshots, computed as bag-semantics set
    differences: rows only in ``new`` are tagged 'insert', rows only in
    ``old`` are 'delete' (an updated row appears as one of each — the
    classic CDC decomposition when the log stores snapshots, not
    row-level changes). EXCEPT ALL keeps duplicate multiplicity honest."""
    from pyspark.sql import functions as F

    old_df = read_table(spark, path, version=old)
    new_df = read_table(spark, path, version=new)
    inserts = new_df.exceptAll(old_df).select(
        F.lit("insert").alias("change"), "*"
    )
    deletes = old_df.exceptAll(new_df).select(
        F.lit("delete").alias("change"), "*"
    )
    return inserts.unionByName(deletes)


def optimize_table(
    spark: SparkSession, path: str, target_files: int = 1
) -> int:
    """OPTIMIZE: rewrite the current snapshot into ``target_files``
    right-sized files and commit the compacted layout as a new version —
    logically a no-op (same rows), physically the small-file fix.
    Because it goes through the same atomic commit path, readers never
    see a half-compacted table, and the pre-compaction version remains
    time-travelable until vacuumed. The streaming-append + periodic
    OPTIMIZE + vacuum loop is the standard lakehouse maintenance cycle
    (operators/scale.py:compact_parquet is the raw-directory sibling)."""
    current = read_table(spark, path)
    return write_table(
        current.repartition(target_files), path, mode="overwrite"
    )


def fsck(path: str) -> dict:
    """Consistency audit between the transaction log and the filesystem:
    data dirs referenced by a live manifest but missing on disk
    (corruption — reads will fail) and dirs present but referenced by no
    manifest (leaks — vacuum candidates or torn writes). Returns
    {'missing': [...], 'orphans': [...]}; empty lists = healthy."""
    last = latest_version(path)
    referenced: set[str] = set()
    if last is not None:
        for v in range(last + 1):
            if os.path.exists(_manifest_path(path, v)):
                referenced.update(_read_manifest(path, v)["dirs"])
    on_disk = {
        e for e in os.listdir(path) if e.startswith("data-")
    } if os.path.isdir(path) else set()
    return {
        "missing": sorted(referenced - on_disk),
        "orphans": sorted(on_disk - referenced),
    }
