"""Table maintenance: small-file compaction and tombstone expiry.

Copy-on-write MERGE (operators/merge.py) rewrites only key-intersecting
files, so over many epochs the table accumulates (a) small files from
low-volume epochs and (b) tombstone rows kept for cross-batch LWW ordering
(table.py docstring). Both degrade scans at 100 TB: small files blow up task
scheduling overhead; tombstones inflate every read's filter work.

- ``compact``: bin-packs live data files below a size threshold into
  range-partitioned files of the target row count. Pure rewrite — state is
  unchanged (asserted in tests), lineage/fences untouched.
- ``expire_tombstones``: physically drops tombstone rows whose
  ``_commit_lsn`` is at or below the feed's global low-watermark — i.e. no
  in-flight event can still lose to them, so cross-batch LWW no longer needs
  them. The reference's analog is workspace auto-clean after a completed run
  (``src/common/Workspace.scala:25-30``): discard state that no future step
  can observe.

Both run as ordinary snapshot commits, so time travel to the pre-maintenance
snapshot still works until ``expire_snapshots``.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from etl_spark.schema import HIDDEN_LSN
from etl_spark.table.table import HIDDEN_DELETED, LakeTable, file_stats


def _rewrite(table: LakeTable, df, remove_paths: set[str], target_rows_per_file: int, summary: dict) -> int:
    spark = table.spark
    n_rows = df.count()
    sid_next = table.head_id() + 1
    stage = table.stage_dir(sid_next)
    n_files = max(1, min(spark.sparkContext.defaultParallelism, (n_rows // target_rows_per_file) + 1))
    (
        df.repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(stage)
    )
    schema_version = table.snapshot()["schema_version"]
    add_files = []
    for fn in sorted(os.listdir(stage)):
        if fn.endswith(".parquet"):
            st = file_stats(os.path.join(stage, fn))
            st["schema_version"] = schema_version
            add_files.append(st)
    return table.commit(add_files=add_files, remove_paths=remove_paths, summary=summary)


def compact(table: LakeTable, small_file_rows: int = 100_000, target_rows_per_file: int = 1_000_000) -> int | None:
    """Bin-pack files smaller than ``small_file_rows`` into full-size,
    range-partitioned files. Returns the new snapshot id, or None if fewer
    than two small files exist (nothing to gain). Reads through the
    rename-aware loader so files written under pre-rename schema versions
    are rewritten under the CURRENT column names (a raw mergeSchema read
    would union old and new names into two columns)."""
    snap = table.snapshot()
    small = [f for f in snap["files"] if f["rows"] < small_file_rows]
    if len(small) < 2:
        return None
    paths = {f["path"] for f in small}
    df = table.load_files(small, snap)
    return _rewrite(
        table,
        df,
        remove_paths=paths,
        target_rows_per_file=target_rows_per_file,
        summary={"maintenance": "compact", "files_in": len(small)},
    )


def gc_orphans(table: LakeTable) -> list[str]:
    """Remove data files referenced by NO snapshot — the debris of a write
    that crashed between staging its files and committing (the commit is the
    atomic point; staged-but-uncommitted files are invisible to readers and
    safe to delete). Single-writer assumption: no in-flight write exists when
    this runs (same assumption as the HEAD-rename commit protocol,
    table.py docstring). Returns the removed paths."""
    head = table.head_id()
    referenced = {f["path"] for s in range(head + 1) for f in table.snapshot(s)["files"]}
    removed: list[str] = []
    if not os.path.isdir(table.data_dir):
        return removed
    for d in sorted(os.listdir(table.data_dir)):
        full = os.path.join(table.data_dir, d)
        if not os.path.isdir(full):
            continue
        entries = sorted(os.listdir(full))
        parquet = [os.path.join(full, fn) for fn in entries if fn.endswith(".parquet")]
        if not any(p in referenced for p in parquet):
            # wholly-orphaned stage dir: remove it including _SUCCESS/.crc markers
            removed.extend(parquet)
            shutil.rmtree(full, ignore_errors=True)
            continue
        for p in parquet:
            if p not in referenced:
                os.remove(p)
                removed.append(p)
    return removed


def expire_tombstones(table: LakeTable, low_watermark_lsn: int, target_rows_per_file: int = 1_000_000) -> int | None:
    """Drop tombstone rows with ``_commit_lsn <= low_watermark_lsn``.

    Only files that actually contain such tombstones are rewritten (planned
    from a per-file aggregate, the same touch-minimal strategy as MERGE).
    Returns the new snapshot id, or None if no file qualifies.
    """
    spark = table.spark
    files = table.files()
    if not files:
        return None
    paths = [f["path"] for f in files]
    flagged = (
        spark.read.option("mergeSchema", "true")
        .parquet(*paths)
        .withColumn("_file", F.input_file_name())
        .where(F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)) & (F.col(HIDDEN_LSN) <= low_watermark_lsn))
        .select("_file")
        .distinct()
        .collect()
    )
    # input_file_name returns URIs; commit-log paths are plain
    touched = {r["_file"].removeprefix("file://") for r in flagged}
    touched = {p for p in paths if p in touched or f"file://{p}" in {r["_file"] for r in flagged}}
    if not touched:
        return None
    snap = table.snapshot()
    touched_entries = [f for f in snap["files"] if f["path"] in touched]
    df = table.load_files(touched_entries, snap).where(
        ~(
            F.coalesce(F.col(HIDDEN_DELETED), F.lit(False))
            & (F.col(HIDDEN_LSN) <= low_watermark_lsn)
        )
    )
    return _rewrite(
        table,
        df,
        remove_paths=touched,
        target_rows_per_file=target_rows_per_file,
        summary={"maintenance": "expire_tombstones", "low_watermark": low_watermark_lsn},
    )
