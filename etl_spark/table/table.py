"""Iceberg-semantics table layer built from scratch on Parquet + a JSON commit log.

Role in the engine: the MERGE target and exactly-once ledger. Upgrades the
reference's load stage — idempotent create-if-absent DDL
(``src/common/load/PostGISFeatureWriterService.scala:41-46``) and
commit-or-rollback transactional append (``:16-32,48-64``, at-least-once) —
to atomic snapshot commits with epoch fences (exactly-once), versioned schema
evolution, and per-file key-range stats for copy-on-write merge planning.

No Iceberg/Delta jar exists in this environment (checked
``/opt/spark-4.1.2-bin-hadoop3/jars``), so this layer reimplements the
needed subset with the same semantics; the API mirrors Iceberg's
(``createTable / updateSchema / newSnapshot / expireSnapshots``) so a real
``iceberg-spark-runtime`` catalog can replace it where available.

Layout::

    <root>/data/s<snapshot>/part-*.parquet      # immutable data files
    <root>/metadata/commit-<n>.json             # one record per snapshot
    <root>/metadata/HEAD                        # atomic pointer to latest n

Commit record: parent pointer, schema + schema_version, live file list with
per-file stats (rows, min/max doc_id), fence records added this commit
(``(checkpoint_epoch, partition_id)``), lineage records, summary counters.

Atomicity: write-temp + ``os.rename`` (POSIX-atomic within a filesystem) for
both the commit file and HEAD — the single-writer analog of Iceberg's
optimistic-concurrency metadata swap. A concurrent-writer CAS would replace
the HEAD rename with a catalog compare-and-swap; documented seam, same API.

Tombstone persistence: deleted keys are retained as hidden-flagged rows
(``_deleted = true``) carrying their ``(_commit_lsn, _op_seq)``, because a
stale out-of-order update can arrive in a *later* batch than the delete it
lost to (SURVEY.md §7.3 "cross-batch out-of-order"); without the tombstone
row the merge would resurrect the key. ``read()`` filters them; a
``compact()``/``expire_tombstones`` pass drops tombstones below the feed's
global low-watermark.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

import pyarrow.parquet as pq
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from etl_spark.schema import HIDDEN_LSN, HIDDEN_SEQ, can_widen, relax_nullability

HIDDEN_DELETED = "_deleted"


class TableCommitError(RuntimeError):
    pass


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _atomic_write_text(path: str, text: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def file_stats(path: str, key: str = "doc_id") -> dict[str, Any]:
    """Per-file stats from the Parquet footer (no data read) — the analog of
    Iceberg's manifest-entry column bounds used for merge planning. Driver-side
    here; at cluster scale this runs in the write tasks and ships back with
    the task result."""
    md = pq.read_metadata(path)
    rows = md.num_rows
    kmin = kmax = None
    idx = None
    for i in range(md.num_columns if hasattr(md, "num_columns") else md.schema.num_columns):
        if md.schema.column(i).name == key:
            idx = i
            break
    if idx is not None:
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                kmin = kmax = None
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn, mx = mn.decode(), mx.decode()
            kmin = mn if kmin is None else min(kmin, mn)
            kmax = mx if kmax is None else max(kmax, mx)
    return {"path": path, "rows": rows, "min_key": kmin, "max_key": kmax}


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create_if_absent(cls, spark: SparkSession, root: str, schema: StructType) -> "LakeTable":
        """Idempotent create (reference K2: existence check before DDL,
        ``PostGISFeatureWriterService.scala:44``)."""
        t = cls(spark, root)
        if t.exists():
            return t
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        commit = {
            "snapshot_id": 0,
            "parent_id": None,
            "schema_version": 0,
            "schema": json.loads(schema.json()),
            "files": [],
            "fences": [],
            "lineage": [],
            "summary": {"rows_upserted": 0, "rows_deleted": 0},
        }
        _atomic_write_json(os.path.join(t.meta_dir, "commit-0000000000.json"), commit)
        _atomic_write_text(os.path.join(t.meta_dir, "HEAD"), "0")
        return t

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.meta_dir, "HEAD"))

    # ------------------------------------------------------------- metadata

    def head_id(self) -> int:
        with open(os.path.join(self.meta_dir, "HEAD")) as f:
            return int(f.read().strip())

    def _commit_path(self, sid: int) -> str:
        return os.path.join(self.meta_dir, f"commit-{sid:010d}.json")

    def snapshot(self, sid: int | None = None) -> dict:
        sid = self.head_id() if sid is None else sid
        with open(self._commit_path(sid)) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        return [self.snapshot(s) for s in range(self.head_id() + 1)]

    def schema(self, sid: int | None = None) -> StructType:
        return StructType.fromJson(self.snapshot(sid)["schema"])

    def files(self, sid: int | None = None) -> list[dict]:
        return self.snapshot(sid)["files"]

    # --------------------------------------------------------------- fences

    def fences(self) -> set[tuple[int, int]]:
        out: set[tuple[int, int]] = set()
        for s in self.snapshots():
            for f in s["fences"]:
                out.add((f["checkpoint_epoch"], f["partition_id"]))
        return out

    def fenced_epochs(self) -> set[int]:
        return {e for (e, _p) in self.fences()}

    def is_fenced(self, epoch: int) -> bool:
        return epoch in self.fenced_epochs()

    def lineage(self) -> list[dict]:
        out = []
        for s in self.snapshots():
            out.extend(s["lineage"])
        return out

    # ---------------------------------------------------------------- reads

    def read(
        self,
        sid: int | None = None,
        include_hidden: bool = False,
        include_deleted: bool = False,
    ) -> DataFrame:
        """Read the table state at a snapshot, reconciled to that snapshot's
        schema (older files may lack added columns / carry narrower types —
        mergeSchema unions them, then an explicit cast-projection pins the
        versioned schema, the self-built analog of Iceberg field-ID reads)."""
        snap = self.snapshot(sid)
        schema = StructType.fromJson(snap["schema"])
        paths = [f["path"] for f in snap["files"]]
        if not paths:
            fields = list(schema.fields)
            df = self.spark.createDataFrame([], StructType(fields))
            df = df.withColumn(HIDDEN_LSN, F.lit(None).cast("long"))
            df = df.withColumn(HIDDEN_SEQ, F.lit(None).cast("int"))
            df = df.withColumn(HIDDEN_DELETED, F.lit(None).cast("boolean"))
        else:
            df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        proj = []
        for f in schema.fields:
            if f.name in df.columns:
                proj.append(F.col(f.name).cast(relax_nullability(f.dataType)).alias(f.name))
            else:
                proj.append(F.lit(None).cast(relax_nullability(f.dataType)).alias(f.name))
        for h, t in ((HIDDEN_LSN, "long"), (HIDDEN_SEQ, "int"), (HIDDEN_DELETED, "boolean")):
            proj.append((F.col(h) if h in df.columns else F.lit(None)).cast(t).alias(h))
        df = df.select(*proj)
        if not include_deleted:
            df = df.where(~F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)))
        if not include_hidden:
            df = df.drop(HIDDEN_LSN, HIDDEN_SEQ, HIDDEN_DELETED)
        return df

    def read_range(
        self,
        lo: str | None = None,
        hi: str | None = None,
        sid: int | None = None,
        include_hidden: bool = False,
    ) -> DataFrame:
        """Key-range read: scan ONLY files whose [min_key, max_key] span
        intersects [lo, hi] (manifest pruning — the serving-path analog of
        the merge planner), then apply the residual predicate. Because the
        apply write is range-partitioned, a point or range lookup touches
        O(range/keyspace) of the files, not all of them."""
        snap = self.snapshot(sid)
        keep = []
        for f in snap["files"]:
            if f["min_key"] is None:
                keep.append(f["path"])  # no stats -> cannot prune
                continue
            if (hi is not None and f["min_key"] > hi) or (lo is not None and f["max_key"] < lo):
                continue
            keep.append(f["path"])
        if not keep:
            return self.read(sid=sid, include_hidden=include_hidden).where(F.lit(False))
        schema = StructType.fromJson(snap["schema"])
        raw = self.spark.read.option("mergeSchema", "true").parquet(*sorted(keep))
        proj = []
        for fld in schema.fields:
            if fld.name in raw.columns:
                proj.append(F.col(fld.name).cast(relax_nullability(fld.dataType)).alias(fld.name))
            else:
                proj.append(F.lit(None).cast(relax_nullability(fld.dataType)).alias(fld.name))
        for h, t in ((HIDDEN_LSN, "long"), (HIDDEN_SEQ, "int"), (HIDDEN_DELETED, "boolean")):
            proj.append((F.col(h) if h in raw.columns else F.lit(None)).cast(t).alias(h))
        out = raw.select(*proj).where(~F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)))
        if lo is not None:
            out = out.where(F.col("doc_id") >= lo)
        if hi is not None:
            out = out.where(F.col("doc_id") <= hi)
        if not include_hidden:
            out = out.drop(HIDDEN_LSN, HIDDEN_SEQ, HIDDEN_DELETED)
        return out

    def diff(self, sid_a: int, sid_b: int) -> DataFrame:
        """Incremental changelog between two snapshots (CDC-out, the Iceberg
        incremental-read analog): one row per key whose state changed, with
        ``change_op`` 'U' (insert or update — the new row) or 'D' (the key
        went dead). Computed as a keyed diff on the persisted LWW version
        columns, so copy-on-write file rewrites of UNchanged rows do not
        appear."""
        a = self.read(sid=sid_a, include_hidden=True, include_deleted=True).select(
            "doc_id",
            F.col(HIDDEN_LSN).alias("_lsn_a"),
            F.col(HIDDEN_SEQ).alias("_seq_a"),
            F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)).alias("_del_a"),
        )
        b = self.read(sid=sid_b, include_hidden=True, include_deleted=True)
        bj = b.alias("b").join(a.alias("a"), on="doc_id", how="full_outer")
        changed = (
            F.col("a._lsn_a").isNull()
            | F.col(f"b.{HIDDEN_LSN}").isNull()
            | (F.col(f"b.{HIDDEN_LSN}") != F.col("a._lsn_a"))
            | (F.col(f"b.{HIDDEN_SEQ}") != F.col("a._seq_a"))
            | (F.coalesce(F.col(f"b.{HIDDEN_DELETED}"), F.lit(False)) != F.col("a._del_a"))
        )
        # live in B = present and not tombstoned; a key absent from B (or
        # tombstoned) reports as 'D'
        live_b = F.col(f"b.{HIDDEN_LSN}").isNotNull() & ~F.coalesce(
            F.col(f"b.{HIDDEN_DELETED}"), F.lit(False)
        )
        payload = [c for c in b.columns if not c.startswith("_") and c != "doc_id"]
        return bj.where(changed).select(
            F.col("doc_id"),
            F.when(live_b, F.lit("U")).otherwise(F.lit("D")).alias("change_op"),
            *[F.when(live_b, F.col(f"b.{c}")).otherwise(F.lit(None)).alias(c) for c in payload],
            F.col(f"b.{HIDDEN_LSN}").alias(HIDDEN_LSN),
            F.col(f"b.{HIDDEN_SEQ}").alias(HIDDEN_SEQ),
        )

    # -------------------------------------------------------------- commits

    def stage_dir(self, sid: int) -> str:
        return os.path.join(self.data_dir, f"s{sid:010d}-{uuid.uuid4().hex[:8]}")

    def commit(
        self,
        add_files: list[dict],
        remove_paths: set[str] | None = None,
        fences: list[dict] | None = None,
        lineage: list[dict] | None = None,
        new_schema: StructType | None = None,
        summary: dict | None = None,
        expect_parent: int | None = None,
    ) -> int:
        """Atomic snapshot swap (reference K3 upgraded): new file list =
        (parent files - removed) + added; fences/lineage appended; optional
        schema change rides the same commit. ``expect_parent`` is the
        optimistic-concurrency check."""
        parent = self.head_id()
        if expect_parent is not None and parent != expect_parent:
            raise TableCommitError(f"concurrent commit: head={parent}, expected={expect_parent}")
        psnap = self.snapshot(parent)
        remove_paths = remove_paths or set()
        files = [f for f in psnap["files"] if f["path"] not in remove_paths] + list(add_files)
        sid = parent + 1
        commit = {
            "snapshot_id": sid,
            "parent_id": parent,
            "schema_version": psnap["schema_version"] + (1 if new_schema is not None else 0),
            "schema": json.loads(new_schema.json()) if new_schema is not None else psnap["schema"],
            "files": files,
            "fences": fences or [],
            "lineage": lineage or [],
            "summary": summary or {},
        }
        path = self._commit_path(sid)
        if os.path.exists(path):
            raise TableCommitError(f"commit {sid} already exists")
        _atomic_write_json(path, commit)
        _atomic_write_text(os.path.join(self.meta_dir, "HEAD"), str(sid))
        return sid

    # ----------------------------------------------------- schema evolution

    def update_schema(
        self,
        add_columns: list[tuple[str, str]] | None = None,
        widen: dict[str, str] | None = None,
    ) -> int:
        """Metadata-only evolution commit (Iceberg ``UpdateSchema`` analog):
        add nullable columns and/or widen primitive types. No data rewrite —
        old files are reconciled at read time."""
        from pyspark.sql.types import StructField, _parse_datatype_string

        cur = self.schema()
        fields = {f.name: f for f in cur.fields}
        for name, dt in add_columns or []:
            if name in fields:
                raise TableCommitError(f"column {name} already exists")
            fields[name] = StructField(name, _parse_datatype_string(dt), nullable=True)
        for name, dt in (widen or {}).items():
            if name not in fields:
                raise TableCommitError(f"unknown column {name}")
            old = fields[name].dataType.simpleString()
            if not can_widen(old, dt):
                raise TableCommitError(f"illegal widen {name}: {old} -> {dt}")
            fields[name] = StructField(name, _parse_datatype_string(dt), nullable=fields[name].nullable)
        order = [f.name for f in cur.fields] + [
            n for n, _ in (add_columns or []) if n not in [f.name for f in cur.fields]
        ]
        new_schema = StructType([fields[n] for n in order])
        return self.commit(add_files=[], new_schema=new_schema)

    # ---------------------------------------------------------- maintenance

    def expire_snapshots(self, keep_last: int = 1) -> None:
        """Delete data files referenced only by expired snapshots. Metadata
        records are kept (they carry the fence/lineage ledger)."""
        head = self.head_id()
        keep_ids = set(range(max(0, head - keep_last + 1), head + 1))
        live = {f["path"] for s in keep_ids for f in self.snapshot(s)["files"]}
        all_paths = {f["path"] for s in range(head + 1) for f in self.snapshot(s)["files"]}
        for p in all_paths - live:
            if os.path.exists(p):
                os.remove(p)
        # drop now-empty staging dirs
        if os.path.isdir(self.data_dir):
            for d in os.listdir(self.data_dir):
                full = os.path.join(self.data_dir, d)
                if os.path.isdir(full) and not os.listdir(full):
                    shutil.rmtree(full, ignore_errors=True)
