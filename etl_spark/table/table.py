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

Atomicity & concurrency: the commit-file CREATE is the CAS — temp-write +
fsync + ``os.link`` (create-exclusive), so exactly one writer claims each
snapshot id and the loser gets a retryable ``TableCommitError``; HEAD is a
plain pointer updated after (late writes are harmless — recovery rolls it
forward, never back). ``commit(expect_parent=...)`` adds the
optimistic-concurrency validation every mutating flow pins itself with:
merges replan+retry, maintenance rewrites refuse and re-run, schema
evolution refuses and re-reads. Proven across two OS processes through the
real filesystem (tests/test_cross_process_writers.py). On an object store
(no ``link``), swap ``_atomic_create_json`` for a catalog compare-and-swap
— documented seam, same API.

Merge-on-read (round 3): a MERGE may commit in ``mor`` mode — it adds ONE
batch-sized file of winning rows (upserts + tombstones) and rewrites
nothing. Because that file contains exactly the applied keys, its own
``doc_id`` column doubles as the equality-delete set (Iceberg MoR where the
delete file IS the data file's key column): a row in a file committed at
snapshot ``s`` is superseded iff its key appears in a ``mor``-flagged file
with ``added_at > s``. ``load_files`` applies this mask with one
column-pruned scan of the mor files' keys + a (broadcast when small) left
join; copy-on-write commits remove every file their keys touch, so
CoW-only tables skip the mask entirely. Compaction is the rewrite point
that re-materializes masked state and sheds the flag where possible.

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

# MoR mask side of the read join rides a FORCED broadcast up to this many
# keys. Sized by the JVM broadcast hash-relation footprint (~100-150 B/row
# of object + hashmap overhead, an order of magnitude over the ~12 B of raw
# key bytes), not the raw key size: 500k keys ≈ 50-75 MB per executor, a
# safe ceiling. Beyond it NO hint is forced — AQE picks broadcast vs
# shuffled hash from measured sizes. Compaction (table/maintenance.py) is
# what keeps the mor backlog bounded.
MASK_BROADCAST_MAX_ROWS = 500_000

# basename -> commit-order mapping stays a literal create_map up to this
# many file entries; above it the mapping broadcast-joins instead
# (see _with_file_seq)
MAX_LITERAL_SEQ_MAP = 2_048


class TableCommitError(RuntimeError):
    pass


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _atomic_create_json(path: str, obj: dict) -> None:
    """Create-exclusive JSON write: the commit-file creation IS the CAS, so
    it must FAIL for the loser of a race. ``os.link`` (like O_EXCL) raises
    FileExistsError if the target exists — unlike ``os.rename``, which
    silently replaces and would let two writers both 'win' the same
    snapshot id, one overwriting the other's fences/lineage/files."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError as e:
        raise TableCommitError(f"concurrent commit: {os.path.basename(path)} already exists") from e
    finally:
        os.unlink(tmp)


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
        # canonical absolute root: file paths in commit records must compare
        # equal regardless of the caller's cwd (stats collection derives
        # paths from Spark file URIs, which are always absolute)
        self.root = os.path.abspath(root)
        self.meta_dir = os.path.join(self.root, "metadata")
        self.data_dir = os.path.join(self.root, "data")
        # committed snapshot records are immutable, so parsed JSON is cached
        # per sid for the lifetime of the handle — without this, every
        # fences()/lineage() call re-parses EVERY commit file, an O(epochs^2)
        # driver-side serial fraction across a long replay (round-1 scaling
        # post-mortem)
        self._snap_cache: dict[int, dict] = {}
        # path -> first snapshot id referencing it, for legacy file entries
        # that predate the per-entry schema_version/added_at tags
        # (see _first_snapshot_of)
        self._first_snap_cache: dict[str, int] = {}
        # incremental fence ledger (see fences())
        self._fences_cache: set[tuple[int, int]] = set()
        self._fenced_epochs_cache: set[int] = set()
        self._fences_upto: int = -1
        # schema_version -> first snapshot id carrying it
        # (see _snapshot_at_version)
        self._version_snap_cache: dict[int, int] = {}
        # schema_version -> physical StructType (immutable per version);
        # and (schema json, input columns) -> projection Column list.
        # Both are rebuilt per load_files call otherwise — tens of py4j
        # round-trips per epoch on the microbatch hot path.
        self._phys_schema_cache: dict[int, StructType | None] = {}
        self._project_cols_cache: dict[tuple, list] = {}

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create_if_absent(
        cls,
        spark: SparkSession,
        root: str,
        schema: StructType,
        layout: dict | None = None,
    ) -> "LakeTable":
        """Idempotent create (reference K2: existence check before DDL,
        ``PostGISFeatureWriterService.scala:44``).

        ``layout`` fixes the table's physical file layout at creation
        (immutable — every writer must agree on it):
        - None / ``{"type": "range"}``: range-partitioned files on doc_id
          (the default; tight per-file key ranges, range reads prune).
        - ``{"type": "bucket", "n_buckets": B}``: hash-bucketed files on
          ``pmod(xxhash64(doc_id), B)``. Planning prunes by EXACT bucket
          membership, the apply write is a plain hash exchange (no
          boundary-sampler pass, so nothing is evaluated twice), and
          MoR compaction closes over buckets instead of key ranges
          (bucket-local rewrites). Trade-off: range reads can no longer
          prune files by key interval."""
        t = cls(spark, root)
        if t.exists():
            return t
        if layout is not None:
            if layout.get("type") not in ("range", "bucket"):
                raise ValueError(f"unknown layout type {layout!r}")
            if layout["type"] == "bucket" and not (1 <= int(layout.get("n_buckets", 0))):
                raise ValueError("bucket layout needs n_buckets >= 1")
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        commit = {
            "snapshot_id": 0,
            "parent_id": None,
            "schema_version": 0,
            "schema": json.loads(schema.json()),
            # stable field ids (the Iceberg column-identity mechanism):
            # renames change a field's NAME, never its id, so files written
            # under the old name remain readable by id
            "field_ids": {f.name: i for i, f in enumerate(schema.fields)},
            "layout": layout or {"type": "range"},
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
        cached = self._snap_cache.get(sid)
        if cached is not None:
            return cached
        with open(self._commit_path(sid)) as f:
            snap = json.load(f)
        self._snap_cache[sid] = snap
        return snap

    def snapshots(self) -> list[dict]:
        return [self.snapshot(s) for s in range(self.head_id() + 1)]

    def field_ids(self, sid: int | None = None) -> dict[str, int]:
        """name -> stable field id at a snapshot (legacy commits without the
        registry fall back to positional ids — valid because renames did not
        exist before the registry did)."""
        snap = self.snapshot(sid)
        fids = snap.get("field_ids")
        if fids is None:
            fids = {f["name"]: i for i, f in enumerate(snap["schema"]["fields"])}
        return fids

    def _first_snapshot_of(self, path: str) -> int:
        """Earliest snapshot id referencing a path — the commit that added
        the file. Recovers both missing per-entry tags on legacy (pre-tag)
        entries: ``schema_version`` (what the writer called its columns —
        without it a later rename would skip the field-id mapping and the
        old-name column would silently read NULL) and ``added_at`` (the MoR
        mask ordering). Returns 0 for an unreferenced path (a synthetic
        caller-built entry): pre-tag code predates both renames and MoR."""
        cached = self._first_snap_cache.get(path)
        if cached is not None:
            return cached
        sid = 0
        for s in self.snapshots():
            if any(f["path"] == path for f in s["files"]):
                sid = s["snapshot_id"]
                break
        self._first_snap_cache[path] = sid
        return sid

    def _untagged_version(self, path: str) -> int:
        return self.snapshot(self._first_snapshot_of(path))["schema_version"]

    def _entry_seq(self, f: dict) -> int:
        """Commit order of a file entry: ``added_at`` (stamped by commit()),
        falling back to the first snapshot referencing it."""
        seq = f.get("added_at")
        return seq if seq is not None else self._first_snapshot_of(f["path"])

    def _snapshot_at_version(self, version: int) -> dict | None:
        """Earliest snapshot whose live schema carries a given
        schema_version. Cached per handle (a version's first snapshot is
        immutable): every load_files resolves its groups' schemas through
        here, so an uncached walk would be O(snapshots) per epoch —
        O(epochs^2) over a long replay."""
        sid = self._version_snap_cache.get(version)
        if sid is not None:
            return self.snapshot(sid)
        for s in self.snapshots():
            if s["schema_version"] == version:
                self._version_snap_cache[version] = s["snapshot_id"]
                return s
        return None

    def _names_at_version(self, version: int) -> dict[int, str] | None:
        """field id -> name under a given schema_version (what a file written
        under that version calls its columns)."""
        s = self._snapshot_at_version(version)
        if s is None:
            return None
        return {fid: name for name, fid in self.field_ids(s["snapshot_id"]).items()}

    def _physical_schema_at(self, version: int) -> StructType | None:
        """The uniform on-disk schema of data files written under a
        schema_version: that version's table schema (relaxed — writers cast
        through relax_nullability) plus the hidden LWW columns. Letting the
        reader use this EXPLICIT schema instead of ``mergeSchema`` matters:
        mergeSchema launches a footer-scan job at plan-CONSTRUCTION time on
        every load_files call — a per-epoch driver barrier that also grows
        with file count."""
        if version in self._phys_schema_cache:
            return self._phys_schema_cache[version]
        from pyspark.sql.types import StructField

        s = self._snapshot_at_version(version)
        if s is None:
            self._phys_schema_cache[version] = None
            return None
        fields = [
            StructField(f.name, relax_nullability(f.dataType), nullable=True)
            for f in StructType.fromJson(s["schema"]).fields
        ]
        from pyspark.sql.types import BooleanType, IntegerType, LongType

        fields += [
            StructField(HIDDEN_LSN, LongType(), nullable=True),
            StructField(HIDDEN_SEQ, IntegerType(), nullable=True),
            StructField(HIDDEN_DELETED, BooleanType(), nullable=True),
        ]
        out = StructType(fields)
        self._phys_schema_cache[version] = out
        return out

    def schema(self, sid: int | None = None) -> StructType:
        return StructType.fromJson(self.snapshot(sid)["schema"])

    def files(self, sid: int | None = None) -> list[dict]:
        return self.snapshot(sid)["files"]

    def layout(self, sid: int | None = None) -> dict:
        """Physical layout descriptor (pre-layout tables read as range)."""
        return self.snapshot(sid).get("layout") or {"type": "range"}

    def stats(self, sid: int | None = None) -> dict:
        """Operator-facing snapshot stats from metadata only (no data scan):
        file/row counts are PHYSICAL (they include MoR-superseded copies and
        tombstone rows — the gap between ``rows`` and ``read().count()`` is
        exactly the compaction debt), ``mor_files``/``mor_mask_rows`` size
        the read-side mask, and ``fenced_epochs`` counts applied epochs."""
        snap = self.snapshot(sid)
        files = snap["files"]
        mor = [f for f in files if f.get("mor")]
        return {
            "snapshot_id": snap["snapshot_id"],
            "schema_version": snap["schema_version"],
            "n_files": len(files),
            "rows": sum(f["rows"] for f in files),
            "mor_files": len(mor),
            "mor_mask_rows": sum(f["rows"] for f in mor),
            "fenced_epochs": len(self.fenced_epochs()),
        }

    # --------------------------------------------------------------- fences

    def fences(self) -> set[tuple[int, int]]:
        """Fence ledger as a set, maintained INCREMENTALLY per handle:
        committed snapshots are immutable, so only snapshots newer than the
        last scan are folded in. Without this, the per-epoch ``is_fenced``
        check re-walks every commit — an O(epochs^2) driver serial fraction
        over a long replay (the same class of cost as the round-2 snapshot
        JSON cache). Returns the live cached set; callers only test
        membership."""
        head = self.head_id()
        for s in range(self._fences_upto + 1, head + 1):
            for f in self.snapshot(s)["fences"]:
                self._fences_cache.add((f["checkpoint_epoch"], f["partition_id"]))
                self._fenced_epochs_cache.add(f["checkpoint_epoch"])
        self._fences_upto = max(self._fences_upto, head)
        return self._fences_cache

    def fenced_epochs(self) -> set[int]:
        self.fences()  # extend the incremental caches
        return self._fenced_epochs_cache

    def is_fenced(self, epoch: int) -> bool:
        return epoch in self.fenced_epochs()

    def lineage(self) -> list[dict]:
        out = []
        for s in self.snapshots():
            out.extend(s["lineage"])
        return out

    # ---------------------------------------------------------------- reads

    def _project(self, df: DataFrame, schema: StructType) -> DataFrame:
        """Pin a raw file read to the versioned schema + hidden columns:
        missing (later-added) columns -> null, narrower written types cast up
        (widen reconciliation). Projection Columns cached per layout."""
        ck = (schema.json(), tuple(df.columns))
        proj = self._project_cols_cache.get(ck)
        if proj is None:
            proj = []
            for f in schema.fields:
                if f.name in df.columns:
                    proj.append(F.col(f.name).cast(relax_nullability(f.dataType)).alias(f.name))
                else:
                    proj.append(F.lit(None).cast(relax_nullability(f.dataType)).alias(f.name))
            for h, t in ((HIDDEN_LSN, "long"), (HIDDEN_SEQ, "int"), (HIDDEN_DELETED, "boolean")):
                proj.append((F.col(h) if h in df.columns else F.lit(None)).cast(t).alias(h))
            self._project_cols_cache[ck] = proj
        return df.select(*proj)

    def load_files(
        self,
        file_entries: list[dict],
        snap: dict,
        apply_masks: bool = True,
        key_range: tuple[str | None, str | None] | None = None,
    ) -> DataFrame:
        """Read a set of file entries reconciled to ``snap``'s schema,
        including hidden columns and tombstone rows (callers filter).

        Rename-aware (the Iceberg field-ID read): files are grouped by the
        ``schema_version`` they were written under; each group's write-time
        column names are mapped to the snapshot's names through the stable
        field ids, then all groups are projected to the versioned schema and
        unioned. With no renames in the history every group's mapping is the
        identity and this degenerates to one mergeSchema read.

        ``key_range=(lo, hi)`` is a caller CONTRACT: the caller promises to
        discard every returned row with doc_id outside [lo, hi] (read_range's
        residual predicate). Under that promise the MoR mask is pruned to
        winners files overlapping the range — unmasked out-of-range rows
        can never surface.

        ``apply_masks=False`` skips the MoR superseded-row masking and may
        return MULTIPLE version rows per key. Only for callers that reduce
        by version themselves (the merge resolve takes the per-key max
        ``(_commit_lsn, _op_seq)``, which is the current state by the LWW
        invariant — a change only ever lands by beating the stored
        version, so version order and commit order agree per key)."""
        schema = StructType.fromJson(snap["schema"])
        if not file_entries:
            df = self.spark.createDataFrame([], StructType(list(schema.fields)))
            df = df.withColumn(HIDDEN_LSN, F.lit(None).cast("long"))
            df = df.withColumn(HIDDEN_SEQ, F.lit(None).cast("int"))
            df = df.withColumn(HIDDEN_DELETED, F.lit(None).cast("boolean"))
            return self._project(df, schema)
        target_names = {fid: name for name, fid in self.field_ids(snap["snapshot_id"]).items()}
        groups: dict[int, list[str]] = {}
        for f in file_entries:
            sv = f.get("schema_version")
            if sv is None:
                # legacy entry from a pre-tag commit: recover the version
                # from commit history so renames still map its columns
                sv = self._untagged_version(f["path"])
            groups.setdefault(sv, []).append(f["path"])
        parts = []
        for sv in sorted(groups):
            phys = self._physical_schema_at(sv)
            if phys is not None:
                # explicit schema: no inference/mergeSchema footer job
                raw = self.spark.read.schema(phys).parquet(*sorted(groups[sv]))
            else:
                raw = self.spark.read.option("mergeSchema", "true").parquet(*sorted(groups[sv]))
            writer_names = self._names_at_version(sv)
            if writer_names:
                # ONE simultaneous select, not sequential withColumnRenamed:
                # a rename chain may reuse a name another field held at
                # write time (value->source after source->origin), and
                # in-place renames would collide/duplicate mid-sequence
                name_to_fid = {n: fid for fid, n in writer_names.items()}
                sel = []
                for cname in raw.columns:
                    fid = name_to_fid.get(cname)
                    tgt = target_names.get(fid, cname) if fid is not None else cname
                    sel.append(F.col(f"`{cname}`").alias(tgt))
                raw = raw.select(*sel)
            parts.append(self._project(raw, schema))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return self._apply_mor_masks(out, file_entries, snap, key_range) if apply_masks else out

    def _with_file_seq(self, df: DataFrame, entries: list[dict], col: str) -> DataFrame:
        """Tag each row with its file's commit order: basename(input_file) ->
        added_at. Below MAX_LITERAL_SEQ_MAP entries the mapping is a literal
        ``create_map`` (zero plan nodes beyond a projection); above it — a
        table with 10^5+ live files would bloat every plan with a megabyte
        literal — the mapping becomes a broadcast-joined two-column frame."""
        fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
        if len(entries) <= MAX_LITERAL_SEQ_MAP:
            pairs: list = []
            for f in entries:
                pairs += [F.lit(os.path.basename(f["path"])), F.lit(self._entry_seq(f))]
            return df.withColumn(col, F.element_at(F.create_map(*pairs), fname))
        mapping = self.spark.createDataFrame(
            [(os.path.basename(f["path"]), self._entry_seq(f)) for f in entries],
            "_bn string, _sq int",
        )
        return (
            df.withColumn("_bn0", fname)
            .join(F.broadcast(mapping), F.col("_bn0") == F.col("_bn"), "left")
            .withColumn(col, F.col("_sq"))
            .drop("_bn0", "_bn", "_sq")
        )

    def _apply_mor_masks(
        self,
        out: DataFrame,
        file_entries: list[dict],
        snap: dict,
        key_range: tuple[str | None, str | None] | None = None,
    ) -> DataFrame:
        """Drop rows superseded by a newer mor-flagged file's keys (module
        docstring "Merge-on-read"). The mask is ONE column-pruned scan of
        the mor files' doc_id columns (max added_at per key), broadcast when
        small; rows keep iff their file's commit order >= the key's newest
        mor commit. Mask keys always come from the FULL snapshot, not the
        loaded subset — a caller loading a non-range-closed subset (e.g.
        compaction's small-file set) must still see newer versions that live
        in files outside it. No-op (zero extra plan nodes) on CoW-only
        snapshots, since copy-on-write removes every file its keys touch."""
        mor = [f for f in snap["files"] if f.get("mor")]
        if not mor:
            return out
        # bucket layout: a loaded row's superseding winner can only live in
        # a file sharing one of the loaded buckets — exact set pruning.
        # layout_stale entries (mid staged migration) may carry tags under
        # an older modulus: a stale loaded file disables bucket pruning
        # entirely (its bucket membership is unknown under the current
        # layout), and a stale winners file is never pruned by bucket
        loaded_buckets: set[int] = set()
        if all(f.get("buckets") and not f.get("layout_stale") for f in file_entries):
            for f in file_entries:
                loaded_buckets.update(f["buckets"])
        if loaded_buckets:
            mor = [
                f
                for f in mor
                if not f.get("buckets")
                or f.get("layout_stale")
                or not loaded_buckets.isdisjoint(f["buckets"])
            ]
            if not mor:
                return out
        # prune the mask to the loaded subset's key envelope: every loaded
        # row's key lies within [lo, hi] (file stats), so mask keys outside
        # it cannot match — a point/range read masks against O(overlapping)
        # winners files, not all of them. Skipped when any loaded file
        # lacks stats (envelope unknown).
        lo = hi = None
        if file_entries and all(f["min_key"] is not None for f in file_entries):
            lo = min(f["min_key"] for f in file_entries)
            hi = max(f["max_key"] for f in file_entries)
        # a caller-supplied residual key range (read_range's probe) tightens
        # the envelope further: data files are range-wide (a point probe
        # loads a file spanning ~keyspace/n_files keys), so pruning winners
        # by the PROBE keeps the mask O(probe-overlapping winners), not
        # O(file-envelope-overlapping) — the 100-epoch-backlog bound
        # (tests/test_round4_fixes.py)
        if key_range is not None:
            klo, khi = key_range
            if klo is not None and (lo is None or klo > lo):
                lo = klo
            if khi is not None and (hi is None or khi < hi):
                hi = khi
        if lo is not None and hi is not None:
            mor = [
                f
                for f in mor
                if f["min_key"] is None or (f["max_key"] >= lo and f["min_key"] <= hi)
            ]
            if not mor:
                return out
        out = self._with_file_seq(out, file_entries, "_fseq")
        mask_rows = self.spark.read.schema("doc_id string").parquet(
            *sorted(f["path"] for f in mor)
        )
        # residual predicate pushed into the winners-file scan
        if lo is not None:
            mask_rows = mask_rows.where(F.col("doc_id") >= lo)
        if hi is not None:
            mask_rows = mask_rows.where(F.col("doc_id") <= hi)
        mask = (
            self._with_file_seq(mask_rows.select(F.col("doc_id").alias("_mkey")), mor, "_mseq")
            .groupBy("_mkey")
            .agg(F.max("_mseq").alias("_mseq"))
        )
        if sum(f["rows"] for f in mor) <= MASK_BROADCAST_MAX_ROWS:
            mask = F.broadcast(mask)
        return (
            out.join(mask, out["doc_id"] == mask["_mkey"], "left")
            .where(F.col("_mseq").isNull() | (F.col("_fseq") >= F.col("_mseq")))
            .drop("_fseq", "_mkey", "_mseq")
        )

    def read(
        self,
        sid: int | None = None,
        include_hidden: bool = False,
        include_deleted: bool = False,
    ) -> DataFrame:
        """Read the table state at a snapshot, reconciled to that snapshot's
        schema (older files may lack added columns / carry narrower types /
        pre-rename names — reconciled by the field-ID loader)."""
        snap = self.snapshot(sid)
        df = self.load_files(snap["files"], snap)
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
                keep.append(f)  # no stats -> cannot prune
                continue
            if (hi is not None and f["min_key"] > hi) or (lo is not None and f["max_key"] < lo):
                continue
            keep.append(f)
        if not keep:
            return self.read(sid=sid, include_hidden=include_hidden).where(F.lit(False))
        out = self.load_files(keep, snap, key_range=(lo, hi)).where(
            ~F.coalesce(F.col(HIDDEN_DELETED), F.lit(False))
        )
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
        # dead->gone is NOT a state change: a key tombstoned in A whose
        # tombstone row was physically expired before B (expire_tombstones)
        # must not re-report 'D' — CDC consumers would see duplicate deletes.
        # A key RE-deleted by a new event still reports (its B tombstone row
        # exists, so b lsn is non-null).
        expired = F.coalesce(F.col("a._del_a"), F.lit(False)) & F.col(f"b.{HIDDEN_LSN}").isNull()
        payload = [c for c in b.columns if not c.startswith("_") and c != "doc_id"]
        return bj.where(changed & ~expired).select(
            F.col("doc_id"),
            F.when(live_b, F.lit("U")).otherwise(F.lit("D")).alias("change_op"),
            *[F.when(live_b, F.col(f"b.{c}")).otherwise(F.lit(None)).alias(c) for c in payload],
            F.col(f"b.{HIDDEN_LSN}").alias(HIDDEN_LSN),
            F.col(f"b.{HIDDEN_SEQ}").alias(HIDDEN_SEQ),
        )

    # -------------------------------------------------------------- commits

    def stage_dir(self, sid: int) -> str:
        return os.path.join(self.data_dir, f"s{sid:010d}-{uuid.uuid4().hex[:8]}")

    def _recover_head(self) -> int:
        """Roll HEAD forward over fully-written commit files left by a
        writer that crashed between the commit-file create (the CAS point —
        temp-write + fsync + link, so a visible file is always complete)
        and the HEAD pointer update. Without this, the orphaned snapshot id
        would block every later writer's create-exclusive commit."""
        while True:
            head = self.head_id()
            advanced = head
            while os.path.exists(self._commit_path(advanced + 1)):
                advanced += 1
            if advanced == head:
                return head
            # Re-read HEAD immediately before writing and only ever move it
            # FORWARD: without this, writer B (recovered head=4) racing
            # writer A (just committed and wrote HEAD=5) could set HEAD back
            # to 4 — harmless for correctness (commit files are immutable and
            # the next recovery re-rolls) but readers would see a stale head.
            if self.head_id() < advanced:
                _atomic_write_text(os.path.join(self.meta_dir, "HEAD"), str(advanced))
            # loop: a commit that landed during the write is picked up by the
            # rescan; terminates when the scan finds nothing newer

    def commit(
        self,
        add_files: list[dict],
        remove_paths: set[str] | None = None,
        fences: list[dict] | None = None,
        lineage: list[dict] | None = None,
        new_schema: StructType | None = None,
        new_field_ids: dict[str, int] | None = None,
        new_layout: dict | None = None,
        summary: dict | None = None,
        expect_parent: int | None = None,
    ) -> int:
        """Atomic snapshot swap (reference K3 upgraded): new file list =
        (parent files - removed) + added; fences/lineage appended; optional
        schema change rides the same commit. ``expect_parent`` is the
        optimistic-concurrency check: a writer passes the head it planned
        against and the commit REFUSES if another writer advanced it —
        callers (merge_batch) re-plan against the new head and retry."""
        parent = self._recover_head()
        if expect_parent is not None and parent != expect_parent:
            raise TableCommitError(f"concurrent commit: head={parent}, expected={expect_parent}")
        psnap = self.snapshot(parent)
        remove_paths = remove_paths or set()
        sid = parent + 1
        # stamp commit order on new entries (the MoR mask ordering; also the
        # rename fallback for entries whose tags a legacy writer stripped)
        files = [f for f in psnap["files"] if f["path"] not in remove_paths] + [
            {**f, "added_at": f.get("added_at", sid)} for f in add_files
        ]
        commit = {
            "snapshot_id": sid,
            "parent_id": parent,
            "schema_version": psnap["schema_version"] + (1 if new_schema is not None else 0),
            "schema": json.loads(new_schema.json()) if new_schema is not None else psnap["schema"],
            "field_ids": new_field_ids if new_field_ids is not None else self.field_ids(parent),
            "layout": new_layout if new_layout is not None else (psnap.get("layout") or {"type": "range"}),
            "files": files,
            "fences": fences or [],
            "lineage": lineage or [],
            "summary": summary or {},
        }
        path = self._commit_path(sid)
        # create-exclusive: exactly one writer can claim snapshot id `sid`;
        # the loser gets a retryable TableCommitError (merge replans). HEAD
        # is then a plain pointer update — late HEAD writes are harmless
        # because head_id() callers re-resolve and commit files are
        # immutable once created.
        _atomic_create_json(path, commit)
        _atomic_write_text(os.path.join(self.meta_dir, "HEAD"), str(sid))
        self._snap_cache[sid] = commit
        return sid

    # ----------------------------------------------------- schema evolution

    def update_schema(
        self,
        add_columns: list[tuple[str, str]] | None = None,
        widen: dict[str, str] | None = None,
        renames: dict[str, str] | None = None,
    ) -> int:
        """Metadata-only evolution commit (Iceberg ``UpdateSchema`` analog):
        add nullable columns, widen primitive types, and/or rename columns.
        Renames apply FIRST within the commit; ``add_columns``/``widen``
        reference the post-rename names. No data rewrite ever — old files
        are reconciled at read time (added columns read null, narrow types
        cast up, renamed columns resolved through their stable field id).
        Successor of the reference's schema-rebuilding rename
        (``FeatureTypeExtensions.scala:10-29``, which rewrites the feature
        type eagerly).

        Pinned to the schema it planned against (``expect_parent``): two
        racing evolves would otherwise apply the second over the FIRST's
        base and silently drop it; the loser gets TableCommitError and
        re-reads. A concurrent merge also trips the pin — evolve is cheap
        and re-runnable, so strictness beats special-casing."""
        from pyspark.sql.types import StructField, _parse_datatype_string

        base = self.head_id()
        cur = self.schema(base)
        fids = dict(self.field_ids(base))
        fields = {f.name: f for f in cur.fields}
        order = [f.name for f in cur.fields]
        renames = dict(renames or {})
        if renames:
            # validate as a SIMULTANEOUS mapping (dict order must not matter):
            # targets may not collide with each other, with surviving
            # (un-renamed) columns, or with columns being added
            for old in renames:
                if old not in fields:
                    raise TableCommitError(f"unknown column {old}")
                if old == "doc_id":
                    raise TableCommitError("cannot rename the merge key")
            news = list(renames.values())
            if len(set(news)) != len(news):
                raise TableCommitError(f"duplicate rename targets: {sorted(news)}")
            surviving = set(fields) - set(renames)
            added = {n for n, _ in (add_columns or [])}
            for new in news:
                if new in surviving or new in added:
                    raise TableCommitError(f"rename target {new} already exists")
            # apply simultaneously: pop all olds first (a chain may reuse a
            # name another field is giving up in the same call)
            popped = {old: (fields.pop(old), fids.pop(old)) for old in renames}
            for old, new in renames.items():
                f, fid = popped[old]
                fields[new] = StructField(new, f.dataType, nullable=f.nullable)
                fids[new] = fid
            order = [renames.get(n, n) for n in order]
        for name, dt in add_columns or []:
            if name in fields:
                raise TableCommitError(f"column {name} already exists")
            fields[name] = StructField(name, _parse_datatype_string(dt), nullable=True)
            fids[name] = max(fids.values(), default=-1) + 1
            order.append(name)
        for name, dt in (widen or {}).items():
            if name not in fields:
                raise TableCommitError(f"unknown column {name}")
            old_t = fields[name].dataType.simpleString()
            if not can_widen(old_t, dt):
                raise TableCommitError(f"illegal widen {name}: {old_t} -> {dt}")
            fields[name] = StructField(name, _parse_datatype_string(dt), nullable=fields[name].nullable)
        new_schema = StructType([fields[n] for n in order])
        return self.commit(
            add_files=[], new_schema=new_schema, new_field_ids=fids, expect_parent=base
        )

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only column rename by stable field id (reference P5)."""
        return self.update_schema(renames={old: new})

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
