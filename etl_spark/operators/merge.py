"""Key-partitioned copy-on-write MERGE of a change batch into a LakeTable.

North-rule core: "applied as key-partitioned MERGE upserts ... explicit
repartitionByRange on the merge key before apply ... exactly-once enforced by
idempotent epoch-fenced commits keyed on (checkpoint_epoch, partition_id)".

Physical strategy (all built-in Spark ops; the planner lives above Catalyst,
SURVEY.md §4.2):

1. **Dedup first** — LWW-reduce the batch so the join touches one row per key
   (the reference's shrink-before-expensive-stage move,
   ``GlobalAiHistoricalTransformationService.scala:45``).
2. **Plan touched files** — broadcast the snapshot's per-file ``doc_id``
   min/max stats against the batch keys; only files whose key range contains
   a batch key are rewritten, everything else is carried forward untouched
   (Iceberg copy-on-write with manifest pruning). Because apply writes with
   ``repartitionByRange(doc_id)`` + ``sortWithinPartitions``, files are tight,
   non-overlapping key ranges, so a batch touching k% of the keyspace rewrites
   ~k% of files — at 100 TB this is the difference between a merge and a full
   table rewrite.
3. **Resolve** — full-outer join (touched-target x batch) on ``doc_id``; a
   change wins iff ``(commit_lsn, op_seq)`` beats the row's stored hidden
   ``(_commit_lsn, _op_seq)`` — stale/out-of-order events become no-ops.
   Winning deletes become persisted tombstone rows (see table.py docstring on
   why tombstones must be kept for cross-batch ordering).
4. **Apply** — ``repartitionByRange(n, doc_id)`` + ``sortWithinPartitions``
   -> Parquet; per-file stats (collected by a distributed column-pruned scan
   of the written files) feed the next merge's planning.
5. **Commit** — single atomic snapshot swap carrying fence records
   ``(checkpoint_epoch, partition_id)`` and per-partition lineage (lsn ranges,
   rows upserted/deleted). A replayed epoch is detected via the fence ledger
   and no-ops (forced double-apply test). The whole attempt is pinned to the
   snapshot it planned against (``expect_parent``); if a concurrent writer
   advanced HEAD in between, the commit refuses and the merge REPLANS against
   the new head and retries — the optimistic-concurrency loop every real lake
   writer (Iceberg/Delta) runs.

AQE's skew-join handling covers hot-key skew in the resolve join; the dedup
stage is skew-proof by construction (partial aggregation / salted two-phase,
see operators/dedup.py).
"""

from __future__ import annotations

import os
import re
import shutil
import threading
import time
import urllib.parse
from collections import OrderedDict
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from etl_spark.operators.dedup import lww_dedup, lww_dedup_fetch, lww_dedup_salted
from etl_spark.schema import HIDDEN_LSN, HIDDEN_SEQ, relax_nullability
from etl_spark.session import expr_cache_get
from etl_spark.table.table import HIDDEN_DELETED, LakeTable, TableCommitError


# Microbatch fast path: when the deduped batch fits under this many keys, the
# planning job also ships the key list to the driver (bounded by a LIMIT — a
# bulk batch returns CAP+1 rows and the driver discards them, so no unbounded
# collect can ever happen) and the MoR resolve+write then runs as ONE Spark
# job: the batch keys broadcast from a driver-local relation (LocalTableScan
# broadcasts never launch a job) and the resolve join is forced to sort-merge
# (both sides are batch-sized; a broadcast hint would spawn a separate
# build job). Motivation: on back-to-back microbatch epochs the engine-side
# floor is per-JOB scheduling overhead (~0.25-0.4 s each on the bench VM),
# not data — 12 jobs/epoch was the round-3 ~3-4.5 s/epoch fixed cost;
# 2 jobs/epoch is the floor this path targets (tools/bench_epoch.py).
FAST_PATH_MAX_KEYS = 50_000


def _sql_str(s: str) -> str:
    """A Spark-SQL string literal for an arbitrary key value, immune to
    ``spark.sql.parser.escapedStringLiterals`` (round-4 ADVICE). The conf is
    read lazily at ANALYSIS time (measured: the same F.expr Column evaluates
    differently depending on the conf when ``.where`` attaches it), so no
    construction-time conf scope can pin the semantics. Instead the literal
    itself is made mode-independent: keys free of quotes and backslashes emit
    as plain single-quoted literals (both parser modes treat them
    identically); hostile keys emit as UTF-8 hex binary literals CAST to
    string, which have no escape processing in either mode. Constant folding
    collapses the casts before OptimizeIn, so the IN-list still becomes an
    InSet with parquet pushdown either way (plan-probed: PushedFilters
    ``[In(doc_id, ...)]``), and the common all-plain-keys batch pays zero
    extra parse cost."""
    if "'" not in s and "\\" not in s:
        return "'" + s + "'"
    return "CAST(X'" + s.encode("utf-8").hex() + "' AS STRING)"


# Session confs are process-global per SparkSession, and the engine supports
# concurrent writers on one session — so scoped set/restore must be depth-
# counted under a lock (round-4 ADVICE): two interleaved scopes on the same
# (session, key) otherwise capture each other's "false" as prev and leave the
# conf permanently flipped. The outermost enter records the true original and
# sets; nested/concurrent enters just increment; the last exit restores.
_SCOPED_CONF_LOCK = threading.Lock()
_SCOPED_CONF_STATE: dict[tuple, list] = {}  # (id(session), key) -> [depth, prev, value]


class _scoped_conf:
    """Set a session conf for the duration of a block, restoring on exit —
    re-entrant and concurrency-safe per (session, key); all concurrent scopes
    on one key must request the same value (asserted).
    Used to disable AQE around microbatch-sized actions: AQE's per-stage
    materialize-and-replan loop roughly doubles tiny-query latency (measured
    ~2x on a 2M-row scan+agg on the bench VM) and its benefits — runtime
    join selection, skew splitting, partition coalescing — need data volumes
    a microbatch never has. Bulk merges keep AQE on."""

    def __init__(self, spark, key: str, value: str):
        self.spark, self.key, self.value = spark, key, value

    def __enter__(self):
        sk = (id(self.spark), self.key)
        with _SCOPED_CONF_LOCK:
            st = _SCOPED_CONF_STATE.get(sk)
            if st is None:
                prev = self.spark.conf.get(self.key, None)
                _SCOPED_CONF_STATE[sk] = [1, prev, self.value]
                self.spark.conf.set(self.key, self.value)
            else:
                assert st[2] == self.value, (
                    f"conflicting scoped values for {self.key}: {st[2]!r} vs {self.value!r}"
                )
                st[0] += 1

    def __exit__(self, *exc):
        sk = (id(self.spark), self.key)
        with _SCOPED_CONF_LOCK:
            st = _SCOPED_CONF_STATE[sk]
            st[0] -= 1
            if st[0] == 0:
                del _SCOPED_CONF_STATE[sk]
                if st[1] is None:
                    self.spark.conf.unset(self.key)
                else:
                    self.spark.conf.set(self.key, st[1])


def _aqe_off(spark):
    return _scoped_conf(spark, "spark.sql.adaptive.enabled", "false")


# Optional per-phase wall-clock instrumentation: set to a list and every
# _merge_attempt appends {"phase": ..., "sec": ...} rows (plan / resolve-build
# / write / stats / commit). Drives tools/bench_epoch.py --phases; never on in
# production paths (None -> zero overhead beyond a truthiness check).
PHASE_TIMINGS: list[dict] | None = None


def _phase(name: str, t0: float) -> float:
    now = time.perf_counter()
    if PHASE_TIMINGS is not None:
        PHASE_TIMINGS.append({"phase": name, "sec": round(now - t0, 4)})
    return now


@dataclass
class MergeResult:
    snapshot_id: int
    applied: bool
    rows_upserted: int
    rows_deleted: int
    files_rewritten: int
    files_added: int
    mode: str = "cow"


_NORMALIZE_COLS_CACHE: OrderedDict = OrderedDict()


def _normalize_changes(schema: StructType, changes: DataFrame) -> DataFrame:
    """Project the (possibly older/newer-schema) batch onto the table's
    current schema: missing columns -> null, types cast (covers widen).
    The projection Columns are cached (bounded, gateway-scoped LRU) per
    (schema, batch-columns) layout — rebuilt only when the table evolves or
    the feed shape changes."""
    ck = (schema.json(), tuple(changes.columns))

    def _build():
        # pin the key/version/op types: they become the hidden columns'
        # physical parquet types, which the explicit-schema reader
        # (table.py _physical_schema_at) expects to be uniform per file
        cols = [
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("commit_lsn").cast("long").alias("commit_lsn"),
            F.col("op_seq").cast("int").alias("op_seq"),
            F.col("op").cast("string").alias("op"),
        ]
        for f in schema.fields:
            if f.name == "doc_id":
                continue
            if f.name in changes.columns:
                cols.append(F.col(f.name).cast(relax_nullability(f.dataType)).alias(f.name))
            else:
                cols.append(F.lit(None).cast(relax_nullability(f.dataType)).alias(f.name))
        return cols

    return changes.select(*expr_cache_get(_NORMALIZE_COLS_CACHE, ck, _build))


def merge_batch(
    table: LakeTable,
    changes: DataFrame,
    epoch: int,
    lineage_partitions: int = 16,
    target_rows_per_file: int = 1_000_000,
    use_salted_dedup: bool = False,
    resolve_strategy: str = "auto",
    max_broadcast_rows: int = 100_000,
    max_commit_retries: int = 3,
    dedup_strategy: str = "agg",
    merge_mode: str = "auto",
    mor_rewrite_ratio: float = 8.0,
) -> MergeResult:
    """Apply one change batch exactly-once. Returns a no-op result if the
    epoch is already fenced (idempotent replay); on a concurrent-writer
    commit conflict the attempt is discarded and the merge replans against
    the new head (up to ``max_commit_retries`` times).

    ``resolve_strategy``: 'auto' (broadcast the deduped batch into the
    resolve join when it has <= max_broadcast_rows rows, else sort-merge
    full-outer), 'broadcast', or 'smj'.

    ``merge_mode``: 'cow' (copy-on-write — rewrite every touched file),
    'mor' (merge-on-read — write ONE batch-sized winners file flagged as an
    equality-delete mask, rewrite nothing; table.py docstring), or 'auto'
    (MoR when the touched slice is > ``mor_rewrite_ratio`` x the deduped
    batch — the microbatch-against-big-table regime where CoW's write
    amplification dominates; CoW otherwise, so bulk batches keep the
    one-version-per-key layout and reads stay mask-free).

    ``dedup_strategy``: 'agg' (max_by aggregate — the default), 'fetch'
    (winner-id aggregation + payload fetch join: only (key, ord) rides the
    winner shuffle — measured 31% faster on payload-heavy bulk batches in
    the bandwidth-bound low-parallelism regime, at the cost of scanning the
    batch input twice), or 'salted' (two-phase hot-key path; also selected
    by the legacy ``use_salted_dedup`` flag). All three produce the
    identical LWW winner set (operators/dedup.py)."""
    last_err: TableCommitError | None = None
    for _attempt in range(max_commit_retries + 1):
        # re-check the fence each attempt: the conflicting writer may have
        # been a replay of THIS epoch
        if table.is_fenced(epoch):
            return MergeResult(table.head_id(), False, 0, 0, 0, 0)
        try:
            return _merge_attempt(
                table,
                changes,
                epoch,
                lineage_partitions,
                target_rows_per_file,
                "salted" if use_salted_dedup else dedup_strategy,
                resolve_strategy,
                max_broadcast_rows,
                merge_mode,
                mor_rewrite_ratio,
            )
        except TableCommitError as e:
            last_err = e
    raise last_err


def _merge_attempt(
    table: LakeTable,
    changes: DataFrame,
    epoch: int,
    lineage_partitions: int,
    target_rows_per_file: int,
    dedup_strategy: str,
    resolve_strategy: str,
    max_broadcast_rows: int,
    merge_mode: str,
    mor_rewrite_ratio: float,
) -> MergeResult:
    if merge_mode not in ("auto", "cow", "mor"):
        raise ValueError(f"unknown merge_mode {merge_mode!r}; one of ['auto', 'cow', 'mor']")
    _t = time.perf_counter()
    spark = table.spark
    # pin the whole attempt to one snapshot: plan, resolve, and commit all
    # see the same table state; commit(expect_parent=...) enforces it
    snap = table.snapshot()
    head0 = snap["snapshot_id"]
    schema = StructType.fromJson(snap["schema"])
    payload_names = [f.name for f in schema.fields if f.name != "doc_id"]

    changes = _normalize_changes(schema, changes)
    dedup_fns = {"agg": lww_dedup, "salted": lww_dedup_salted, "fetch": lww_dedup_fetch}
    if dedup_strategy not in dedup_fns:
        raise ValueError(f"unknown dedup_strategy {dedup_strategy!r}; one of {sorted(dedup_fns)}")
    dedup = dedup_fns[dedup_strategy](changes)
    # dedup feeds both the file-touch planning and the resolve join; persist
    # so the feed scan + dedup shuffle run once per batch, not twice. The
    # cached plan is COMPILED here (CacheManager pins the physical plan at
    # persist time), so AQE is scoped off: an adaptive cached child runs its
    # shuffle as a separate materialization job on every epoch — one of the
    # per-job scheduling taxes the microbatch fast path exists to remove —
    # and buys nothing for an agg whose skew dies in the partial phase.
    with _aqe_off(spark):
        dedup = dedup.persist()

    # ---- plan: which files does this batch touch?
    files = snap["files"]
    layout = snap.get("layout") or {"type": "range"}
    is_bucket = layout.get("type") == "bucket"
    n_buckets = int(layout["n_buckets"]) if is_bucket else 0
    bucket_expr = (
        F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int") if is_bucket else None
    )
    # a staged layout migration (maintenance.migrate_layout_staged) marks
    # not-yet-rewritten files layout_stale: their bucket tags (if any) were
    # computed under a PREVIOUS layout's modulus and must never be used for
    # exact bucket pruning — stale files plan by key RANGE instead (their
    # min/max stats are layout-independent), which is sound for any file
    if is_bucket:
        # bucket layout: a file is plannable iff it carries its bucket set —
        # pruning is EXACT membership, not a range test
        plannable = [f for f in files if f.get("buckets") and not f.get("layout_stale")]
        rest = [f for f in files if not f.get("buckets") or f.get("layout_stale")]
        range_plannable = [f for f in rest if f["min_key"] is not None]
        unplannable = [f for f in rest if f["min_key"] is None]
    else:
        plannable = [f for f in files if f["min_key"] is not None]
        range_plannable = []
        unplannable = [f for f in files if f["min_key"] is None]  # no stats -> always touched
    touched_paths: set[str] = {f["path"] for f in unplannable}
    n_changes: int | None = None

    # ---- keys probe: ONE bounded job that decides fast vs bulk planning.
    # LocalLimit caps every partition at CAP+1 rows, the groupBy().agg
    # root avoids CollectLimit's incremental scale-up jobs, and because
    # dedup is one row per key, len(keys) IS n_changes when under the cap.
    # A bulk batch returns exactly CAP+1 rows and the driver discards them
    # — no unbounded collect; the probe's full-partition evaluation also
    # materializes the dedup cache the later jobs reuse.
    if is_bucket:
        # ship (key, bucket) pairs: the bucket id is a JVM xxhash64 the
        # driver cannot recompute
        probe_col = F.struct(F.col("doc_id"), bucket_expr.alias("_bkt")).alias("kb")
    else:
        probe_col = F.col("doc_id").alias("kb")
    with _aqe_off(spark):
        probe = (
            dedup.select(probe_col)
            .limit(FAST_PATH_MAX_KEYS + 1)
            .groupBy()
            .agg(F.collect_list("kb").alias("ks"))
            .collect()
        )
    key_rows = probe[0]["ks"] if probe else []
    batch_keys: list[str] | None = None
    batch_buckets: set[int] | None = None
    key_bucket: dict[str, int] | None = None
    if len(key_rows) <= FAST_PATH_MAX_KEYS:
        import bisect

        def _range_touch(entries: list[dict], keys: list[str]) -> None:
            # driver-side file-touch planning: files are range-tight (range-
            # partitioned writes), keys are sorted — one bisect per file
            # entry, O(F log K) on the driver, zero Spark jobs. Exactly the
            # join predicate doc_id BETWEEN min_key AND max_key, locally.
            for f in entries:
                i = bisect.bisect_left(keys, f["min_key"])
                if i < len(keys) and keys[i] <= f["max_key"]:
                    touched_paths.add(f["path"])

        if is_bucket:
            key_bucket = {r["doc_id"]: r["_bkt"] for r in key_rows}
            batch_buckets = set(key_bucket.values())
            batch_keys = sorted(key_bucket)
            for f in plannable:
                if not batch_buckets.isdisjoint(f["buckets"]):
                    touched_paths.add(f["path"])
            _range_touch(range_plannable, batch_keys)
        else:
            batch_keys = sorted(key_rows)
            _range_touch(plannable, batch_keys)
        n_changes = len(batch_keys)
    elif is_bucket:
        # mid-migration stale files count as touched under BULK planning: a
        # >FAST_PATH_MAX_KEYS batch of hash-scattered keys intersects a
        # wide-range file with near certainty, so an exact range join would
        # almost never prune one — and touching them progresses the
        # migration (the CoW rewrite emits them in the current layout)
        touched_paths |= {f["path"] for f in range_plannable}
        if plannable:
            from pyspark.sql import Observation

            # bulk planning, bucket layout: exact bucket-membership join —
            # (path, bucket) pairs broadcast, equality join (no range condition)
            stats_df = spark.createDataFrame(
                [(f["path"], b) for f in plannable for b in f["buckets"]],
                "path string, bucket int",
            )
            obs_plan = Observation(f"plan-epoch-{epoch}")
            hits = (
                dedup.observe(obs_plan, F.count(F.lit(1)).alias("n"))
                .select(bucket_expr.alias("_bkt"))
                .join(F.broadcast(stats_df), F.col("_bkt") == F.col("bucket"), "left_outer")
                .select("path")
                .distinct()
                .collect()
            )
            touched_paths |= {r["path"] for r in hits if r["path"] is not None}
            try:
                n_changes = obs_plan.get["n"]
            except Exception:
                n_changes = dedup.count()
        else:
            n_changes = dedup.count()
    elif plannable:
        from pyspark.sql import Observation

        stats_df = spark.createDataFrame(
            [(f["path"], f["min_key"], f["max_key"]) for f in plannable],
            "path string, min_key string, max_key string",
        )
        # the batch-size signal for the resolve-strategy choice rides the
        # planning job as an Observation — no extra action (a dedup.count()
        # here would recompute the whole dedup before the cache exists)
        obs_plan = Observation(f"plan-epoch-{epoch}")
        # LEFT outer, not inner: when a batch touches NO file (all-new keys)
        # an inner join's output is empty and AQE re-plans the query as an
        # empty relation, dropping the CollectMetrics accumulators — the
        # observation then raises on .get (observed empirically; latent in
        # round 2, where every test batch happened to intersect a file).
        # The null-path row keeps the output non-empty whenever the batch
        # is, so the metrics always survive.
        hits = (
            dedup.observe(obs_plan, F.count(F.lit(1)).alias("n"))
            .select("doc_id")
            .join(
                F.broadcast(stats_df),
                (F.col("doc_id") >= F.col("min_key")) & (F.col("doc_id") <= F.col("max_key")),
                "left_outer",
            )
            .select("path")
            .distinct()
            .collect()
        )
        touched_paths |= {r["path"] for r in hits if r["path"] is not None}
        try:
            n_changes = obs_plan.get["n"]
        except Exception:
            # an EMPTY batch still yields an empty plan output; the count
            # reuses the dedup cache the planning job just materialized
            n_changes = dedup.count()
    else:
        # bulk batch with no plannable files: initial load, or stats-less
        # entries only (already all touched). One count sizes the write; it
        # reads from the cache the probe job just materialized.
        n_changes = dedup.count()
    _t = _phase("plan", _t)

    if n_changes == 0:
        # empty deduped batch: nothing to resolve or write. Still fence the
        # epoch — streaming tails deliver empty microbatches and resume must
        # stay monotone — via a files-unchanged commit.
        dedup.unpersist()
        new_sid = table.commit(
            add_files=[],
            fences=[{"checkpoint_epoch": epoch, "partition_id": -1, "committed_at_snapshot": head0 + 1}],
            lineage=[],
            summary={"rows_upserted": 0, "rows_deleted": 0, "epoch": epoch, "mode": "empty"},
            expect_parent=head0,
        )
        return MergeResult(new_sid, True, 0, 0, 0, 0, mode="empty")

    touched_rows = sum(f["rows"] for f in files if f["path"] in touched_paths)
    # Merge-on-read decision: when a microbatch touches a slice far larger
    # than itself, CoW pays touched_rows of write amplification for
    # n_changes of actual change. MoR writes ONLY the winners (plus masks,
    # which are free — table.py docstring) and defers the rewrite to
    # compaction. Bulk batches stay CoW: their write is ~batch-sized either
    # way, and CoW keeps reads mask-free.
    use_mor = bool(touched_paths) and (
        merge_mode == "mor"
        or (
            merge_mode == "auto"
            and n_changes is not None
            and touched_rows > mor_rewrite_ratio * max(n_changes, 1)
        )
    )

    # ---- resolve LWW against the touched slice of the table
    # rename-aware field-id reads (table.load_files): touched files may
    # predate a column rename/add/widen; includes tombstone rows. The full
    # (masked, payload-bearing) target is built ONLY on the CoW path — the
    # MoR resolve reads its own narrow unmasked projection, and building
    # the DataFrame here would eagerly run file listing for nothing.
    touched_entries = [f for f in files if f["path"] in touched_paths] if touched_paths else []
    target = None
    if touched_entries and not use_mor:
        target = table.load_files(touched_entries, snap)

    def _changes_only_rows(df: DataFrame) -> DataFrame:
        """Format change rows that have no target counterpart (new keys /
        empty table): the change always applies."""
        sel = [F.col("doc_id")]
        for name in payload_names:
            sel.append(F.col(name))
        sel += [
            F.col("commit_lsn").alias(HIDDEN_LSN),
            F.col("op_seq").alias(HIDDEN_SEQ),
            (F.col("op") == "D").alias(HIDDEN_DELETED),
            F.lit(True).alias("_applied"),
            (F.col("op") == "D").alias("_is_delete"),
            F.lit(False).alias("_was_live"),
            F.lit(False).alias("_existed"),
            F.col("commit_lsn").alias("_chg_lsn"),
        ]
        return df.select(*sel)

    if use_mor and touched_entries:
        # MoR fast resolve: the winners file takes its payload from the
        # CHANGE rows, so the target is needed only to decide who wins —
        # a column-pruned scan of (doc_id, version columns), never the
        # token payload. Both joins broadcast batch-sized sides: a semi-join
        # filters the narrow target scan to batch keys, then the version
        # compare joins change rows to their stored version. No table
        # payload crosses the wire; write amplification AND read volume are
        # batch-sized.
        small_batch = n_changes is not None and n_changes <= max_broadcast_rows
        # UNMASKED narrow read + per-key version argmax, instead of the
        # file-level mask join: by the LWW invariant a change only lands by
        # beating the stored version, so the max (_commit_lsn, _op_seq) row
        # per key IS the current state. Skipping _apply_mor_masks here
        # drops the per-epoch mask scan + broadcast (which grow with the
        # mor backlog) from the hot path; the agg below runs over the
        # batch-keyed slice only (semi-join first), so it's batch-sized.
        narrow = table.load_files(touched_entries, snap, apply_masks=False).select(
            "doc_id", HIDDEN_LSN, HIDDEN_SEQ, HIDDEN_DELETED
        )
        if batch_keys is not None:
            # fast path (module comment on FAST_PATH_MAX_KEYS): the key
            # envelope is a residual predicate PUSHED INTO the parquet scan
            # (row-group pruning for localized batches) and the batch-key
            # membership test is an InSet FILTER, not a join — no broadcast
            # build job, no shuffle; with the forced sort-merge resolve join
            # below, the whole resolve+write is ONE job. The IN list goes
            # through ONE sql-parser round-trip: Column.isin ships every
            # element as its own py4j literal (~3.4 s at 5k keys, measured).
            # _sql_str emits parser-mode-immune literals, so this parse is
            # correct even if a caller enables the legacy
            # escapedStringLiterals mode (also pinned off in build_session)
            narrow = narrow.where(
                F.col("doc_id").between(batch_keys[0], batch_keys[-1])
            ).where(F.expr("doc_id IN (" + ",".join(_sql_str(k) for k in batch_keys) + ")"))
        else:
            keys = dedup.select("doc_id")
            narrow = narrow.join(F.broadcast(keys) if small_batch else keys, "doc_id", "left_semi")
        tgtv = (
            narrow.groupBy("doc_id")
            .agg(F.max(F.struct(HIDDEN_LSN, HIDDEN_SEQ, HIDDEN_DELETED)).alias("_v"))
            .select(
                "doc_id",
                F.col(f"_v.{HIDDEN_LSN}").alias(HIDDEN_LSN),
                F.col(f"_v.{HIDDEN_SEQ}").alias(HIDDEN_SEQ),
                F.col(f"_v.{HIDDEN_DELETED}").alias(HIDDEN_DELETED),
            )
        )
        c = dedup.alias("c")
        if batch_keys is not None:
            t = tgtv.hint("merge").alias("t")
            joined = c.join(t, F.col("c.doc_id") == F.col("t.doc_id"), "left_outer")
        else:
            t = tgtv.alias("t")
            joined = c.join(
                F.broadcast(t) if small_batch else t,
                F.col("c.doc_id") == F.col("t.doc_id"),
                "left_outer",
            )
        change_wins = F.col("t.doc_id").isNull() | (
            (F.col("c.commit_lsn") > F.col(f"t.{HIDDEN_LSN}"))
            | (
                (F.col("c.commit_lsn") == F.col(f"t.{HIDDEN_LSN}"))
                & (F.col("c.op_seq") >= F.col(f"t.{HIDDEN_SEQ}"))
            )
        )
        sel = [F.col("c.doc_id").alias("doc_id")]
        for name in payload_names:
            sel.append(F.col(f"c.{name}").alias(name))
        sel += [
            F.col("c.commit_lsn").alias(HIDDEN_LSN),
            F.col("c.op_seq").alias(HIDDEN_SEQ),
            (F.col("c.op") == "D").alias(HIDDEN_DELETED),
            F.lit(True).alias("_applied"),
            (F.col("c.op") == "D").alias("_is_delete"),
            (~F.coalesce(F.col(f"t.{HIDDEN_DELETED}"), F.lit(False))).alias("_was_live"),
            F.col("t.doc_id").isNotNull().alias("_existed"),
            F.col("c.commit_lsn").alias("_chg_lsn"),
        ]
        resolved = joined.where(change_wins).select(*sel)
    elif target is not None:
        # Strategy: the full-outer SortMergeJoin shuffles the touched target
        # payload a second time (range write already shuffles it once). When
        # the deduped batch is small — the common microbatch case — the same
        # result decomposes into (a) target LEFT OUTER broadcast(changes):
        # target payload never crosses the wire for the join, and (b) a
        # keys-only anti-join supplying brand-new keys. Fallback to the SMJ
        # full-outer for bulk batches above the broadcast budget: measured on
        # 400k-row deduped batches (~220 MB with token payloads) the
        # broadcast build/probe costs MORE than the SMJ shuffle (8.4M-event
        # replay: 41s vs 25-30s at 8 cores), so the auto threshold stays at
        # true-microbatch scale.
        use_broadcast = resolve_strategy == "broadcast" or (
            resolve_strategy == "auto" and n_changes is not None and n_changes <= max_broadcast_rows
        )
        c = dedup.alias("c")
        t = target.alias("t")
        if use_broadcast:
            joined = t.join(F.broadcast(c), on=F.col("t.doc_id") == F.col("c.doc_id"), how="left_outer")
        else:
            joined = t.join(c, on=F.col("t.doc_id") == F.col("c.doc_id"), how="full_outer")
        change_wins = F.col("t.doc_id").isNull() | (
            F.col("c.commit_lsn").isNotNull()
            & (
                (F.col("c.commit_lsn") > F.col(f"t.{HIDDEN_LSN}"))
                | (
                    (F.col("c.commit_lsn") == F.col(f"t.{HIDDEN_LSN}"))
                    & (F.col("c.op_seq") >= F.col(f"t.{HIDDEN_SEQ}"))
                )
            )
        )
        has_change = F.col("c.doc_id").isNotNull()
        sel = [F.coalesce(F.col("c.doc_id"), F.col("t.doc_id")).alias("doc_id")]
        for name in payload_names:
            sel.append(
                F.when(has_change & change_wins, F.col(f"c.{name}"))
                .otherwise(F.col(f"t.{name}"))
                .alias(name)
            )
        sel.append(
            F.when(has_change & change_wins, F.col("c.commit_lsn")).otherwise(F.col(f"t.{HIDDEN_LSN}")).alias(HIDDEN_LSN)
        )
        sel.append(
            F.when(has_change & change_wins, F.col("c.op_seq")).otherwise(F.col(f"t.{HIDDEN_SEQ}")).alias(HIDDEN_SEQ)
        )
        sel.append(
            F.when(has_change & change_wins, F.col("c.op") == "D")
            .otherwise(F.coalesce(F.col(HIDDEN_DELETED), F.lit(False)))
            .alias(HIDDEN_DELETED)
        )
        sel.append((has_change & change_wins).alias("_applied"))
        sel.append((F.col("c.op") == "D").alias("_is_delete"))
        sel.append(
            (F.coalesce(F.col(f"t.{HIDDEN_DELETED}"), F.lit(False)) == False).alias("_was_live")  # noqa: E712
        )
        sel.append(F.col("t.doc_id").isNotNull().alias("_existed"))
        sel.append(F.col("c.commit_lsn").alias("_chg_lsn"))
        resolved = joined.select(*sel)
        if use_broadcast:
            # brand-new keys: anti-join against a keys-only (column-pruned)
            # scan of the touched files — narrow shuffle of keys, no payload
            new_rows = dedup.join(target.select("doc_id"), on="doc_id", how="left_anti")
            resolved = resolved.unionByName(_changes_only_rows(new_rows))
    else:
        resolved = _changes_only_rows(dedup)

    # ---- size the apply write (before the persist decision, which keys on
    # whether a boundary sampler will exist at all)
    par = spark.sparkContext.defaultParallelism
    if use_mor:
        # batch-sized winners-only write: sized by n_changes with NO
        # parallelism floor — a microbatch must not fragment into `par`
        # near-empty files every epoch (that debt is exactly what MoR
        # avoids); forced-mor bulk batches still fan out by size.
        est_rows = n_changes if n_changes is not None else target_rows_per_file // 10
        n_files = max(1, (est_rows // target_rows_per_file) + 1)
    else:
        # file count: ~target_rows_per_file rows each. Bulk batches floor at
        # cluster parallelism so the apply write always uses every core — a
        # single write partition is a serial fraction that caps scaling
        # (Amdahl). MICRObatches (batch_keys collected) drop the floor: a
        # small touched slice must not fragment into `par` near-empty files
        # per epoch — >=~100k rows per file up to `par`, and a genuinely
        # tiny slice writes ONE file, which also removes the range
        # boundary-sampler pass entirely. Sized from what this write
        # actually contains — the touched slice plus the batch — NOT the
        # whole table's row count.
        est_rows = touched_rows + (n_changes if n_changes is not None else target_rows_per_file // 10)
        if batch_keys is not None:
            n_files = max(1, min(par, est_rows // 100_000), (est_rows // target_rows_per_file) + 1)
        else:
            n_files = max(par, (est_rows // target_rows_per_file) + 1)

    # Although only one ACTION consumes resolved, the range write evaluates
    # it TWICE when n_files > 1 — repartitionByRange's boundary-sampling
    # pass executes the exchange child before the write tasks do — so the
    # CoW path (payload-heavy resolve join) persists it and the sampler
    # materializes the cache for the write. The MoR path skips the cache:
    # its resolve is a pair of batch-sized broadcast joins, cheaper to
    # recompute than to serialize through the block store. Bucket layout
    # also skips it (hash exchange, no sampling pass), as does a
    # single-file write (repartitionByRange(1) plans no sampler).
    persisted = not use_mor and not is_bucket and n_files > 1
    if persisted:
        resolved = resolved.persist()
    stage: str | None = None
    committed = False
    try:
        # ---- lineage metrics ride the apply pass itself (CollectMetrics /
        # Observation): no separate aggregation job scans the resolved
        # relation. Per-lineage-partition min/max/sums are expressed as
        # conditional aggregates over a stable key hash.
        from pyspark.sql import Observation

        metric_exprs = list(_lineage_metric_exprs(lineage_partitions))
        obs = Observation(f"merge-epoch-{epoch}-{head0}")

        # ---- apply: range-partition on the merge key, write, collect stats
        sid_next = head0 + 1
        stage = table.stage_dir(sid_next)
        if use_mor:
            write_input = resolved.where(F.col("_applied"))
        else:
            write_input = resolved
        # manifest stats ride the SAME Observation as the lineage metrics:
        # after the range exchange, output partition i becomes file
        # part-{i:05d}, so per-partition (count, min, max) of doc_id ARE the
        # per-file manifest entries — the write tasks ship the stats back,
        # Iceberg-style, and the written data is never rescanned. Guarded to
        # a bounded file count (conditional-aggregate width grows with
        # n_files); beyond it the one distributed stats scan is the fallback.
        out_cols = ["doc_id", *payload_names, HIDDEN_LSN, HIDDEN_SEQ, HIDDEN_DELETED]
        metric_cols = ["_applied", "_is_delete", "_existed", "_was_live", "_chg_lsn"]
        # MoR winners on a bucket table are NOT bucket-partitioned: a
        # spread microbatch hashes into every bucket, so bucketing the
        # winners would fan one batch-sized write into n_buckets tiny files
        # per epoch (measured 2.5x the epoch wall). Winners take the
        # compact size-driven write; their manifest entries still carry the
        # bucket SET (from the collected key->bucket pairs, or the stats
        # scan for bulk forced-MoR), so bucket pruning and the bucket-local
        # compaction closure stay exact. Compaction then re-buckets them.
        write_bucketed = is_bucket and not use_mor
        if write_bucketed:
            # bucket layout: plain hash exchange on the bucket id — no
            # boundary sampler, no double evaluation; every row lands in
            # its key's fixed bucket, per-bucket stats (count/min/max AND
            # the output partition the bucket landed in) ride the write
            obs_file_stats = n_buckets <= MAX_OBSERVED_STAT_FILES
            if obs_file_stats:
                metric_exprs += _bucket_stat_exprs(n_buckets)
            writer = (
                write_input.select(*out_cols, *metric_cols)
                .withColumn("_bucket", bucket_expr)
                .repartition(n_buckets, "_bucket")
                .observe(obs, *metric_exprs)
                .drop(*metric_cols, "_bucket")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
            )
        else:
            # bulk forced-MoR on a bucket table has no collected key set to
            # derive bucket tags from — only the stats scan can supply them
            obs_file_stats = n_files <= MAX_OBSERVED_STAT_FILES and not (
                is_bucket and key_bucket is None
            )
            if obs_file_stats:
                metric_exprs += _file_stat_exprs(n_files)
            writer = (
                write_input.select(*out_cols, *metric_cols)
                .repartitionByRange(n_files, "doc_id")
                # observe sits ABOVE the range exchange: the boundary-
                # sampling job only executes the exchange's child, so the
                # metrics are evaluated exactly once — in the write job (a
                # CollectMetrics below the exchange would be executed by
                # both passes and double-count; cdc_lineage_counts oracle)
                .observe(obs, *metric_exprs)
                .drop(*metric_cols)
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
            )
        _t = _phase("wbuild", _t)
        if batch_keys is not None and (use_mor or is_bucket or n_files == 1):
            # microbatch fast path: AQE's stage-replan loop costs more than
            # it could ever save on batch-sized shuffles; with it off the
            # resolve+write runs as one job (FAST_PATH_MAX_KEYS comment)
            with _aqe_off(spark):
                writer.parquet(stage)
        else:
            writer.parquet(stage)
        _t = _phase("write", _t)
        m = obs.get
        lineage = []
        for p in range(lineage_partitions):
            if m[f"lsn_min_{p}"] is None:
                continue
            lineage.append(
                {
                    "checkpoint_epoch": epoch,
                    "partition_id": p,
                    "lsn_min": m[f"lsn_min_{p}"],
                    "lsn_max": m[f"lsn_max_{p}"],
                    "rows_upserted": m[f"ups_{p}"],
                    "rows_deleted": m[f"del_{p}"],
                }
            )
        fences = [
            {"checkpoint_epoch": epoch, "partition_id": r["partition_id"], "committed_at_snapshot": sid_next}
            for r in lineage
        ] or [{"checkpoint_epoch": epoch, "partition_id": -1, "committed_at_snapshot": sid_next}]
        rows_upserted = sum(r["rows_upserted"] for r in lineage)
        rows_deleted = sum(r["rows_deleted"] for r in lineage)
        add_files = None
        if obs_file_stats and write_bucketed:
            add_files = _files_from_bucket_observation(m, stage, n_buckets, snap["schema_version"])
        elif obs_file_stats:
            add_files = _files_from_observation(m, stage, n_files, snap["schema_version"])
            if add_files is not None and is_bucket and key_bucket is not None:
                # MoR winners under bucket layout: tag each (range-written,
                # min/max-tight) file with the bucket set of the batch keys
                # inside its range — exact, winners keys ⊆ collected keys
                import bisect

                for f in add_files:
                    i = bisect.bisect_left(batch_keys, f["min_key"])
                    j = bisect.bisect_right(batch_keys, f["max_key"])
                    f["buckets"] = sorted({key_bucket[k] for k in batch_keys[i:j]})
        if add_files is None:
            add_files = _collect_file_stats(
                table, stage, snap["schema_version"], n_buckets=n_buckets if is_bucket else None
            )
        _t = _phase("stats", _t)
        if use_mor:
            # the winners file doubles as the equality-delete mask: readers
            # drop same-key rows from older files (table.py docstring)
            for f in add_files:
                f["mor"] = True
        elif any(f.get("mor") for f in files if f["path"] in touched_paths):
            # CoW rewrite that REMOVES a mor winners file: the mask dies with
            # it, but the stale copies it masked may live in files this batch
            # did NOT touch (the winners file's key range spans every key its
            # MoR epoch applied; this batch only intersects part of it).
            # Without a new mask those copies resurrect as duplicate keys
            # (interleaved mor-then-cow, tests/test_merge_on_read.py). The
            # output IS the current state for every key it holds (resolved
            # through the masked loader), so it can safely inherit the mor
            # flag — the same keep-the-flag rule maintenance.compact uses —
            # unless no untouched file overlaps a removed winners file (then
            # no masked copy survives anywhere). compact_mor sheds the debt.
            removed_mor = [f for f in files if f["path"] in touched_paths and f.get("mor")]
            untouched = [f for f in files if f["path"] not in touched_paths]

            def _overlaps(a: dict, b: dict) -> bool:
                if (
                    a.get("buckets")
                    and b.get("buckets")
                    and not a.get("layout_stale")
                    and not b.get("layout_stale")
                ):
                    # bucket layout: copies of a key live only in same-bucket
                    # files — disjoint bucket sets cannot share a key.
                    # layout_stale tags may be under an older modulus, so
                    # stale entries fall back to the range test
                    return not set(a["buckets"]).isdisjoint(b["buckets"])
                if a["min_key"] is None or b["min_key"] is None:
                    return True  # no stats -> cannot prove disjoint
                return a["max_key"] >= b["min_key"] and a["min_key"] <= b["max_key"]

            if any(_overlaps(u, m) for u in untouched for m in removed_mor):
                for f in add_files:
                    f["mor"] = True
        try:
            new_sid = table.commit(
                add_files=add_files,
                remove_paths=set() if use_mor else touched_paths,
                fences=fences,
                lineage=lineage,
                summary={
                    "rows_upserted": rows_upserted,
                    "rows_deleted": rows_deleted,
                    "epoch": epoch,
                    "mode": "mor" if use_mor else "cow",
                },
                expect_parent=head0,
            )
        except TableCommitError:
            # another writer advanced HEAD after we planned: this attempt's
            # files are orphaned — drop them and let merge_batch replan
            raise
        _t = _phase("commit", _t)
        committed = True
        return MergeResult(
            new_sid,
            True,
            rows_upserted,
            rows_deleted,
            0 if use_mor else len(touched_paths),
            len(add_files),
            mode="mor" if use_mor else "cow",
        )
    finally:
        if not committed and stage is not None:
            # ANY failure after staging (write error, metrics, commit
            # conflict) leaves orphaned files — remove them; gc_orphans
            # covers only hard crashes that skip this frame entirely
            shutil.rmtree(stage, ignore_errors=True)
        if persisted:
            resolved.unpersist()
        dedup.unpersist()


MAX_OBSERVED_STAT_FILES = 256

# Column objects are immutable plan fragments — reusable across queries and
# epochs. Building the ~70 conditional lineage/file-stat aggregates costs
# hundreds of py4j round-trips (~0.5-1 s/epoch of driver latency, measured
# via tools/bench_epoch.py --phases), so they are built once per
# (lineage_partitions | n_files) and reused for every epoch.
_LINEAGE_EXPRS_CACHE: OrderedDict = OrderedDict()
_FILE_STAT_EXPRS_CACHE: OrderedDict = OrderedDict()


def _lineage_metric_exprs(lineage_partitions: int) -> list:
    def _build():
        applied = F.col("_applied")
        lp = F.pmod(F.xxhash64("doc_id"), F.lit(lineage_partitions)).cast("int")
        cached = [F.count(F.lit(1)).alias("n_rows")]
        for p in range(lineage_partitions):
            inp = applied & (lp == p)
            cached += [
                F.min(F.when(inp, F.col("_chg_lsn"))).alias(f"lsn_min_{p}"),
                F.max(F.when(inp, F.col("_chg_lsn"))).alias(f"lsn_max_{p}"),
                F.sum(F.when(inp & ~F.col("_is_delete"), 1).otherwise(0)).alias(f"ups_{p}"),
                F.sum(
                    F.when(inp & F.col("_is_delete") & F.col("_existed") & F.col("_was_live"), 1).otherwise(0)
                ).alias(f"del_{p}"),
            ]
        return cached

    return expr_cache_get(_LINEAGE_EXPRS_CACHE, (lineage_partitions,), _build)


def _file_stat_exprs(n_files: int) -> list:
    def _build():
        pid = F.spark_partition_id()
        cached = []
        for i in range(n_files):
            cached += [
                F.min(F.when(pid == i, F.col("doc_id"))).alias(f"fmin_{i}"),
                F.max(F.when(pid == i, F.col("doc_id"))).alias(f"fmax_{i}"),
                F.sum(F.when(pid == i, 1).otherwise(0)).alias(f"fcnt_{i}"),
            ]
        return cached

    return expr_cache_get(_FILE_STAT_EXPRS_CACHE, (n_files,), _build)


_BUCKET_STAT_EXPRS_CACHE: OrderedDict = OrderedDict()


def _bucket_stat_exprs(n_buckets: int) -> list:
    """Per-BUCKET write stats: count/min/max of doc_id plus the output
    partition the bucket landed in (a bucket's rows all share one partition
    of the hash exchange, so max(pid) IS that partition — and partition p
    becomes file part-{p:05d})."""

    def _build():
        pid = F.spark_partition_id()
        cached = []
        for b in range(n_buckets):
            inb = F.col("_bucket") == b
            cached += [
                F.min(F.when(inb, F.col("doc_id"))).alias(f"bmin_{b}"),
                F.max(F.when(inb, F.col("doc_id"))).alias(f"bmax_{b}"),
                F.sum(F.when(inb, 1).otherwise(0)).alias(f"bcnt_{b}"),
                F.max(F.when(inb, pid)).alias(f"bpart_{b}"),
            ]
        return cached

    return expr_cache_get(_BUCKET_STAT_EXPRS_CACHE, (n_buckets,), _build)


def _files_from_bucket_observation(
    metrics: dict, stage: str, n_buckets: int, schema_version: int
) -> list[dict] | None:
    """Manifest entries for a bucket-layout write from the write job's own
    per-bucket metrics: buckets are grouped by the output partition they
    landed in (hash collisions may co-locate several buckets in one file);
    each partition p with rows maps to file part-{p:05d}. Returns None if
    the on-disk files don't reconcile (caller falls back to the scan)."""
    by_index: dict[int, str] = {}
    for fn in os.listdir(stage):
        mm = _PART_RE.match(fn)
        if mm:
            idx = int(mm.group(1))
            if idx in by_index:
                return None  # index->file bijection broken (maxRecordsPerFile)
            by_index[idx] = fn
    part_buckets: dict[int, list[int]] = {}
    for b in range(n_buckets):
        if metrics.get(f"bcnt_{b}"):
            p = metrics[f"bpart_{b}"]
            part_buckets.setdefault(p, []).append(b)
    add_files = []
    for p, bs in sorted(part_buckets.items()):
        fn = by_index.pop(p, None)
        if fn is None:
            return None  # rows observed but no file — reconcile via scan
        add_files.append(
            {
                "path": os.path.abspath(os.path.join(stage, fn)),
                "rows": sum(metrics[f"bcnt_{b}"] for b in bs),
                "min_key": min(metrics[f"bmin_{b}"] for b in bs),
                "max_key": max(metrics[f"bmax_{b}"] for b in bs),
                "buckets": bs,
                "schema_version": schema_version,
            }
        )
    for idx, fn in by_index.items():
        # empty partition: Spark normally writes no file; remove schema-only
        # stragglers — but NEVER a file that holds rows the metrics missed
        # (that would silently commit data away; reconcile via scan instead)
        import pyarrow.parquet as pq

        full = os.path.join(stage, fn)
        if pq.read_metadata(full).num_rows != 0:
            return None
        os.remove(full)
    return add_files


_PART_RE = re.compile(r"^part-(\d{5})-.*\.parquet$")


def _files_from_observation(
    metrics: dict, stage: str, n_files: int, schema_version: int
) -> list[dict] | None:
    """Build manifest entries from the write job's own per-partition metrics
    (partition i -> file part-{i:05d}) — zero extra jobs. Returns None if
    the on-disk files don't reconcile with the metrics (e.g. an unexpected
    writer layout), in which case the caller falls back to the scan."""
    by_index: dict[int, str] = {}
    for fn in os.listdir(stage):
        mm = _PART_RE.match(fn)
        if mm:
            idx = int(mm.group(1))
            if idx in by_index:
                # a write task emitted >1 file for one partition (e.g. the
                # user session sets spark.sql.files.maxRecordsPerFile ->
                # part-00000-...-c000 AND -c001). The index->file bijection
                # the metrics rely on is broken; silently keeping either
                # file would commit the other's rows away. Reconcile via
                # the distributed scan instead.
                return None
            by_index[idx] = fn
    add_files = []
    for i in range(n_files):
        cnt = metrics.get(f"fcnt_{i}")
        fn = by_index.pop(i, None)
        if not cnt:
            # empty partition: Spark writes no file (the rare all-empty
            # write creates one schema-only file — remove it as untracked)
            if fn is not None:
                os.remove(os.path.join(stage, fn))
            continue
        if fn is None:
            return None  # rows observed but no file — reconcile via scan
        add_files.append(
            {
                "path": os.path.abspath(os.path.join(stage, fn)),
                "rows": cnt,
                "min_key": metrics[f"fmin_{i}"],
                "max_key": metrics[f"fmax_{i}"],
                "schema_version": schema_version,
            }
        )
    if by_index:
        return None  # files beyond the expected partition range
    return add_files


def _collect_file_stats(
    table: LakeTable, stage: str, schema_version: int, n_buckets: int | None = None
) -> list[dict]:
    """Per-file (rows, min/max doc_id) for every file the apply wrote — the
    manifest entries that drive the next merge's copy-on-write pruning.

    FALLBACK path (the primary is ``_files_from_observation``: stats ride
    the write job's CollectMetrics, zero extra jobs): ONE distributed
    column-pruned Spark scan of the written files grouped by
    ``input_file_name`` — still never a driver-side footer loop, which was
    the round-1 per-epoch serial fraction. Files are tagged with the
    schema_version they were written under so rename-aware reads can
    resolve their column names by field id."""
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.min("doc_id").alias("min_key"),
        F.max("doc_id").alias("max_key"),
    ]
    if n_buckets is not None:
        aggs.append(
            F.sort_array(
                F.collect_set(F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))
            ).alias("buckets")
        )
    rows = (
        table.spark.read.parquet(stage)
        .groupBy(F.input_file_name().alias("uri"))
        .agg(*aggs)
        .collect()
    )
    add_files = []
    for r in rows:
        path = urllib.parse.unquote(urllib.parse.urlparse(r["uri"]).path)
        entry = {
            "path": path,
            "rows": r["rows"],
            "min_key": r["min_key"],
            "max_key": r["max_key"],
            "schema_version": schema_version,
        }
        if n_buckets is not None:
            entry["buckets"] = list(r["buckets"])
        add_files.append(entry)
    add_files.sort(key=lambda d: d["path"])
    # a partition that received no rows writes no file; any zero-row parquet
    # Spark still creates (the all-empty-write case) is untracked — remove it
    # so the staging dir never accumulates orphans
    tracked = {f["path"] for f in add_files}
    for fn in os.listdir(stage):
        full = os.path.abspath(os.path.join(stage, fn))
        if fn.endswith(".parquet") and full not in tracked:
            os.remove(full)
    return add_files
