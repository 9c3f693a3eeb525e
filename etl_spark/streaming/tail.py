"""Structured Streaming tail over the binlog directory -> exactly-once apply.

Spark-native restatement of the reference's extract stage: where the reference
pulls one archive per run over HTTP (``src/common/extract/DownloadService.scala:12-25``)
and walks the extracted directory (``src/worldclim/.../WorldClimHistoricalTemperatureETL.scala:55-75``),
the engine tails ``binlog/lsn_bucket=*/part-*.parquet`` with the file streaming
source: new files are discovered per trigger, ``maxFilesPerTrigger`` bounds the
microbatch, and the checkpoint's offset log replaces the reference's
workspace/restartability machinery (``src/common/Workspace.scala:14-30``).

Exactly-once: Spark's foreachBatch is at-least-once on crash replay — a batch
can be re-delivered with the same ``batch_id`` after a failure between sink
write and offset commit. ``merge_batch`` fences on ``checkpoint_epoch =
batch_id`` (per partition), so the replayed batch detects its fence records in
the table's commit ledger and no-ops. Combined: at-least-once delivery x
idempotent apply = exactly-once table state (BASELINE.md exactly-once gate).

At cluster scale the same code runs unchanged: the file source lists from
object storage, maxFilesPerTrigger controls batch sizing, and the fence/commit
path is one atomic metadata swap per batch regardless of executor count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.types import IntegerType, StructField, StructType

from etl_spark.operators.merge import MergeResult, merge_batch
from etl_spark.schema import BINLOG_SCHEMA, TARGET_SCHEMA
from etl_spark.table import LakeTable


@dataclass
class StreamReplayReport:
    batches: list[dict] = field(default_factory=list)

    @property
    def applied_batches(self) -> int:
        return sum(1 for b in self.batches if b["applied"])

    @property
    def rows_upserted(self) -> int:
        return sum(b["rows_upserted"] for b in self.batches)


def run_stream_replay(
    spark: SparkSession,
    binlog_dir: str,
    table_root: str,
    checkpoint_dir: str,
    feed_schema: StructType = BINLOG_SCHEMA,
    target_schema: StructType = TARGET_SCHEMA,
    max_files_per_trigger: int = 4,
    use_salted_dedup: bool = False,
    timeout_sec: float | None = None,
    merge_mode: str = "auto",
    auto_compact_mor: bool = False,
    max_mor_files: int = 16,
    layout: dict | None = None,
    feed_format: str = "parquet",
) -> StreamReplayReport:
    """Tail the binlog dir and apply every available microbatch exactly-once,
    then stop (Trigger.AvailableNow — drains what exists, leaves the
    checkpoint positioned for the next run). Kill/rerun resumes from the
    offset log; a replayed epoch no-ops on its fence.

    ``merge_mode='auto'`` lets quiet-feed microbatches take the merge-on-read
    path; with ``auto_compact_mor`` the tail also sheds the accumulated mask
    backlog in-line (``maintenance.maybe_compact_mor`` after each applied
    batch — a metadata-only no-op below the ``max_mor_files`` threshold).
    Compaction commits carry no fences, so a crash between a compaction and
    the next offset commit replays only the idempotent merge.

    ``layout`` applies only if the tail CREATES the table (e.g.
    ``{"type": "bucket", "n_buckets": 64}``); an existing table keeps its
    immutable creation-time layout.

    ``feed_format`` selects the wire shape (streaming/formats.py):
    ``"parquet"`` (canonical columns), ``"debezium-json"`` (one Debezium
    envelope per line), or ``"json"`` (one flat canonical-feed object per
    line). The JSON formats tail the same directory layout with the text
    file source and normalize via pure-Catalyst ``from_json`` projections —
    checkpoint resume, batching, and the fenced exactly-once apply are
    format-independent."""
    table = LakeTable.create_if_absent(spark, table_root, target_schema, layout=layout)
    report = StreamReplayReport()

    src_schema = StructType(list(feed_schema.fields) + [StructField("lsn_bucket", IntegerType(), True)])

    def apply_batch(batch_df, batch_id: int) -> None:
        res: MergeResult = merge_batch(
            table,
            batch_df.drop("lsn_bucket"),
            epoch=batch_id,
            use_salted_dedup=use_salted_dedup,
            merge_mode=merge_mode,
        )
        report.batches.append(
            {
                "epoch": batch_id,
                "applied": res.applied,
                "mode": res.mode,
                "rows_upserted": res.rows_upserted,
                "rows_deleted": res.rows_deleted,
                "snapshot_id": res.snapshot_id,
            }
        )
        if auto_compact_mor and res.applied:
            from etl_spark.table.maintenance import maybe_compact_mor

            maybe_compact_mor(table, max_mor_files=max_mor_files)

    if feed_format == "parquet":
        stream = (
            spark.readStream.schema(src_schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("basePath", binlog_dir)
            .parquet(binlog_dir)
        )
    elif feed_format in ("debezium-json", "json"):
        from etl_spark.streaming.formats import normalize_debezium, normalize_flat_json

        raw = (
            spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
            .option("basePath", binlog_dir)
            .text(binlog_dir)
        )
        normalize = normalize_debezium if feed_format == "debezium-json" else normalize_flat_json
        stream = normalize(raw, feed_schema=feed_schema)
    else:
        raise ValueError(f"unknown feed_format {feed_format!r} (parquet | debezium-json | json)")
    query = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout=timeout_sec)
    if query.isActive:
        query.stop()
    return report
