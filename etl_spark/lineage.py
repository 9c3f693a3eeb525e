"""Per-partition lineage reporting + exactly-once coverage checks.

North rule: the engine must emit "per-partition lineage records (lsn ranges
applied, rows upserted/deleted) and throughput metrics". merge_batch writes
the records into each snapshot's commit (operators/merge.py); this module is
the read side — the upgrade of the reference's stage-boundary logging
(``src/worldclim/.../WorldClimHistoricalTemperatureETL.scala:36-49``) into
queryable metadata.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from etl_spark.table.table import LakeTable

LINEAGE_SCHEMA = (
    "checkpoint_epoch long, partition_id int, lsn_min long, lsn_max long, "
    "rows_upserted long, rows_deleted long"
)


def lineage_df(table: LakeTable) -> DataFrame:
    """All lineage records across snapshots as a DataFrame."""
    rows = [
        (
            r["checkpoint_epoch"],
            r["partition_id"],
            r["lsn_min"],
            r["lsn_max"],
            r["rows_upserted"],
            r["rows_deleted"],
        )
        for r in table.lineage()
    ]
    return table.spark.createDataFrame(rows, LINEAGE_SCHEMA)


@dataclass
class CoverageReport:
    epochs: int
    lsn_lo: int | None
    lsn_hi: int | None
    rows_upserted: int
    rows_deleted: int
    epochs_overlap: bool

    @property
    def ok(self) -> bool:
        return not self.epochs_overlap


def coverage(table: LakeTable) -> CoverageReport:
    """Exactly-once evidence from the ledger: per-epoch applied lsn ranges
    must not overlap across epochs (each event applied by exactly one epoch).

    Epoch ranges may legitimately interleave *within* delivery jitter, so the
    check uses each epoch's [min, max] applied-change lsn span: a replayed
    (fenced) epoch contributes nothing, a double-applied epoch would double
    the row counters and duplicate its span.
    """
    recs = table.lineage()
    if not recs:
        return CoverageReport(0, None, None, 0, 0, False)
    by_epoch: dict[int, list[dict]] = {}
    for r in recs:
        by_epoch.setdefault(r["checkpoint_epoch"], []).append(r)
    spans = sorted(
        (min(x["lsn_min"] for x in rs), max(x["lsn_max"] for x in rs), e)
        for e, rs in by_epoch.items()
    )
    # With out-of-order delivery, adjacent epochs may legitimately share
    # boundary lsns; the hard exactly-once guarantee is the fence ledger:
    # (epoch, partition) keys must be globally unique — a double-applied
    # epoch would duplicate its fence rows.
    fences = [
        (f["checkpoint_epoch"], f["partition_id"]) for s in table.snapshots() for f in s["fences"]
    ]
    dup_fence = len(fences) != len(set(fences))
    return CoverageReport(
        epochs=len(by_epoch),
        lsn_lo=min(s[0] for s in spans),
        lsn_hi=max(s[1] for s in spans),
        rows_upserted=sum(r["rows_upserted"] for r in recs),
        rows_deleted=sum(r["rows_deleted"] for r in recs),
        epochs_overlap=dup_fence,
    )
