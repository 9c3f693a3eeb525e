"""Compaction, tombstone expiry, and lineage coverage tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_spark.datagen import BinlogSpec, generate_binlog
from etl_spark.lineage import coverage, lineage_df
from etl_spark.operators.merge import merge_batch
from etl_spark.oracle import assert_state_equal, replay_oracle
from etl_spark.schema import TARGET_SCHEMA
from etl_spark.table import LakeTable
from etl_spark.table.maintenance import compact, expire_tombstones


def _replayed_table(spark, tmp_path, epochs=4, n_events=4000, seed=7):
    spec = BinlogSpec(n_events=n_events, n_keys=400, seed=seed, tombstone_frac=0.15)
    feed = generate_binlog(spark, spec).drop("lsn_bucket").cache()
    table = LakeTable.create_if_absent(spark, str(tmp_path / "tbl"), TARGET_SCHEMA)
    span = feed.agg(F.max("delivery_pos")).collect()[0][0] // epochs + 1
    for e in range(epochs):
        batch = feed.where((F.col("delivery_pos") / span).cast("int") == e).drop("delivery_pos")
        # small target file size so commits leave several files to compact
        merge_batch(table, batch, epoch=e, target_rows_per_file=100)
    return table, feed


def test_compact_preserves_state(spark, tmp_path):
    table, feed = _replayed_table(spark, tmp_path)
    before = table.read(include_hidden=True).toPandas()
    n_files_before = len(table.files())
    sid = compact(table, small_file_rows=10_000)
    assert sid is not None
    assert len(table.files()) < n_files_before
    expected = replay_oracle(feed.drop("delivery_pos").toPandas())
    assert_state_equal(table.read(include_hidden=True).toPandas(), expected)
    assert len(before) == table.read(include_hidden=True).count()
    feed.unpersist()


def test_expire_tombstones_drops_only_below_watermark(spark, tmp_path):
    table, feed = _replayed_table(spark, tmp_path)
    hidden = table.read(include_hidden=True, include_deleted=True)
    n_tomb = hidden.where(F.col("_deleted")).count()
    assert n_tomb > 0
    hi_lsn = feed.agg(F.max("commit_lsn")).collect()[0][0]
    # watermark at the end: every tombstone expirable
    sid = expire_tombstones(table, low_watermark_lsn=hi_lsn)
    assert sid is not None
    after = table.read(include_hidden=True, include_deleted=True)
    assert after.where(F.col("_deleted")).count() == 0
    # live state unchanged
    expected = replay_oracle(feed.drop("delivery_pos").toPandas())
    assert_state_equal(table.read(include_hidden=True).toPandas(), expected)
    feed.unpersist()


def test_expire_tombstones_respects_watermark(spark, tmp_path):
    table, feed = _replayed_table(spark, tmp_path, seed=11)
    tombs = (
        table.read(include_hidden=True, include_deleted=True)
        .where(F.col("_deleted"))
        .select("_commit_lsn")
        .toPandas()["_commit_lsn"]
    )
    assert len(tombs) > 1
    mid = int(tombs.median())
    expire_tombstones(table, low_watermark_lsn=mid)
    remaining = (
        table.read(include_hidden=True, include_deleted=True)
        .where(F.col("_deleted"))
        .select("_commit_lsn")
        .toPandas()["_commit_lsn"]
    )
    assert (remaining > mid).all()
    assert len(remaining) == (tombs > mid).sum()
    feed.unpersist()


def test_expire_snapshots_keeps_head_and_ledger(spark, tmp_path):
    import os

    import pytest

    table, feed = _replayed_table(spark, tmp_path, seed=13)
    head_before = table.read(include_hidden=True).toPandas()
    old_files = [f["path"] for f in table.files(1)]
    n_fences = len(table.fences())
    table.expire_snapshots(keep_last=1)
    # head snapshot still fully readable and identical
    expected = replay_oracle(feed.drop("delivery_pos").toPandas())
    assert_state_equal(table.read(include_hidden=True).toPandas(), expected)
    assert len(head_before) == table.read(include_hidden=True).count()
    # data files referenced only by expired snapshots are gone...
    live = {f["path"] for f in table.files()}
    assert any(not os.path.exists(p) for p in old_files if p not in live)
    # ...but the fence/lineage ledger survives (metadata is never dropped)
    assert len(table.fences()) == n_fences
    assert table.is_fenced(0)
    # time travel to an expired snapshot now fails at read time
    with pytest.raises(Exception):
        table.read(sid=1).collect()
    feed.unpersist()


def test_lineage_coverage_and_fence_uniqueness(spark, tmp_path):
    table, feed = _replayed_table(spark, tmp_path)
    # replaying an already-fenced epoch must not add lineage
    n_recs = len(table.lineage())
    merge_batch(table, feed.drop("delivery_pos"), epoch=0)
    assert len(table.lineage()) == n_recs
    rep = coverage(table)
    assert rep.ok
    assert rep.epochs == 4
    # exact reconciliation: each epoch's rows_upserted must equal that
    # epoch's distinct non-delete LWW winners applied on top of prior state.
    # For epoch 0 on an empty table that is simply its winner count — guards
    # against metric double-counting (observe executed by >1 job)
    span = feed.agg(F.max("delivery_pos")).collect()[0][0] // 4 + 1
    e0 = feed.where((F.col("delivery_pos") / span).cast("int") == 0)
    from etl_spark.operators.dedup import lww_dedup

    exp_ups0 = lww_dedup(e0.drop("delivery_pos")).where(F.col("op") != "D").count()
    got_ups0 = sum(
        r["rows_upserted"] for r in table.lineage() if r["checkpoint_epoch"] == 0
    )
    assert got_ups0 == exp_ups0
    lo = feed.agg(F.min("commit_lsn")).collect()[0][0]
    hi = feed.agg(F.max("commit_lsn")).collect()[0][0]
    assert rep.lsn_lo >= lo and rep.lsn_hi <= hi
    ldf = lineage_df(table)
    assert ldf.count() == n_recs
    assert set(ldf.columns) == {
        "checkpoint_epoch", "partition_id", "lsn_min", "lsn_max", "rows_upserted", "rows_deleted",
    }
    feed.unpersist()
