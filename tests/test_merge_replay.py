"""Replay-equality golden tests (SURVEY.md §5 item 1): batched merge replay of
the synthetic binlog must reproduce the pandas oracle's final state under
per-row token-array equality, including out-of-order delivery across batch
boundaries, tombstones, duplicate deliveries, and forced double-apply."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from etl_spark.datagen import BinlogSpec, generate_binlog
from etl_spark.operators.merge import merge_batch
from etl_spark.oracle import assert_state_equal, replay_oracle
from etl_spark.schema import TARGET_SCHEMA
from etl_spark.table import LakeTable

SPEC = BinlogSpec(n_events=6000, n_keys=400, seed=13, skew=2.2, ooo_frac=0.15, dup_frac=0.08)


def _replay(spark, root, feed, n_batches, use_salted=False):
    """Apply the feed in delivery order as n_batches epochs."""
    table = LakeTable.create_if_absent(spark, root, TARGET_SCHEMA)
    span = feed.agg(F.max("delivery_pos")).collect()[0][0] + 1
    per = span // n_batches + 1
    for epoch in range(n_batches):
        batch = feed.where(
            (F.col("delivery_pos") >= epoch * per) & (F.col("delivery_pos") < (epoch + 1) * per)
        ).drop("delivery_pos", "lsn_bucket")
        merge_batch(table, batch, epoch=epoch, use_salted_dedup=use_salted)
    return table


@pytest.fixture(scope="module")
def feed(spark):
    df = generate_binlog(spark, SPEC)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def expected(spark, feed):
    return replay_oracle(feed.drop("delivery_pos", "lsn_bucket").toPandas())


def _final_state(table):
    return (
        table.read(include_hidden=True)
        .withColumnRenamed("_commit_lsn", "lsn")
        .toPandas()
        .rename(columns={"lsn": "_commit_lsn"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_single_batch_replay_matches_oracle(spark, tmp_table_dir, feed, expected):
    table = _replay(spark, tmp_table_dir, feed, n_batches=1)
    assert_state_equal(_final_state(table), expected)


def test_multi_batch_out_of_order_replay_matches_oracle(spark, tmp_table_dir, feed, expected):
    table = _replay(spark, tmp_table_dir, feed, n_batches=5)
    assert_state_equal(_final_state(table), expected)
    # lineage covers the full feed
    lin = table.lineage()
    assert len(lin) > 0
    lsn_max = max(r["lsn_max"] for r in lin)
    assert lsn_max == feed.agg(F.max("commit_lsn")).collect()[0][0]


def test_salted_replay_matches_oracle(spark, tmp_table_dir, feed, expected):
    table = _replay(spark, tmp_table_dir, feed, n_batches=3, use_salted=True)
    assert_state_equal(_final_state(table), expected)


def test_double_apply_is_noop(spark, tmp_table_dir, feed, expected):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, TARGET_SCHEMA)
    batch = feed.drop("delivery_pos", "lsn_bucket")
    r1 = merge_batch(table, batch, epoch=0)
    assert r1.applied
    sid = table.head_id()
    r2 = merge_batch(table, batch, epoch=0)  # exact replay of the same epoch
    assert not r2.applied
    assert table.head_id() == sid, "replayed epoch must not create a snapshot"
    assert_state_equal(_final_state(table), expected)


def test_copy_on_write_touches_subset(spark, tmp_table_dir, feed):
    """A tiny second batch must not rewrite the whole table."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, TARGET_SCHEMA)
    first = feed.drop("delivery_pos", "lsn_bucket")
    merge_batch(table, first, epoch=0, target_rows_per_file=50)
    n_files_before = len(table.files())
    assert n_files_before > 1
    one_key = first.where(F.col("op") != "D").limit(1).collect()[0]["doc_id"]
    tiny = first.where(F.col("doc_id") == one_key).limit(1).withColumn(
        "commit_lsn", F.lit(10_000_000).cast("long")
    )
    res = merge_batch(table, tiny, epoch=1, target_rows_per_file=50)
    assert res.applied
    assert res.files_rewritten < n_files_before, (
        f"tiny batch rewrote all {n_files_before} files"
    )


def test_snapshot_time_travel(spark, tmp_table_dir, feed):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, TARGET_SCHEMA)
    batch = feed.drop("delivery_pos", "lsn_bucket")
    half = batch.where(F.col("commit_lsn") <= 1500)
    merge_batch(table, half, epoch=0)
    c1 = table.read().count()
    merge_batch(table, batch.where(F.col("commit_lsn") > 1500), epoch=1)
    assert table.read(sid=table.head_id() - 1).count() == c1


def test_oracle_reconciles_lineage_counts(spark, tmp_table_dir, feed, expected):
    table = _replay(spark, tmp_table_dir, feed, n_batches=4)
    live = table.read().count()
    assert live == len(expected)
