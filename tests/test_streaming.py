"""Streaming tail: checkpoint resume + crash-after-commit fence (SURVEY.md §5 item 3)."""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pytest

from etl_spark.datagen import BinlogSpec, write_binlog
from etl_spark.operators.merge import merge_batch
from etl_spark.oracle import assert_state_equal, replay_oracle
from etl_spark.schema import TARGET_SCHEMA
from etl_spark.streaming.tail import run_stream_replay
from etl_spark.table import LakeTable

SPEC = BinlogSpec(n_events=4000, n_keys=250, seed=21, n_buckets=8)


@pytest.fixture(scope="module")
def binlog_dir(spark):
    d = tempfile.mkdtemp(prefix="binlog_")
    write_binlog(spark, SPEC, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def expected(binlog_dir):
    ev = duckdb.sql(
        f"SELECT commit_lsn, op_seq, op, doc_id, tokens, n_tok, source FROM '{binlog_dir}/lsn_bucket=*/*.parquet'"
    ).df()
    return replay_oracle(ev)


def _final(table):
    return table.read(include_hidden=True).toPandas()


def test_stream_replay_matches_oracle(spark, binlog_dir, expected, tmp_table_dir):
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        report = run_stream_replay(spark, binlog_dir, tmp_table_dir, ckpt, max_files_per_trigger=3)
        assert report.applied_batches >= 2, "expected multiple microbatches"
        table = LakeTable(spark, tmp_table_dir)
        assert_state_equal(_final(table), expected)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_kill_and_resume(spark, binlog_dir, expected, tmp_table_dir):
    """Kill the query mid-replay (after a batch committed to the table but
    before Spark committed the offsets), restart, assert exactly-once state."""
    ckpt = tempfile.mkdtemp(prefix="ckpt_")

    class Boom(Exception):
        pass

    try:
        # crash run: wrap merge to raise AFTER the second batch committed
        from etl_spark.streaming import tail as tail_mod

        real_merge = tail_mod.merge_batch
        calls = {"n": 0}

        def crashing_merge(*args, **kwargs):
            res = real_merge(*args, **kwargs)
            calls["n"] += 1
            if calls["n"] == 2:
                raise Boom("simulated crash after table commit, before offset commit")
            return res

        tail_mod.merge_batch = crashing_merge
        try:
            with pytest.raises(Exception):
                run_stream_replay(spark, binlog_dir, tmp_table_dir, ckpt, max_files_per_trigger=2)
        finally:
            tail_mod.merge_batch = real_merge

        table = LakeTable(spark, tmp_table_dir)
        epochs_before = sorted(table.fenced_epochs())
        assert len(epochs_before) >= 2

        # resume: Spark re-delivers the batch whose offsets never committed;
        # the fence must absorb it (no duplicate apply), then drain the rest.
        report = run_stream_replay(spark, binlog_dir, tmp_table_dir, ckpt, max_files_per_trigger=2)
        replayed = [b for b in report.batches if not b["applied"]]
        assert len(replayed) >= 1, "expected the crashed epoch to be re-delivered and fenced"
        assert_state_equal(_final(table), expected)

        # third run: nothing new to process
        report3 = run_stream_replay(spark, binlog_dir, tmp_table_dir, ckpt, max_files_per_trigger=2)
        assert report3.applied_batches == 0
        assert_state_equal(_final(table), expected)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_sees_late_files(spark, expected, tmp_table_dir):
    """New files appearing after a drain are picked up by the next run
    (the incremental-ingest loop: reference ran per-month pulls,
    Application.scala:29)."""
    d = tempfile.mkdtemp(prefix="binlog_late_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        spec_a = BinlogSpec(n_events=1000, n_keys=100, seed=5, n_buckets=2)
        write_binlog(spark, spec_a, d)
        run_stream_replay(spark, d, tmp_table_dir, ckpt)
        table = LakeTable(spark, tmp_table_dir)
        c1 = table.read().count()
        # second feed segment: later lsn range, same keyspace
        spec_b = BinlogSpec(n_events=1000, n_keys=100, seed=6, n_buckets=2, lsn_offset=10_000)
        import glob

        tmp2 = tempfile.mkdtemp(prefix="binlog_b_")
        write_binlog(spark, spec_b, tmp2)
        for src in glob.glob(f"{tmp2}/lsn_bucket=*"):
            bucket = os.path.basename(src)
            dst = os.path.join(d, f"{bucket.split('=')[0]}={int(bucket.split('=')[1]) + 100}")
            shutil.copytree(src, dst)
        report = run_stream_replay(spark, d, tmp_table_dir, ckpt)
        assert report.applied_batches >= 1
        combined = duckdb.sql(
            f"SELECT commit_lsn, op_seq, op, doc_id, tokens, n_tok, source FROM '{d}/lsn_bucket=*/*.parquet'"
        ).df()
        assert c1 > 0
        assert_state_equal(_final(table), replay_oracle(combined))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_replay_mor_with_inline_compaction(spark, tmp_path):
    """The tail in forced-MoR mode with in-line debt compaction: every
    microbatch writes winners-only, the backlog is shed as it crosses the
    threshold, and the final state equals the batch replay's."""
    import pyspark.sql.functions as F

    from etl_spark.datagen import BinlogSpec, write_binlog
    from etl_spark.operators.dedup import lww_dedup
    from etl_spark.streaming.tail import run_stream_replay

    binlog = str(tmp_path / "binlog")
    write_binlog(spark, BinlogSpec(n_events=4000, n_keys=300, seed=17), binlog)
    report = run_stream_replay(
        spark,
        binlog,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        merge_mode="mor",
        auto_compact_mor=True,
        max_mor_files=3,
    )
    assert report.applied_batches > 1
    assert any(b["mode"] == "mor" for b in report.batches)

    from etl_spark.table import LakeTable

    table = LakeTable(spark, str(tmp_path / "tbl"))
    # backlog stayed below the threshold closure
    assert sum(1 for f in table.files() if f.get("mor")) <= 3
    feed = spark.read.parquet(binlog).drop("delivery_pos", "lsn_bucket")
    expected = lww_dedup(feed).where(F.col("op") != "D").select("doc_id", "tokens", "n_tok", "source")
    got = table.read().select("doc_id", "tokens", "n_tok", "source")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0 and expected.exceptAll(got).count() == 0
