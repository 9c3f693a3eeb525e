"""Column rename by stable field id (reference P5,
``src/common/util/FeatureTypeExtensions.scala:10-29``): metadata-only,
old files stay readable under the new name, time travel keeps old names."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from etl_spark.operators.merge import merge_batch
from etl_spark.table import LakeTable
from etl_spark.table.table import TableCommitError


SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("value_cents", LongType(), True),
        StructField("source", StringType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, commit_lsn long, op_seq int, op string, value_cents long, source string"
    )


def test_rename_is_metadata_only_and_data_survives(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _batch(spark, [("a", 1, 0, "U", 100, "s1"), ("b", 2, 0, "U", 200, "s1")]), epoch=0)
    files_before = {f["path"] for f in table.files()}

    table.rename_column("value_cents", "amount_cents")

    # no data rewrite: identical file set
    assert {f["path"] for f in table.files()} == files_before
    # data written under the OLD name reads back under the new one
    got = {r["doc_id"]: r["amount_cents"] for r in table.read().collect()}
    assert got == {"a": 100, "b": 200}
    assert "value_cents" not in table.read().columns


def test_rename_mid_replay_merges_old_and_new_files(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _batch(spark, [("a", 1, 0, "U", 100, "s1"), ("b", 2, 0, "U", 200, "s1")]), epoch=0)
    table.rename_column("value_cents", "amount_cents")
    # epoch 1 arrives under the new name; touches only key 'b'
    e1 = spark.createDataFrame(
        [("b", 10, 0, "U", 999, "s2"), ("c", 11, 0, "U", 300, "s2")],
        "doc_id string, commit_lsn long, op_seq int, op string, amount_cents long, source string",
    )
    merge_batch(table, e1, epoch=1)
    got = {r["doc_id"]: r["amount_cents"] for r in table.read().collect()}
    assert got == {"a": 100, "b": 999, "c": 300}


def test_time_travel_keeps_pre_rename_names(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _batch(spark, [("a", 1, 0, "U", 100, "s1")]), epoch=0)
    sid = table.head_id()
    table.rename_column("value_cents", "amount_cents")
    assert "value_cents" in table.read(sid=sid).columns
    assert "amount_cents" in table.read().columns


def test_rename_composes_with_add_and_widen(spark, tmp_table_dir):
    schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("value_cents", IntegerType(), True),
        ]
    )
    table = LakeTable.create_if_absent(spark, tmp_table_dir, schema)
    b0 = spark.createDataFrame(
        [("a", 1, 0, "U", 7)], "doc_id string, commit_lsn long, op_seq int, op string, value_cents int"
    )
    merge_batch(table, b0, epoch=0)
    # renames apply first within one evolution commit; add/widen reference
    # the post-rename names
    table.update_schema(
        add_columns=[("lang", "string")],
        widen={"amount_cents": "bigint"},
        renames={"value_cents": "amount_cents"},
    )
    row = table.read().collect()[0]
    assert row["amount_cents"] == 7 and row["lang"] is None
    assert dict(table.read().dtypes)["amount_cents"] == "bigint"


def test_rename_rejects_conflicts(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    with pytest.raises(TableCommitError):
        table.rename_column("value_cents", "source")  # target exists
    with pytest.raises(TableCommitError):
        table.rename_column("nope", "x")  # unknown column
    with pytest.raises(TableCommitError):
        table.rename_column("doc_id", "key")  # merge key is pinned


def test_compact_after_rename_rewrites_under_current_names(spark, tmp_table_dir):
    from etl_spark.table.maintenance import compact

    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _batch(spark, [("a", 1, 0, "U", 100, "s1")]), epoch=0)
    table.rename_column("value_cents", "amount_cents")
    e1 = spark.createDataFrame(
        [("b", 2, 0, "U", 200, "s1")],
        "doc_id string, commit_lsn long, op_seq int, op string, amount_cents long, source string",
    )
    merge_batch(table, e1, epoch=1)
    assert compact(table, small_file_rows=100_000) is not None
    # post-compaction files carry ONLY the current name (no old/new column split)
    got = {r["doc_id"]: r["amount_cents"] for r in table.read().collect()}
    assert got == {"a": 100, "b": 200}
    raw = spark.read.parquet(*[f["path"] for f in table.files()])
    assert "value_cents" not in raw.columns


def test_rename_chain_reusing_a_name(spark, tmp_table_dir):
    """Name reuse across a chain: value_cents -> amount while source ->
    value_cents IN THE SAME evolution commit. The rename is a simultaneous
    mapping (dict order must not matter) and old files must resolve every
    column by field id — a sequential in-place rename would collide."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _batch(spark, [("a", 1, 0, "U", 777, "src0")]), epoch=0)
    table.update_schema(renames={"value_cents": "amount", "source": "value_cents"})
    row = table.read().collect()[0]
    assert row["amount"] == 777
    assert row["value_cents"] == "src0"  # the OLD source column, new name
    # same request in the other dict order behaves identically
    t2 = LakeTable.create_if_absent(spark, tmp_table_dir + "_2", SCHEMA)
    merge_batch(t2, _batch(spark, [("a", 1, 0, "U", 777, "src0")]), epoch=0)
    t2.update_schema(renames={"source": "value_cents", "value_cents": "amount"})
    row2 = t2.read().collect()[0]
    assert (row2["amount"], row2["value_cents"]) == (777, "src0")


def test_rename_rejects_colliding_targets(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    with pytest.raises(TableCommitError, match="duplicate rename targets"):
        table.update_schema(renames={"value_cents": "x", "source": "x"})


def test_commit_create_is_exclusive_and_head_recovers(spark, tmp_table_dir):
    """The commit-file create is the CAS: a snapshot id can be claimed once
    (no silent overwrite), and a crash between commit-file create and HEAD
    update is rolled forward by the next commit."""
    import os
    import shutil

    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    sid = table.commit(add_files=[], summary={"w": "a"})
    # simulate the crash: copy the commit file forward WITHOUT moving HEAD
    nxt = table._commit_path(sid + 1)
    shutil.copy(table._commit_path(sid), nxt)
    assert table.head_id() == sid  # HEAD lags the orphan commit
    # next commit recovers: rolls HEAD over the orphan, then claims sid+2
    new_sid = table.commit(add_files=[], summary={"w": "b"})
    assert new_sid == sid + 2
    assert table.head_id() == sid + 2
    assert os.path.exists(nxt)


def test_read_range_after_rename(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(
        table,
        _batch(spark, [("a", 1, 0, "U", 1, "s"), ("m", 2, 0, "U", 2, "s"), ("z", 3, 0, "U", 3, "s")]),
        epoch=0,
    )
    table.rename_column("value_cents", "amount_cents")
    rows = table.read_range(lo="a", hi="m").collect()
    assert {r["doc_id"]: r["amount_cents"] for r in rows} == {"a": 1, "m": 2}
