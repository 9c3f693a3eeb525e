"""Key-range pruned reads and snapshot diff (table/table.py read side)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_spark.datagen import BinlogSpec, generate_binlog
from etl_spark.operators.merge import merge_batch
from etl_spark.schema import TARGET_SCHEMA
from etl_spark.table import LakeTable


def _table(spark, tmp_path, epochs=2, n_events=3000, n_keys=300, seed=53):
    feed = generate_binlog(spark, BinlogSpec(n_events=n_events, n_keys=n_keys, seed=seed)).drop(
        "lsn_bucket"
    ).cache()
    table = LakeTable.create_if_absent(spark, str(tmp_path / "t"), TARGET_SCHEMA)
    hi = feed.agg(F.max("delivery_pos")).collect()[0][0]
    span = hi // epochs + 1
    for e in range(epochs):
        merge_batch(
            table,
            feed.where((F.col("delivery_pos") / span).cast("int") == e).drop("delivery_pos"),
            epoch=e,
            target_rows_per_file=50,  # force several files -> real pruning
        )
    return table, feed


def test_read_range_equals_filtered_full_read(spark, tmp_path):
    table, feed = _table(spark, tmp_path)
    lo, hi = "doc_00000010", "doc_00000050"
    full = {
        r["doc_id"]: r["n_tok"]
        for r in table.read().where((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)).collect()
    }
    pruned = {r["doc_id"]: r["n_tok"] for r in table.read_range(lo, hi).collect()}
    assert pruned == full and len(pruned) > 0
    feed.unpersist()


def test_read_range_prunes_files(spark, tmp_path):
    table, feed = _table(spark, tmp_path)
    n_files = len(table.files())
    assert n_files > 4
    # a narrow range must scan fewer files than the table holds
    snap = table.snapshot()
    lo, hi = "doc_00000010", "doc_00000020"
    touched = [
        f
        for f in snap["files"]
        if f["min_key"] is None or not (f["min_key"] > hi or f["max_key"] < lo)
    ]
    assert len(touched) < n_files
    feed.unpersist()


def test_diff_reports_only_changed_keys(spark, tmp_path):
    table, feed = _table(spark, tmp_path, epochs=2)
    d = table.diff(1, 2)
    got = {r["doc_id"]: r["change_op"] for r in d.collect()}
    # expected: keys whose winning (lsn, seq) differs between the halves
    s1 = {
        r["doc_id"]: (r["_commit_lsn"], r["_op_seq"])
        for r in table.read(sid=1, include_hidden=True, include_deleted=True).collect()
    }
    s2 = {
        r["doc_id"]: (r["_commit_lsn"], r["_op_seq"], r["_deleted"])
        for r in table.read(sid=2, include_hidden=True, include_deleted=True).collect()
    }
    expected = {}
    for k, (lsn, seq, dead) in s2.items():
        if k not in s1 or s1[k] != (lsn, seq):
            expected[k] = "D" if dead else "U"
    assert got == expected and len(got) > 0
    feed.unpersist()


def test_diff_identity_is_empty(spark, tmp_path):
    table, feed = _table(spark, tmp_path, epochs=1)
    assert table.diff(1, 1).count() == 0
    feed.unpersist()
