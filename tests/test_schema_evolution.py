"""Schema evolution through the table layer (FIXTURES.md §3): add + widen
mid-replay, old snapshots stay readable, token dtype must NOT silently widen."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from etl_spark.datagen import BinlogSpec, generate_binlog
from etl_spark.operators.merge import merge_batch
from etl_spark.oracle import assert_state_equal, replay_oracle
from etl_spark.schema import TARGET_SCHEMA
from etl_spark.table import LakeTable, TableCommitError

V1 = BinlogSpec(n_events=2000, n_keys=200, seed=31)
V2 = BinlogSpec(n_events=2000, n_keys=200, seed=32, include_lang=True, lsn_offset=100_000)


@pytest.fixture(scope="module")
def feeds(spark):
    f1 = generate_binlog(spark, V1).drop("delivery_pos", "lsn_bucket").cache()
    f2 = generate_binlog(spark, V2).drop("delivery_pos", "lsn_bucket").cache()
    f1.count(), f2.count()
    return f1, f2


def _evolved_replay(spark, root, feeds):
    f1, f2 = feeds
    table = LakeTable.create_if_absent(spark, root, TARGET_SCHEMA)
    merge_batch(table, f1, epoch=0)
    table.update_schema(add_columns=[("lang", "string")], widen={"n_tok": "bigint"})
    merge_batch(table, f2, epoch=1)
    return table


def test_evolved_replay_matches_oracle(spark, tmp_table_dir, feeds):
    f1, f2 = feeds
    table = _evolved_replay(spark, tmp_table_dir, feeds)

    p1 = f1.toPandas().assign(lang=None)
    p2 = f2.toPandas()
    expected = replay_oracle(pd.concat([p1, p2], ignore_index=True), payload_cols=["tokens", "n_tok", "source", "lang"])

    got = table.read(include_hidden=True).toPandas()
    assert_state_equal(got, expected)
    # token element dtype must stay int32 (FIXTURES.md §3: no silent widen)
    elem = dict(table.read().dtypes)["tokens"]
    assert elem == "array<int>", f"tokens widened to {elem}"
    assert dict(table.read().dtypes)["n_tok"] == "bigint"


def test_pre_evolution_snapshot_still_readable(spark, tmp_table_dir, feeds):
    table = _evolved_replay(spark, tmp_table_dir, feeds)
    # snapshot 1 = after first merge, before evolution: v1 schema, no lang
    old = table.read(sid=1)
    assert "lang" not in old.columns
    assert dict(old.dtypes)["n_tok"] == "int"
    assert old.count() > 0


def test_schema_version_increments(spark, tmp_table_dir, feeds):
    table = _evolved_replay(spark, tmp_table_dir, feeds)
    versions = [s["schema_version"] for s in table.snapshots()]
    assert versions[0] == 0 and versions[-1] == 1


def test_duplicate_add_rejected(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, TARGET_SCHEMA)
    with pytest.raises(TableCommitError, match="already exists"):
        table.update_schema(add_columns=[("source", "string")])


def test_narrowing_rejected(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, TARGET_SCHEMA)
    table.update_schema(widen={"n_tok": "bigint"})
    with pytest.raises(TableCommitError, match="illegal widen"):
        table.update_schema(widen={"n_tok": "int"})
