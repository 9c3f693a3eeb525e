"""Streaming-native stateful LWW dedup tests (streaming/stateful.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_spark.datagen import BinlogSpec, write_binlog
from etl_spark.schema import BINLOG_SCHEMA
from etl_spark.streaming.stateful import stateful_lww_changelog


def test_stateful_changelog_final_winners_match_oracle(spark, tmp_path):
    """Drain a bucketed binlog through applyInPandasWithState; the LAST
    emitted changelog row per key must equal the global LWW winner."""
    binlog = str(tmp_path / "binlog")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spec = BinlogSpec(n_events=2000, n_keys=150, seed=31, tombstone_frac=0.1)
    write_binlog(spark, spec, binlog)

    from pyspark.sql.types import IntegerType, StructField, StructType

    src_schema = StructType(list(BINLOG_SCHEMA.fields) + [StructField("lsn_bucket", IntegerType(), True)])
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(binlog)
        .drop("lsn_bucket")
    )
    changelog = stateful_lww_changelog(stream)
    q = (
        changelog.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.read.parquet(out_dir)
    # last emission per key = winner with max (commit_lsn, op_seq)
    final = (
        emitted.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct("commit_lsn", "op_seq", "op", "tokens", "n_tok", "source"),
                F.struct("commit_lsn", "op_seq"),
            ).alias("w")
        )
        .select("doc_id", "w.*")
    )
    feed = spark.read.schema(src_schema).parquet(binlog).drop("lsn_bucket")
    expected = (
        feed.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct("commit_lsn", "op_seq", "op", "tokens", "n_tok", "source"),
                F.struct("commit_lsn", "op_seq"),
            ).alias("w")
        )
        .select("doc_id", "w.*")
    )
    got = {r["doc_id"]: (r["commit_lsn"], r["op_seq"], r["op"], r["tokens"]) for r in final.collect()}
    exp = {r["doc_id"]: (r["commit_lsn"], r["op_seq"], r["op"], r["tokens"]) for r in expected.collect()}
    assert got == exp


def test_stateful_changelog_emits_only_changes(spark, tmp_path):
    """A key whose later events are stale (lower lsn) must not re-emit."""
    import pandas as pd

    from etl_spark.streaming.stateful import _lww_state_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    b1 = pd.DataFrame(
        {
            "commit_lsn": [10],
            "op_seq": [0],
            "op": ["U"],
            "tokens": [[1, 2]],
            "n_tok": [2],
            "source": ["web"],
        }
    )
    out1 = list(_lww_state_fn(("k",), [b1], st))
    assert len(out1) == 1 and out1[0]["commit_lsn"][0] == 10
    # stale batch: lower lsn -> no emission, state unchanged
    b2 = b1.assign(commit_lsn=[5])
    out2 = list(_lww_state_fn(("k",), [b2], st))
    assert out2 == []
    assert st.get[0] == 10
