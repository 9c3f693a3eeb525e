"""Round-4 regression pins (VERDICT/ADVICE round 3).

The headline trap: a copy-on-write merge that REMOVES a mor-flagged winners
file used to drop the mask while the masked stale copies stayed alive in
files the batch never touched — duplicate keys on the next read (ADVICE
high, operators/merge.py). The fix inherits the mor flag onto the CoW
output (the compact rule) whenever a removed winners file overlaps an
untouched live file.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_spark.operators.merge import merge_batch
from etl_spark.table import LakeTable
from etl_spark.table.maintenance import compact_mor

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


def _bulk(spark, n, lsn0=0):
    return spark.range(n).select(
        F.format_string("k%05d", F.col("id")).alias("doc_id"),
        (F.col("id") + lsn0).alias("commit_lsn"),
        F.lit(0).alias("op_seq"),
        F.lit("U").alias("op"),
        (F.col("id") * 10).alias("value_cents"),
        F.lit("s").alias("source"),
    )


def _state(table):
    return {r["doc_id"]: r["value_cents"] for r in table.read().collect()}


def test_mor_then_cow_interleave_does_not_resurrect(spark, tmp_table_dir):
    """ADVICE-high reproduction: bulk load; MoR batch updates keys at both
    ends of the keyspace (winners file spans it); a CoW batch then touches a
    middle range — the CoW rewrite removes the winners file. The stale
    end-key rows in untouched files must STAY masked."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _bulk(spark, 2000), epoch=0)  # CoW bulk, many files
    assert len(table.files()) > 2

    # winners file spans k00100..k01900 — overlaps (almost) every data file
    r1 = merge_batch(
        table,
        _batch(spark, [("k00100", 10_000, 0, "U", 1, "m"), ("k01900", 10_000, 0, "U", 2, "m")]),
        epoch=1,
        merge_mode="mor",
    )
    assert r1.mode == "mor"

    # CoW batch on a middle key: its planning touches the winners file
    # (range spans the keyspace) and removes it
    r2 = merge_batch(
        table,
        _batch(spark, [("k01000", 10_001, 0, "U", 3, "c")]),
        epoch=2,
        merge_mode="cow",
    )
    assert r2.mode == "cow"

    df = table.read()
    # exactly one row per key — the stale k00100/k01900 copies in untouched
    # files must not resurrect
    dupes = df.groupBy("doc_id").count().where(F.col("count") > 1).collect()
    assert dupes == [], f"duplicate keys after mor->cow interleave: {dupes}"
    st = _state(table)
    assert st["k00100"] == 1
    assert st["k01900"] == 2
    assert st["k01000"] == 3
    assert len(st) == 2000

    # compaction sheds the inherited debt and the state is unchanged
    compact_mor(table)
    assert not any(f.get("mor") for f in table.files())
    assert _state(table) == st


def test_auto_mode_mor_microbatch_then_cow_bulk(spark, tmp_table_dir):
    """The default-config path to the same trap: merge_mode='auto' picks MoR
    for a tiny microbatch against a big table, then CoW for a bulk batch."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _bulk(spark, 2000), epoch=0)
    r1 = merge_batch(
        table,
        _batch(spark, [("k00050", 9_000, 0, "U", 11, "m"), ("k01950", 9_000, 0, "U", 12, "m")]),
        epoch=1,
        merge_mode="auto",
    )
    assert r1.mode == "mor"
    # bulk update of the middle half — auto goes CoW
    r2 = merge_batch(table, _bulk(spark, 2000, lsn0=20_000), epoch=2, merge_mode="auto")
    assert r2.mode == "cow"
    df = table.read()
    assert df.count() == 2000
    assert df.groupBy("doc_id").count().where(F.col("count") > 1).isEmpty()
    st = _state(table)
    # the bulk batch (lsn 20_000+) beats both the original load and the mor updates
    assert st["k00050"] == 50 * 10
    assert st["k01950"] == 1950 * 10


def test_cow_removing_last_mor_file_sheds_flag_when_nothing_overlaps(spark, tmp_table_dir):
    """When the CoW rewrite covers every file overlapping the removed
    winners file, no masked copy survives and the output must NOT carry the
    mor flag (no needless mask debt)."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    # single data file (small bulk -> one range partition per core, but all
    # keys in a narrow range so one file may still split; use tiny n)
    merge_batch(table, _batch(spark, [("a", 1, 0, "U", 1, "s"), ("b", 1, 0, "U", 2, "s")]), epoch=0)
    merge_batch(table, _batch(spark, [("a", 2, 0, "U", 9, "s")]), epoch=1, merge_mode="mor")
    assert any(f.get("mor") for f in table.files())
    # CoW batch touching BOTH keys: planning touches every live file
    # (winners + all overlapping data files), nothing is left untouched
    # to overlap the removed winners file -> flag shed
    merge_batch(
        table,
        _batch(spark, [("a", 3, 0, "U", 7, "s"), ("b", 3, 0, "U", 8, "s")]),
        epoch=2,
        merge_mode="cow",
    )
    assert not any(f.get("mor") for f in table.files())
    assert _state(table) == {"a": 7, "b": 8}
