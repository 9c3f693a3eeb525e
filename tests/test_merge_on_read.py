"""Merge-on-read: batch-sized winners files whose keys double as equality-
delete masks (table.py docstring). The invariants under test:

- read state after any replay is IDENTICAL to copy-on-write's;
- a MoR epoch rewrites nothing (write amplification = batch size);
- compaction/expiry rewrite points apply + shed masks correctly, including
  the resurrection traps (compacting a mor file away must not unmask its
  victims; expiring a mor tombstone must kill the victims in the same
  commit)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_spark.operators.merge import merge_batch
from etl_spark.table import LakeTable
from etl_spark.table.maintenance import compact, expire_tombstones, rewrite_table

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


def _state(table):
    return {r["doc_id"]: (r["value_cents"], r["source"]) for r in table.read().collect()}


def _bulk(spark, n, lsn0=0):
    return spark.range(n).select(
        F.format_string("k%05d", F.col("id")).alias("doc_id"),
        (F.col("id") + lsn0).alias("commit_lsn"),
        F.lit(0).alias("op_seq"),
        F.lit("U").alias("op"),
        (F.col("id") * 10).alias("value_cents"),
        F.lit("s").alias("source"),
    )


EPOCH_BATCHES = [
    # (rows) — includes out-of-order cross-batch events, tombstones, re-insert
    [("a", 10, 0, "U", 1, "s"), ("b", 11, 0, "U", 2, "s"), ("c", 12, 0, "U", 3, "s")],
    [("a", 20, 0, "U", 4, "s"), ("d", 21, 0, "U", 5, "s"), ("b", 5, 0, "U", 99, "s")],  # stale b
    [("c", 30, 0, "D", None, None), ("e", 31, 0, "U", 6, "s")],  # tombstone c
    [("c", 25, 0, "U", 77, "s"), ("f", 40, 0, "U", 7, "s")],  # stale c vs tombstone
    [("c", 50, 0, "U", 8, "s"), ("a", 15, 0, "U", 55, "s")],  # re-insert c, stale a
]
FINAL = {"a": (4, "s"), "b": (2, "s"), "d": (5, "s"), "e": (6, "s"), "f": (7, "s"), "c": (8, "s")}


@pytest.mark.parametrize("mode", ["mor", "auto"])
def test_mor_replay_matches_cow_final_state(spark, tmp_table_dir, mode):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    n_files = []
    for e, rows in enumerate(EPOCH_BATCHES):
        merge_batch(table, _batch(spark, rows), epoch=e, merge_mode=mode)
        n_files.append(len(table.files()))
    assert _state(table) == FINAL
    # idempotent re-apply still no-ops
    r = merge_batch(table, _batch(spark, EPOCH_BATCHES[2]), epoch=2, merge_mode=mode)
    assert not r.applied
    assert _state(table) == FINAL


def test_mor_epoch_rewrites_nothing(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _bulk(spark, 2000), epoch=0)
    paths_before = {f["path"] for f in table.files()}
    r = merge_batch(
        table, _batch(spark, [("k00042", 99999, 0, "U", 1, "s")]), epoch=1, merge_mode="mor"
    )
    assert r.applied and r.mode == "mor" and r.files_rewritten == 0
    # every pre-existing file survives untouched; only winners files added
    assert paths_before <= {f["path"] for f in table.files()}
    added = [f for f in table.files() if f["path"] not in paths_before]
    assert added and all(f.get("mor") for f in added)
    assert sum(f["rows"] for f in added) == 1  # batch-sized, not touched-sized
    # masked read: exactly one current version per key
    assert table.read().count() == 2000
    assert table.read().where("doc_id = 'k00042'").collect()[0]["value_cents"] == 1


def test_auto_mode_picks_mor_for_microbatch_and_cow_for_bulk(spark, tmp_table_dir):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    r0 = merge_batch(table, _bulk(spark, 2000), epoch=0)
    assert r0.mode == "cow"  # initial load
    r1 = merge_batch(
        table, _batch(spark, [("k00001", 99999, 0, "U", 1, "s")]), epoch=1, merge_mode="auto"
    )
    assert r1.mode == "mor"  # 1-row batch vs ~500-row touched file
    r2 = merge_batch(table, _bulk(spark, 2000, lsn0=100_000), epoch=2, merge_mode="auto")
    assert r2.mode == "cow"  # bulk re-touch: batch ~ touched slice
    assert table.read().count() == 2000


def test_mor_stale_update_against_masked_tombstone(spark, tmp_table_dir):
    """Cross-batch out-of-order under MoR: a stale update arriving AFTER a
    MoR tombstone must lose to the tombstone row (which lives in the
    winners file, masking the original row)."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _batch(spark, [("x", 10, 0, "U", 1, "s"), ("y", 11, 0, "U", 2, "s")]), epoch=0)
    merge_batch(table, _batch(spark, [("x", 30, 0, "D", None, None)]), epoch=1, merge_mode="mor")
    assert _state(table) == {"y": (2, "s")}
    merge_batch(table, _batch(spark, [("x", 20, 0, "U", 55, "s")]), epoch=2, merge_mode="mor")
    assert _state(table) == {"y": (2, "s")}  # stale x never resurrects
    merge_batch(table, _batch(spark, [("x", 40, 0, "U", 66, "s")]), epoch=3, merge_mode="mor")
    assert _state(table) == {"y": (2, "s"), "x": (66, "s")}


def test_compact_does_not_unmask_victims(spark, tmp_table_dir):
    """Resurrection trap 1: compacting a mor winners file into a new
    (higher-seq) file must keep masking the old copies of its keys — the
    output inherits the mor flag unless the compaction covered every file."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    # multi-file layout needed so files exist outside the mor envelope
    merge_batch(table, _bulk(spark, 2000), epoch=0, target_rows_per_file=500)
    for e in range(1, 4):
        merge_batch(
            table,
            _batch(spark, [(f"k{e:05d}", 100_000 + e, 0, "U", -e, "s")]),
            epoch=e,
            merge_mode="mor",
        )
    before = _state(table)
    # compact only the small winners files (the bulk files are large)
    sid = compact(table, small_file_rows=100, target_rows_per_file=1000)
    assert sid is not None
    assert any(f.get("mor") for f in table.files())  # flag retained
    assert _state(table) == before
    # full rewrite sheds every mask
    rewrite_table(table, target_rows_per_file=1000)
    assert not any(f.get("mor") for f in table.files())
    assert _state(table) == before


def test_compact_small_old_file_under_newer_mor_versions(spark, tmp_table_dir):
    """Resurrection trap 2 (the non-range-closed subset): compacting an OLD
    small file whose keys have newer versions in a mor file must drop the
    superseded copies (snapshot-wide masks), not re-emit them above the
    mask's reach."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _batch(spark, [("a", 1, 0, "U", 1, "s"), ("b", 2, 0, "U", 2, "s")]), epoch=0)
    merge_batch(table, _bulk(spark, 3000), epoch=1)  # big files so compact skips them
    merge_batch(table, _batch(spark, [("a", 100, 0, "U", 11, "s")]), epoch=2, merge_mode="mor")
    before = _state(table)
    assert before["a"] == (11, "s")
    # compacts the epoch-0 small files AND the mor winners file together
    sid = compact(table, small_file_rows=100, target_rows_per_file=1000)
    assert sid is not None
    after = _state(table)
    assert after == before  # 'a' is still 11 — v1 did not resurrect
    assert table.read().where("doc_id = 'a'").count() == 1


def test_compact_mor_sheds_all_masks_without_full_rewrite(spark, tmp_table_dir):
    """Targeted debt compaction: rewrites only the winners files + their
    range-overlapping victims, output carries no mor flag, state unchanged,
    and files outside the closure are untouched."""
    from etl_spark.table.maintenance import compact_mor, maybe_compact_mor

    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    # multi-file layout needed so files exist outside the mor envelope
    merge_batch(table, _bulk(spark, 2000), epoch=0, target_rows_per_file=500)
    for e in range(1, 4):
        merge_batch(
            table,
            _batch(spark, [(f"k0000{e}", 100_000 + e, 0, "U", -e, "m")]),
            epoch=e,
            merge_mode="mor",
        )
    before = _state(table)
    untouched_paths = {
        f["path"] for f in table.files() if not f.get("mor") and f["min_key"] > "k00005"
    }
    assert untouched_paths, "test needs files outside the mor key envelope"
    # below thresholds: policy no-ops
    assert maybe_compact_mor(table, max_mor_files=16, max_mor_rows=10_000_000) is None
    # above: sheds every mask
    sid = maybe_compact_mor(table, max_mor_files=2, target_rows_per_file=1000)
    assert sid is not None
    assert not any(f.get("mor") for f in table.files())
    assert untouched_paths <= {f["path"] for f in table.files()}  # closure was targeted
    assert _state(table) == before
    assert compact_mor(table) is None  # nothing left to do


def test_expire_tombstones_kills_victims_with_the_mask(spark, tmp_table_dir):
    """Resurrection trap 3: expiring a mor tombstone removes the mask over
    the key's original row — the victim file must be rewritten in the SAME
    commit, else the deleted key resurrects."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _bulk(spark, 2000), epoch=0)
    merge_batch(
        table, _batch(spark, [("k00042", 99999, 0, "D", None, None)]), epoch=1, merge_mode="mor"
    )
    assert table.read().count() == 1999
    sid = expire_tombstones(table, low_watermark_lsn=99999, target_rows_per_file=1000)
    assert sid is not None
    assert table.read().count() == 1999  # k00042 gone for good
    assert table.read().where("doc_id = 'k00042'").count() == 0
    # and the physical tombstone row is gone too
    assert table.read(include_hidden=True, include_deleted=True).where("_deleted").count() == 0


def test_mor_read_range_with_pruned_masks(spark, tmp_table_dir):
    """Range reads apply masks correctly whether the winners files overlap
    the requested range (superseded/tombstoned rows must not surface) or
    not (the mask prunes away entirely)."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _bulk(spark, 2000), epoch=0)
    merge_batch(
        table,
        _batch(
            spark,
            [
                ("k00100", 99999, 0, "U", -1, "m"),
                ("k00101", 99998, 0, "D", None, None),
            ],
        ),
        epoch=1,
        merge_mode="mor",
    )
    # overlapping range: new version wins, tombstoned key vanishes
    got = {r["doc_id"]: r["value_cents"] for r in table.read_range("k00099", "k00102").collect()}
    assert got == {"k00099": 990, "k00100": -1, "k00102": 1020}
    # disjoint range: mask prunes to nothing, plain rows come back
    got2 = {r["doc_id"]: r["value_cents"] for r in table.read_range("k01500", "k01502").collect()}
    assert got2 == {"k01500": 15000, "k01501": 15010, "k01502": 15020}


def test_mor_time_travel_and_diff(spark, tmp_table_dir):
    """Snapshot reads and the CDC-out diff must see masked state at every
    snapshot boundary."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _batch(spark, [("a", 1, 0, "U", 1, "s"), ("b", 2, 0, "U", 2, "s")]), epoch=0)
    s0 = table.head_id()
    merge_batch(table, _batch(spark, [("a", 10, 0, "U", 5, "s")]), epoch=1, merge_mode="mor")
    s1 = table.head_id()
    assert {r["doc_id"]: r["value_cents"] for r in table.read(sid=s0).collect()} == {"a": 1, "b": 2}
    assert {r["doc_id"]: r["value_cents"] for r in table.read(sid=s1).collect()} == {"a": 5, "b": 2}
    d = {r["doc_id"]: (r["change_op"], r["value_cents"]) for r in table.diff(s0, s1).collect()}
    assert d == {"a": ("U", 5)}


def test_mask_seq_mapping_join_fallback(spark, tmp_table_dir, monkeypatch):
    """Above MAX_LITERAL_SEQ_MAP entries the basename->commit-order mapping
    broadcast-joins instead of inlining a literal map (a 10^5-file table
    would bloat every plan); force the fallback and check masked reads."""
    import etl_spark.table.table as tt

    monkeypatch.setattr(tt, "MAX_LITERAL_SEQ_MAP", 0)
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _bulk(spark, 1000), epoch=0)
    merge_batch(table, _batch(spark, [("k00007", 99999, 0, "U", -7, "m")]), epoch=1, merge_mode="mor")
    merge_batch(table, _batch(spark, [("k00007", 99998, 0, "U", 55, "m")]), epoch=2, merge_mode="mor")  # stale
    assert table.read().count() == 1000
    assert table.read().where("doc_id = 'k00007'").collect()[0]["value_cents"] == -7


def test_table_stats_track_mor_debt(spark, tmp_table_dir):
    from etl_spark.table.maintenance import compact_mor

    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _bulk(spark, 1000), epoch=0)
    s0 = table.stats()
    assert s0["mor_files"] == 0 and s0["rows"] == 1000 and s0["fenced_epochs"] == 1
    merge_batch(table, _batch(spark, [("k00001", 99999, 0, "U", 1, "s")]), epoch=1, merge_mode="mor")
    s1 = table.stats()
    assert s1["mor_files"] == 1 and s1["mor_mask_rows"] == 1
    assert s1["rows"] == 1001  # physical rows include the superseded copy
    assert table.read().count() == 1000
    compact_mor(table, target_rows_per_file=1000)
    s2 = table.stats()
    assert s2["mor_files"] == 0 and s2["rows"] == 1000


def test_mor_schema_evolution_and_rename(spark, tmp_table_dir):
    """MoR winners files written under different schema versions reconcile
    through the same field-id loader as CoW files."""
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    merge_batch(table, _bulk(spark, 500), epoch=0)
    table.update_schema(add_columns=[("extra", "bigint")])
    e = spark.createDataFrame(
        [("k00007", 99999, 0, "U", 1, "s", 42)],
        "doc_id string, commit_lsn long, op_seq int, op string, value_cents long, source string, extra long",
    )
    r = merge_batch(table, e, epoch=1, merge_mode="mor")
    assert r.mode == "mor"
    table.rename_column("value_cents", "amount_cents")
    got = {r["doc_id"]: (r["amount_cents"], r["extra"]) for r in table.read().where("doc_id in ('k00007','k00008')").collect()}
    assert got == {"k00007": (1, 42), "k00008": (80, None)}
