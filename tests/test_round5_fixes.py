"""Round-5 regression pins (ADVICE round 4).

1. The fast-path IN-list parse is immune to ``spark.sql.parser.
   escapedStringLiterals`` being flipped on by a caller: merge scopes the
   conf off around the one F.expr round-trip (and build_session pins it off).
2. ``_scoped_conf`` is depth-counted per (session, key): nested/concurrent
   scopes restore the TRUE original value instead of each other's "false".
3. The module-level Column caches are bounded LRUs keyed by the live py4j
   gateway, so schema churn can't grow them without bound.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_spark.operators import merge as merge_mod
from etl_spark.operators.merge import _scoped_conf, merge_batch
from etl_spark.session import EXPR_CACHE_MAX, expr_cache_get
from etl_spark.table import LakeTable

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


def test_fast_path_immune_to_escaped_string_literals_conf(spark, tmp_table_dir):
    """ADVICE r4 (merge.py fast path): with legacy escapedStringLiterals=true
    the old C-style escaping in _sql_str silently mis-matched backslash/quote
    keys — a missed key is treated as absent from the target, so a STALE
    event (lower lsn than the stored row) incorrectly WINS as a fresh insert
    (reproduced pre-fix: MoR path returned 777 for both hostile keys). The
    conf is read lazily at analysis time, so the fix makes the literals
    themselves parser-mode-immune (plain quoting for clean keys, hex binary
    CAST for hostile ones)."""
    hostile = ["k'quote", "k\\back\\slash", "k\\'both", "plain"]
    for mode in ("cow", "mor"):
        root = tmp_table_dir + "_" + mode
        table = LakeTable.create_if_absent(spark, root, SCHEMA)
        merge_batch(
            table, _batch(spark, [(k, 10 + i, 0, "U", 100 + i, "s") for i, k in enumerate(hostile)]), epoch=0
        )
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
        try:
            stale = _batch(spark, [(k, 1, 0, "U", 777, "stale") for k in hostile])
            merge_batch(table, stale, epoch=1, merge_mode=mode)
        finally:
            spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
        rows = table.read().collect()
        got = {row["doc_id"]: row["value_cents"] for row in rows}
        assert len(rows) == len(hostile), f"{mode}: duplicate/missing rows {rows}"
        assert got == {k: 100 + i for i, k in enumerate(hostile)}, f"{mode}: stale event won"


def test_scoped_conf_nested_restores_original(spark):
    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    with _scoped_conf(spark, key, "false"):
        assert spark.conf.get(key) == "false"
        with _scoped_conf(spark, key, "false"):
            assert spark.conf.get(key) == "false"
        # inner exit must NOT restore yet (depth-counted)
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == orig


def test_scoped_conf_concurrent_interleave_restores_original(spark):
    """The round-4 ADVICE failure shape: scope B enters while scope A holds
    the conf at 'false'; a naive implementation captures 'false' as B's prev
    and leaves AQE permanently disabled after both exit."""
    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    gate_a_set = threading.Event()
    gate_b_done = threading.Event()

    def scope_b():
        gate_a_set.wait(10)
        with _scoped_conf(spark, key, "false"):
            pass
        gate_b_done.set()

    t = threading.Thread(target=scope_b)
    t.start()
    with _scoped_conf(spark, key, "false"):
        gate_a_set.set()
        assert gate_b_done.wait(10)
        # B exited while A still holds the scope: conf stays at the scoped value
        assert spark.conf.get(key) == "false"
    t.join()
    assert spark.conf.get(key) == orig


def test_expr_cache_is_bounded_lru(spark):
    cache: OrderedDict = OrderedDict()
    for i in range(EXPR_CACHE_MAX + 40):
        expr_cache_get(cache, ("layout", i), lambda i=i: [i])
    assert len(cache) == EXPR_CACHE_MAX
    # most-recent keys survive, oldest evicted
    assert expr_cache_get(cache, ("layout", EXPR_CACHE_MAX + 39), lambda: ["rebuilt"]) == [
        EXPR_CACHE_MAX + 39
    ]
    rebuilt = expr_cache_get(cache, ("layout", 0), lambda: ["rebuilt"])
    assert rebuilt == ["rebuilt"]


def test_merge_expr_caches_are_bounded(spark, tmp_table_dir):
    """The production caches route through expr_cache_get (spot-check one)."""
    before = len(merge_mod._FILE_STAT_EXPRS_CACHE)
    merge_mod._file_stat_exprs(3)
    merge_mod._file_stat_exprs(3)
    after = len(merge_mod._FILE_STAT_EXPRS_CACHE)
    assert after <= max(before + 1, EXPR_CACHE_MAX)
    assert isinstance(merge_mod._FILE_STAT_EXPRS_CACHE, OrderedDict)
