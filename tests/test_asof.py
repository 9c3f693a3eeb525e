"""As-of join semantics tests (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from etl_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k1", _ts(10)), (2, "k1", _ts(20)), (3, "k2", _ts(5)), (4, "k3", _ts(30))],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, "k1", _ts(5)), (101, "k1", _ts(15)), (102, "k1", _ts(20)), (103, "k2", _ts(9))],
        "rid int, k string, ts timestamp",
    )
    return left, right


def test_asof_non_strict_matches_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["rid_right"]
        for r in asof_join(left, right, on="k", ts="ts", strict=False).collect()
    }
    assert out[1] == 100  # ts=10 -> right@5
    assert out[2] == 102  # ts=20 -> right@20 (equal ts matches when non-strict)
    assert out[3] is None  # k2 first right is @9 > 5
    assert out[4] is None  # k3 has no rights


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["rid_right"] for r in asof_join(left, right, on="k", ts="ts", strict=True).collect()
    }
    assert out[2] == 101  # equal-ts right@20 excluded -> right@15


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["rid_right"]
        for r in asof_join(left, right, on="k", ts="ts", strict=False, tolerance_sec=3).collect()
    }
    assert out[1] is None  # right@5 is 5s old > 3s tolerance
    assert out[2] == 102  # exact match age 0


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on="k", ts="ts").count() == left.count()
