"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

``asof_join(left, right)``: for every left row, attach the single most recent
right row with the same key whose timestamp is <= (or <) the left row's —
the canonical operator for joining events to the latest prior state (quotes
to trades, clicks to purchases, sensor snapshots to alerts).

Physical strategy (composition of built-in ops, SURVEY.md §2.5 discipline —
no Python, no per-row logic):

1. union both sides tagged (right rows carry their payload, left rows null);
2. one range shuffle on (key) + sort within partition by (ts, side-order);
3. ``last(payload, ignorenulls=True)`` over the running window = the most
   recent right payload at each point in time;
4. filter back to left rows.

Cost: a single sort-shuffle of |L|+|R| — the same lower bound a native
merge-based as-of join pays. No broadcast of either side is required, keys
are processed independently (skew behaves like any keyed window), and the
plan pipelines into downstream operators.

Tolerance (max lookback) is applied post-join as a predicate on the matched
timestamp, which keeps the window shape unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    strict: bool = True,
    tolerance_sec: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, the latest right row per ``on`` key with
    ``right.ts < left.ts`` (strict) or ``<=`` (non-strict; ties on equal ts
    resolved to the right side seen first in sort order).

    Returns all left columns plus ``<c><suffix>`` for each of ``right_cols``
    (default: all non-key, non-ts right columns) and ``<ts><suffix>`` — null
    where no prior right row exists (or it is older than ``tolerance_sec``).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(F.col(ts).alias("_rts"), *[F.col(c) for c in right_cols]).alias("_rpay"),
    )
    # align schemas for the union
    lt_cols = [F.col(c) for c in left.columns] + [F.col("_side"), F.lit(None).cast(rt.schema["_rpay"].dataType).alias("_rpay")]
    rt_cols = (
        [F.col(on) if c == on else (F.col(ts) if c == ts else F.lit(None).cast(left.schema[c].dataType).alias(c)) for c in left.columns]
        + [F.col("_side"), F.col("_rpay")]
    )
    unioned = lt.select(*lt_cols).unionByName(rt.select(*rt_cols))

    # strict: right rows at ts == left ts must NOT match -> order left (1)
    # before right (0) at equal ts so `last` skips them;
    # non-strict: right first so equal-ts rows are visible.
    side_order = F.desc("_side") if strict else F.asc("_side")
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))

    out = matched.where(F.col("_side") == 1).drop("_side", "_rpay")
    if tolerance_sec is not None:
        too_old = (
            F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col("_match._rts")) > tolerance_sec
        )
        out = out.withColumn("_match", F.when(too_old, F.lit(None)).otherwise(F.col("_match")))
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_match.{c}"))
    out = out.withColumn(f"{ts}{suffix}", F.col("_match._rts"))
    return out.drop("_match")
