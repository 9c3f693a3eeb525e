"""Event-stream operators: tumbling-window aggregation and sessionization.

The reference processes time-sliced inputs (per-month rasters, month parsed
from filenames at ``src/worldclim/.../WorldClimHistoricalTemperatureETL.scala:71``
and filtered at ``:74``) strictly sequentially; here the same
"slice by event time" capability is expressed as real windowed operators over
an ``events(event_id, ts, user_id, event_type, value, props)`` stream table.

Both operators run identically over a batch DataFrame and a Structured
Streaming DataFrame (window aggregation + watermark; sessionization via
``session_window``); batch form is used for oracle checks.

Outputs carry epoch-second bigints instead of timestamps so results are
engine-portable; money-ish doubles are emitted in exact integer cents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per (tumbling time window, event_type) counts + value total in cents.

    Shuffle on (window, type) with map-side partial aggregation; with
    ``withWatermark("ts", ...)`` the identical expression runs incrementally
    under Structured Streaming.
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Per (sliding time window, event_type) counts + value total in cents.

    Overlapping windows via native ``F.window(ts, width, slide)`` — each
    event contributes to width/slide windows (the engine expands membership
    JVM-side, no self-join). Same expression runs incrementally under
    Structured Streaming with a watermark.
    """
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the gap
    since the user's previous event exceeds ``gap_minutes``.

    Classic lag + cumulative-sum over a per-user window (one range shuffle on
    user_id). Output: (user_id, session_id, session_start, session_end,
    n_events) with epoch-second bounds; session_id is the per-user ordinal.
    In streaming mode the equivalent is ``session_window(ts, gap)``.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = gap_minutes * 60
    marked = events.withColumn(
        "new_session",
        F.when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > gap,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.min(F.unix_timestamp("ts")).alias("session_start"),
        F.max(F.unix_timestamp("ts")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Native ``session_window`` formulation of :func:`sessionize` — the
    form that runs INCREMENTALLY under Structured Streaming (state-store
    session merging; append mode emits a session once the watermark passes
    its close).

    Session identity differs from the batch twin only in labeling: the
    batch op numbers sessions per user (an ordinal no append-mode stream
    can know), so this emits the session BOUNDS instead. ``session_window``
    defines window.end as last_event + gap; subtracting the gap restores
    the batch op's ``max(ts)`` semantics, so per (user_id, session_start,
    session_end, n_events) the two are row-for-row equal (asserted in
    tests/test_streaming_window.py)."""
    gap = gap_minutes * 60
    return (
        events.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            (F.unix_timestamp(F.col("w.end")) - gap).alias("session_end"),
            "n_events",
        )
    )
