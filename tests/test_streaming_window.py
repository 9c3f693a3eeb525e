"""Watermarked streaming window aggregation: the batch tumbling_counts
expression runs incrementally under Structured Streaming, late events within
the watermark are folded in, and the streamed totals equal the batch run."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_spark.operators.events import sessionize, sessionize_stream, sliding_counts, tumbling_counts


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # two files: the second carries events EARLIER than the first (late data)
    rows1 = [(i, f"2024-01-01 0{i % 4}:10:00", i % 7, "click", 1.0, "{}") for i in range(100)]
    rows2 = [(1000 + i, f"2024-01-01 0{i % 3}:40:00", i % 7, "view", 2.0, "{}") for i in range(50)]
    schema = "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    df1 = spark.createDataFrame(rows1, schema).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df2 = spark.createDataFrame(rows2, schema).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df1.coalesce(1).write.mode("append").parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "2 hours")
    )
    agg = tumbling_counts(stream, width="1 hour")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # append mode only emits windows the watermark has closed; re-drain after
    # a max-ts bump is unnecessary here because AvailableNow advances the
    # watermark across both files — compare only emitted windows
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(out).collect()
    }
    batch = tumbling_counts(df1.unionByName(df2), width="1 hour")
    exp = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in batch.collect()
    }
    assert got, "no windows emitted"
    for k, v in got.items():
        assert exp[k] == v, f"window {k}: streamed {v} != batch {exp[k]}"


def test_streaming_sliding_equals_batch(spark, tmp_path):
    """The overlapping-window aggregate (1h width / 15min slide) runs
    incrementally under a watermark and matches the batch run on every
    emitted (closed) window."""
    src = str(tmp_path / "ev_src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [(i, f"2024-01-01 0{i % 4}:{10 + i % 40:02d}:00", i % 5, "click", 1.5, "{}") for i in range(120)]
    rows2 = [(500 + i, f"2024-01-01 0{i % 3}:{5 + i % 50:02d}:00", i % 5, "view", 2.0, "{}") for i in range(60)]
    schema = "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    df1 = spark.createDataFrame(rows1, schema).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df2 = spark.createDataFrame(rows2, schema).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df1.coalesce(1).write.mode("append").parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "2 hours")
    )
    q = (
        sliding_counts(stream, width="1 hour", slide="15 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(out).collect()
    }
    exp = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in sliding_counts(df1.unionByName(df2), width="1 hour", slide="15 minutes").collect()
    }
    assert got, "no windows emitted"
    for k, v in got.items():
        assert exp[k] == v, f"window {k}: streamed {v} != batch {exp[k]}"


def test_streaming_session_window_equals_batch(spark, tmp_path):
    """Gap-based sessionization runs incrementally via native
    ``session_window`` (state-store session merging) and every emitted
    session matches the batch lag+cumsum formulation's bounds and counts —
    including sessions STITCHED across microbatches (user 3's second file
    events extend a session opened in the first)."""
    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # user u: events at 00:00, 00:10 (one session), 01:30 (new session, gap 30m)
    rows1 = []
    for u in range(5):
        rows1 += [
            (u * 100 + 1, "2024-01-01 00:00:00", u, "click", 1.0, "{}"),
            (u * 100 + 2, "2024-01-01 00:10:00", u, "click", 1.0, "{}"),
            (u * 100 + 3, "2024-01-01 01:30:00", u, "view", 2.0, "{}"),
        ]
    # second file: user 3 extends the 01:30 session (01:45), user 4 opens a
    # later one whose session stays OPEN (append mode emits a session only
    # once the watermark passes session_end + gap, so the late 03:00 event
    # both closes the earlier sessions and holds its own back)
    rows2 = [
        (901, "2024-01-01 01:45:00", 3, "click", 1.0, "{}"),
        (902, "2024-01-01 03:00:00", 4, "click", 1.0, "{}"),
    ]
    schema = "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    df1 = spark.createDataFrame(rows1, schema).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df2 = spark.createDataFrame(rows2, schema).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df1.coalesce(1).write.mode("append").parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    exp = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df1.unionByName(df2), gap_minutes=30).collect()
    }
    assert got, "no sessions emitted"
    assert got <= exp, f"streamed sessions not in batch: {got - exp}"
    # the cross-batch stitched session must be present and correct
    stitched = [s for s in got if s[0] == 3 and s[3] == 2]
    assert stitched, "user 3's stitched (01:30+01:45) session missing"
