"""Watermarked streaming window aggregation: the batch tumbling_counts
expression runs incrementally under Structured Streaming, late events within
the watermark are folded in, and the streamed totals equal the batch run."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_spark.operators.events import sliding_counts, tumbling_counts


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
