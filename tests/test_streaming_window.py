"""Event-time windowed aggregation with watermark + late-data handling
(SURVEY.md §2.5 categories inherited from Structured Streaming),
exercised over the events fixture replayed as a file stream.
"""

from __future__ import annotations

import os

from datetime import datetime

from pyspark.sql import functions as F


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m, 0)


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def test_tumbling_window_with_watermark_closes_windows(spark, tmp_path):
    """Append mode emits a window only once its watermark passes —
    the Structured Streaming contract for finalized event-time windows
    (no retractions needed downstream). Late rows inside the watermark
    still count; rows later than the watermark are dropped."""
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .select(F.col("w.start").alias("ws"), "n", "v")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        ts = _ts
        _write_batch(spark, spool, 0, [
            (1, ts(0, 10), 1.0), (2, ts(0, 50), 2.0), (3, ts(1, 20), 4.0),
        ])
        q.processAllAvailable()
        # watermark = 01:20 - 1h = 00:20 → no window closed yet
        assert spark.sql("SELECT * FROM win_out").count() == 0

        # advance to 03:30 → watermark 02:30 → hours 0 and 1 close
        _write_batch(spark, spool, 1, [(4, ts(3, 30), 8.0)])
        # a late-but-within-watermark row for hour 1 arrives first
        q.processAllAvailable()
        _write_batch(spark, spool, 2, [(5, ts(4, 40), 16.0)])
        q.processAllAvailable()

        rows = {
            r["ws"].strftime("%H"): (r["n"], r["v"])
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
        assert rows["00"] == (2, 3.0)
        assert rows["01"] == (1, 4.0)
        assert "03" not in rows  # still open (watermark 03:40 at most)
    finally:
        q.stop()


def test_session_window_streaming(spark, tmp_path):
    """session_window: gap-based event-time sessions in streaming —
    the built-in twin of the batch events_sessionized operator."""
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    # streaming session windows require a grouping key (global
    # session aggregation is unsupported) — keyed per user, like the
    # batch events_sessionized operator
    user = (F.col("event_id") % 2).alias("uid")
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(user, F.session_window("ts", "10 minutes").alias("sw"))
        .agg(F.count("*").alias("n"))
        .select("uid", F.col("sw.start").alias("s"), F.col("sw.end").alias("e"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        ts = _ts
        # uid 0 session A: 00:00,00:05 (merges); uid 1 session B: 00:30
        _write_batch(spark, spool, 0, [
            (10, ts(0, 0), 0.0), (12, ts(0, 5), 0.0), (11, ts(0, 30), 0.0),
        ])
        q.processAllAvailable()
        # push watermark far ahead to close both sessions
        _write_batch(spark, spool, 1, [(20, ts(2, 0), 0.0), (21, ts(2, 0), 0.0)])
        q.processAllAvailable()
        _write_batch(spark, spool, 2, [(22, ts(3, 0), 0.0), (23, ts(3, 0), 0.0)])
        q.processAllAvailable()

        got = sorted(
            (r["s"].strftime("%H:%M"), r["n"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        )
        assert ("00:00", 2) in got  # merged session
        assert ("00:30", 1) in got
    finally:
        q.stop()


def test_stream_stream_temporal_join(spark, tmp_path):
    """Watermarked stream-stream inner join with a time-range
    condition (purchase within 1 h after the click) — the temporal
    join shape SURVEY §2.5 inherits from Structured Streaming. Both
    sides keep bounded state: the watermark + range bound let Spark
    evict rows older than ts - 1 h."""
    import pyspark.sql.functions as F

    cspool = str(tmp_path / "clicks")
    pspool = str(tmp_path / "purchases")
    os.makedirs(cspool)
    os.makedirs(pspool)
    schema = "event_id long, ts timestamp, value double"
    clicks = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(cspool)
        .withColumnRenamed("ts", "c_ts")
        .withColumnRenamed("event_id", "user")
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(pspool)
        .withColumnRenamed("ts", "p_ts")
        .withColumnRenamed("event_id", "user")
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (clicks["user"] == purchases["user"])
        & (purchases["p_ts"] >= clicks["c_ts"])
        & (purchases["p_ts"] <= clicks["c_ts"] + F.expr("INTERVAL 1 HOUR")),
    ).select(clicks["user"], "c_ts", "p_ts")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        ts = _ts
        # user 1 clicks at 00:10; user 2 clicks at 00:20
        _write_batch(spark, cspool, 0, [(1, ts(0, 10), 0.0), (2, ts(0, 20), 0.0)])
        # user 1 purchases at 00:40 (in range), user 2 at 02:00 (out)
        _write_batch(spark, pspool, 0, [(1, ts(0, 40), 9.0), (2, ts(2, 0), 9.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT user, c_ts, p_ts FROM ssj_out").collect()
        got = {(r["user"], r["c_ts"].minute, r["p_ts"].minute) for r in rows}
        assert (1, 10, 40) in got
        assert all(u != 2 for u, _, _ in got)  # out-of-range never joins
    finally:
        q.stop()
