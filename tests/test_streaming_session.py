"""Streaming session windows: finalized sessions equal the batch twin,
sessions MERGE across micro-batches, and open sessions are withheld
until the watermark closes them (append-mode contract)."""

from __future__ import annotations

import os

from datetime import datetime

from streamlit_flink_demo_spark.streaming.session import session_window_agg

_SCHEMA = "user_id long, ts timestamp, amount double"


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m, 0)


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def _collect(spark, name):
    return {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_session_stream_matches_batch_twin_and_merges(spark, tmp_path):
    spool = str(tmp_path / "ev")
    os.makedirs(spool)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    out = session_window_agg(
        stream, "user_id", gap="30 minutes", watermark="10 minutes",
        value_col="amount",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    # user 1: one burst SPLIT ACROSS BATCHES (1:00, 1:10 | 1:25) that
    # must merge into a single session 1:00-1:55; user 2: two separate
    # sessions; the 9:00 flush rows advance the watermark past all ends
    b0 = [(1, _ts(1, 0), 1.0), (1, _ts(1, 10), 2.0), (2, _ts(1, 0), 5.0)]
    b1 = [(1, _ts(1, 25), 3.0), (2, _ts(3, 0), 7.0)]
    flush = [(9, _ts(9, 0), 0.0)]
    try:
        _write_batch(spark, spool, 0, b0)
        q.processAllAvailable()
        early = _collect(spark, "sess_out")
        assert early == set()  # nothing finalized before watermark moves
        _write_batch(spark, spool, 1, b1)
        q.processAllAvailable()
        _write_batch(spark, spool, 2, flush)
        q.processAllAvailable()
        got = _collect(spark, "sess_out")
    finally:
        q.stop()

    batch = spark.createDataFrame(b0 + b1, _SCHEMA)
    want = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in session_window_agg(
            batch, "user_id", gap="30 minutes", value_col="amount"
        ).collect()
    }
    assert got == want
    # the split burst fused into ONE session spanning both batches
    assert (1, _ts(1, 0), _ts(1, 55), 3, 6.0) in got
    # user 2's two bursts stayed separate
    assert (2, _ts(1, 0), _ts(1, 30), 1, 5.0) in got
    assert (2, _ts(3, 0), _ts(3, 30), 1, 7.0) in got


def test_session_batch_twin_matches_lag_formulation(spark, sf_dir):
    """The built-in session_window on events must produce the same
    session boundaries as the lag()-gap formulation used by the batch
    `events_sessionized` operator (30-minute gap, per user)."""
    from streamlit_flink_demo_spark.sources.catalog import load_table
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    sw = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_window_agg(ev, "user_id", gap="30 minutes").collect()
    }
    w = W.partitionBy("user_id").orderBy("ts")
    lag = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | (
                    F.col("ts").cast("long") - F.col("prev").cast("long")
                    > 1800
                )
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n"))
    )
    want = {
        (r["user_id"], r["session_start"], r["n"]) for r in lag.collect()
    }
    assert sw == want
