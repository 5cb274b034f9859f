"""applyInPandasWithState custom operator: streaming first-seen dedup
across microbatch boundaries."""

from __future__ import annotations

import os


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, "guid string, payload string")
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet"))


def test_streaming_first_seen_dedup(spark, tmp_path):
    from streamlit_flink_demo_spark.streaming.stateful import (
        streaming_first_seen,
    )

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    stream = (
        spark.readStream.schema("guid string, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    deduped = streaming_first_seen(
        stream, "guid", "guid string, payload string, n_dupes_so_far bigint"
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _write_batch(spark, spool, 0, [("a", "v1"), ("a", "v2"), ("b", "v3")])
        q.processAllAvailable()
        out = {
            r["guid"]: r["payload"]
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
        assert set(out) == {"a", "b"}  # one row per key

        # duplicates in a LATER batch must be suppressed by state
        _write_batch(spark, spool, 1, [("a", "v4"), ("c", "v5")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_out").collect()
        assert sorted(r["guid"] for r in rows) == ["a", "b", "c"]
        # 'a' kept its first-seen payload
        assert {r["guid"]: r["payload"] for r in rows}["a"] == out["a"]
    finally:
        q.stop()


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """The built-in counterpart of the custom operator:
    dropDuplicatesWithinWatermark suppresses re-deliveries of the same
    key within the watermark horizon while letting state expire — the
    bounded-state form production streaming dedup wants (the custom
    applyInPandasWithState form above keeps first-seen payloads
    forever; this one trades that for state TTL)."""
    import datetime

    spool = str(tmp_path / "spool2")
    os.makedirs(spool)

    def write(n, rows):
        df = spark.createDataFrame(rows, "guid string, ts timestamp")
        staging = os.path.join(spool, f"_stage_{n}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.replace(
            os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
        )

    stream = (
        spark.readStream.schema("guid string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["guid"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ddww_out")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    m = datetime.timedelta(minutes=1)
    try:
        write(0, [("a", t0), ("a", t0 + m), ("b", t0)])
        q.processAllAvailable()
        write(1, [("a", t0 + 2 * m), ("c", t0 + 3 * m)])  # within horizon
        q.processAllAvailable()
        rows = spark.sql("SELECT guid FROM ddww_out").collect()
        # each key exactly once despite re-deliveries across batches
        assert sorted(r["guid"] for r in rows) == ["a", "b", "c"]
    finally:
        q.stop()
