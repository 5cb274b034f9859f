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


def test_transform_with_state_running_totals(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 StatefulProcessor): per-key
    running count/sum/max accumulate across micro-batches and the
    final emission per key equals the batch aggregate over all rows.

    Env-gated like the Kafka-broker and real-codec tiers: the
    transformWithState Python<->JVM state protocol is protobuf-framed
    (pyspark/sql/streaming/proto/StateMessage_pb2), and this container
    has no google.protobuf and no package installs — without it the
    driver-side state server crashes at query start
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The operator
    itself is plain PySpark; on any normal cluster image (protobuf
    ships with most distros' pyspark extras) this test runs."""
    import os

    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable (no installs in sandbox)")

    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.streaming.stateful import (
        streaming_running_totals,
    )

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    out = streaming_running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("twst_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    from datetime import datetime

    t = datetime(2024, 1, 1)
    b1 = [(1, t, 1.0), (1, t, 5.0), (2, t, 2.0)]
    b2 = [(1, t, 3.0), (3, t, 7.0)]

    def write(n, rows):
        df = spark.createDataFrame(rows, schema)
        staging = os.path.join(spool, f"_s{n}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(staging, part),
            os.path.join(spool, f"b{n:04d}.parquet"),
        )

    try:
        write(0, b1)
        q.processAllAvailable()
        write(1, b2)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM twst_out"
        ).toPandas()
    finally:
        q.stop()
    # last emission per key = running totals after all batches; the
    # memory-sink SELECT has no row order, so "last" is selected by
    # the monotone running count, not by incidental scan order
    last = rows.sort_values("n").groupby("user_id").last()
    want = (
        spark.createDataFrame(b1 + b2, schema)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("vmax"),
        )
        .toPandas()
        .set_index("user_id")
    )
    for uid in (1, 2, 3):
        assert last.loc[uid, "n"] == want.loc[uid, "n"]
        assert last.loc[uid, "total"] == want.loc[uid, "total"]
        assert last.loc[uid, "vmax"] == want.loc[uid, "vmax"]
    # update semantics: user 1 was touched in both batches → 2 rows
    assert (rows.user_id == 1).sum() == 2
    assert (rows.user_id == 3).sum() == 1
