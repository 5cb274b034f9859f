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
