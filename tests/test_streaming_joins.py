"""Stream-stream interval join: inner results equal the batch twin on
the same rows; the left-outer variant withholds null-padded rows until
the watermark proves no match can arrive (the Flink interval-join
late-data contract, re-expressed in Structured Streaming)."""

from __future__ import annotations

import os

from datetime import datetime

from streamlit_flink_demo_spark.streaming.joins import interval_join


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m, 0)


_SCHEMA = "user_id long, ts timestamp, amount double"


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def _spools(spark, tmp_path):
    ls, rs = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ls)
    os.makedirs(rs)
    left = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ls)
    )
    right = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(rs)
    )
    return ls, rs, left, right


def test_interval_join_inner_matches_batch_twin(spark, tmp_path):
    ls, rs, left, right = _spools(spark, tmp_path)
    j = interval_join(
        left, right, "user_id", lower="0 seconds", upper="30 minutes"
    )
    q = (
        j.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    clicks = [
        (1, _ts(1, 0), 1.0),
        (1, _ts(2, 0), 2.0),
        (2, _ts(1, 0), 3.0),
        (3, _ts(1, 0), 4.0),
    ]
    buys = [
        (1, _ts(1, 20), 10.0),  # matches user-1 click @1:00
        (1, _ts(2, 40), 20.0),  # outside both user-1 windows
        (2, _ts(1, 30), 30.0),  # exactly at the upper bound → matches
        (2, _ts(0, 50), 40.0),  # before the click → no match
        (4, _ts(1, 10), 50.0),  # no click side at all
    ]
    try:
        _write_batch(spark, ls, 0, clicks)
        _write_batch(spark, rs, 0, buys)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["l_ts"], r["r_ts"])
            for r in spark.sql("SELECT * FROM ij_out").collect()
        }
    finally:
        q.stop()
    lb = spark.createDataFrame(clicks, _SCHEMA)
    rb = spark.createDataFrame(buys, _SCHEMA)
    want = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in interval_join(
            lb, rb, "user_id", lower="0 seconds", upper="30 minutes"
        ).collect()
    }
    assert got == want
    assert (1, _ts(1, 0), _ts(1, 20)) in got
    assert (2, _ts(1, 0), _ts(1, 30)) in got  # inclusive upper bound
    assert len(got) == 2


def test_interval_join_left_outer_emits_after_watermark(spark, tmp_path):
    ls, rs, left, right = _spools(spark, tmp_path)
    j = interval_join(
        left,
        right,
        "user_id",
        lower="0 seconds",
        upper="30 minutes",
        left_watermark="10 minutes",
        right_watermark="10 minutes",
        how="left_outer",
    )
    q = (
        j.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_outer")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        _write_batch(spark, ls, 0, [(1, _ts(1, 0), 1.0), (2, _ts(1, 0), 2.0)])
        _write_batch(spark, rs, 0, [(1, _ts(1, 15), 10.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ij_outer").collect()
        # user-1 matched; user-2's null row must NOT appear yet — a
        # match could still arrive until the watermark passes 01:30
        assert {r["user_id"] for r in rows if r["r_ts"] is not None} == {1}
        assert all(r["r_ts"] is not None for r in rows)

        # advance both watermarks far past every possible match window
        _write_batch(spark, ls, 1, [(9, _ts(6, 0), 0.0)])
        _write_batch(spark, rs, 1, [(9, _ts(6, 0), 0.0)])
        q.processAllAvailable()
        # one more cycle: outer results are emitted on the trigger
        # AFTER the watermark move becomes the stream's floor
        _write_batch(spark, ls, 2, [(9, _ts(7, 0), 0.0)])
        _write_batch(spark, rs, 2, [(9, _ts(7, 0), 0.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ij_outer").collect()
        nulls = {r["user_id"] for r in rows if r["r_ts"] is None}
        assert 2 in nulls  # user-2 click emitted null-padded
    finally:
        q.stop()


def test_interval_join_sql_statement_through_facade(spark, tmp_path):
    """The interval join as a continuous SQL STATEMENT (the way the
    reference platform runs it — Flink SQL's `BETWEEN ... INTERVAL`):
    two watermarked streaming views, one facade statement, +I-only
    changelog (append semantics, keyless-stateful emitter path)."""
    from streamlit_flink_demo_spark.changelog import Changelog
    from streamlit_flink_demo_spark.statements import StatementsService

    ls, rs, left, right = _spools(spark, tmp_path)
    left.withWatermark("ts", "1 hour").createOrReplaceTempView("clicks")
    right.withWatermark("ts", "1 hour").createOrReplaceTempView("purchases")
    sql = """
SELECT c.user_id, c.ts AS click_ts, p.ts AS buy_ts, p.amount
FROM clicks c JOIN purchases p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTES
"""
    svc = StatementsService(spark)
    env = svc.create(sql, checkpoint_dir=str(tmp_path / "ckpt"))
    assert env["status"]["phase"] == "running", env["status"]["detail"]
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    assert cols == ["user_id", "click_ts", "buy_ts", "amount"]
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))

    _write_batch(spark, ls, 0, [(1, _ts(1, 0), 1.0), (2, _ts(1, 0), 2.0)])
    _write_batch(
        spark, rs, 0, [(1, _ts(1, 20), 10.0), (2, _ts(2, 0), 20.0)]
    )
    svc.process_available(env["name"])
    got = []
    while True:
        batch = cl.consume(100)
        got.extend(batch)
        if len(batch) < 100:
            break
    ops = {(r["op"], r["row"][0], r["row"][3]) for r in got}
    # user 1's purchase is inside the window (+I); user 2's is 60 min
    # out — never emitted
    assert ops == {(0, 1, 10.0)}
    svc.stop(env["name"])


def test_interval_join_negative_lower_bound(spark, tmp_path):
    """Flink's full interval shape allows a negative lower bound
    (match events BEFORE the left row too): rows at exactly both
    bounds match, rows outside either side don't."""
    lb = spark.createDataFrame([(1, _ts(2, 0), 1.0)], _SCHEMA)
    rb = spark.createDataFrame(
        [
            (1, _ts(1, 50), 10.0),   # -10 min → exactly at lower bound
            (1, _ts(1, 40), 20.0),   # -20 min → outside
            (1, _ts(2, 10), 30.0),   # +10 min → exactly at upper bound
            (1, _ts(2, 20), 40.0),   # +20 min → outside
        ],
        _SCHEMA,
    )
    got = {
        r["r_amount"]
        for r in interval_join(
            lb, rb, "user_id", lower="-10 minutes", upper="10 minutes"
        ).collect()
    }
    assert got == {10.0, 30.0}


def test_interval_join_rejects_unknown_how():
    import pytest

    with pytest.raises(ValueError, match="unsupported interval-join"):
        interval_join(None, None, "k", how="full_outer")
