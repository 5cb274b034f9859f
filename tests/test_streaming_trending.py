"""Trending terms over a document stream (streaming/trending.py):
stream ≡ batch-twin equality on finalized windows, watermark late-data
semantics, and exactly-once delivery (rows AND summaries) across a
restart replay."""

from __future__ import annotations

import os

from datetime import datetime

from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.trending import (
    attach_trending_stream,
    topk_per_window,
    windowed_term_counts,
)


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m, 0)


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, "ts timestamp, text string")
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def _stream(spark, spool):
    return (
        spark.readStream.schema("ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )


# hour 0: "spark" dominates; hour 1: "flink" dominates; a late-but-
# within-watermark hour-0 row arrives in a later file; one row is
# later than the watermark and must be dropped.
_B0 = [
    (_ts(0, 5), "spark spark stream"),
    (_ts(0, 20), "spark join window"),
    (_ts(1, 10), "flink flink state"),
]
_B1 = [
    (_ts(1, 40), "flink checkpoint"),
    (_ts(2, 30), "advance the watermark past hour one"),
]
_B2 = [
    (_ts(2, 5), "late spark row inside watermark"),  # hour-2 window
    (_ts(4, 0), "advance far"),
]


def test_stream_matches_batch_twin_on_finalized_windows(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "trend")
    q = attach_trending_stream(
        _stream(spark, spool),
        out,
        checkpoint_dir=str(tmp_path / "ck"),
        watermark="1 hour",
        topk=2,
    )
    try:
        for i, b in enumerate((_B0, _B1, _B2)):
            _write_batch(spark, spool, i, b)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["window_start"], r["token"], r["n"], r["rank"])
        for r in IdempotentParquetSink(out).read_committed(spark).collect()
    }
    # batch twin over the SAME rows, restricted to windows the stream
    # finalized (watermark = 04:00 - 1h => hours 0..2 closed)
    batch_docs = spark.createDataFrame(
        _B0 + _B1 + _B2, "ts timestamp, text string"
    )
    twin = topk_per_window(windowed_term_counts(batch_docs), topk=2)
    want = {
        (r["window_start"], r["token"], r["n"], r["rank"])
        for r in twin.collect()
        if r["window_start"] < _ts(3)
    }
    assert got == want
    # the designed winners are actually there
    winners = {
        (r[0].hour, r[3]): r[1] for r in got
    }
    assert winners[(0, 1)] == "spark"
    assert winners[(1, 1)] == "flink"


def test_row_later_than_watermark_is_dropped(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "trend")
    q = attach_trending_stream(
        _stream(spark, spool),
        out,
        checkpoint_dir=str(tmp_path / "ck"),
        watermark="1 hour",
        topk=5,
    )
    try:
        _write_batch(spark, spool, 0, [(_ts(0, 10), "alpha alpha")])
        q.processAllAvailable()
        # advance the watermark to 03:00 (hour 0 closes WITHOUT beta)
        _write_batch(spark, spool, 1, [(_ts(4, 0), "advance")])
        q.processAllAvailable()
        # too late: hour-0 row behind the 03:00 watermark
        _write_batch(spark, spool, 2, [(_ts(0, 30), "beta beta beta")])
        q.processAllAvailable()
        _write_batch(spark, spool, 3, [(_ts(9, 0), "advance more")])
        q.processAllAvailable()
    finally:
        q.stop()
    toks = {
        (r["window_start"].hour, r["token"])
        for r in IdempotentParquetSink(out).read_committed(spark).collect()
    }
    assert (0, "alpha") in toks
    assert (0, "beta") not in toks, "late-beyond-watermark row must drop"


def test_restart_replay_is_exactly_once(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "trend")
    ck = str(tmp_path / "ck")
    summaries: list[dict] = []

    q = attach_trending_stream(
        _stream(spark, spool),
        out,
        on_summary=summaries.append,
        checkpoint_dir=ck,
        watermark="1 hour",
        topk=2,
    )
    try:
        _write_batch(spark, spool, 0, _B0)
        q.processAllAvailable()
        _write_batch(spark, spool, 1, _B1)
        q.processAllAvailable()
    finally:
        q.stop()

    rows_before = sorted(
        map(
            tuple,
            IdempotentParquetSink(out).read_committed(spark).collect(),
        )
    )
    n_summaries_before = len(summaries)

    # restart from the same checkpoint: Spark replays the last batch;
    # the sink must not duplicate rows, the summary must not re-fire
    q2 = attach_trending_stream(
        _stream(spark, spool),
        out,
        on_summary=summaries.append,
        checkpoint_dir=ck,
        watermark="1 hour",
        topk=2,
    )
    try:
        q2.processAllAvailable()
        _write_batch(spark, spool, 2, _B2)
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows_after = sorted(
        map(
            tuple,
            IdempotentParquetSink(out).read_committed(spark).collect(),
        )
    )
    # the pre-restart rows are a prefix-set of the post-restart rows,
    # with no duplicates introduced by the replay
    assert set(rows_before) <= set(rows_after)
    assert len(rows_after) == len(set(rows_after))
    # summaries: replayed batch ids fired nothing; only genuinely new
    # batch ids (from _B2's windows closing) may append
    ids = [s["batch_id"] for s in summaries]
    assert len(ids) == len(set(ids)), "summary re-fired for a replayed id"
    assert len(summaries) >= n_summaries_before


def test_sliding_windows_stream_matches_batch_twin(spark, tmp_path):
    """The slide parameter: 2-hour windows sliding hourly — each event
    lands in TWO windows; finalized sliding windows must match the
    batch twin exactly."""
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "trend")
    q = attach_trending_stream(
        _stream(spark, spool),
        out,
        checkpoint_dir=str(tmp_path / "ck"),
        window="2 hours",
        slide="1 hour",
        watermark="1 hour",
        topk=3,
    )
    try:
        _write_batch(spark, spool, 0, _B0)
        q.processAllAvailable()
        _write_batch(spark, spool, 1, [(_ts(6, 0), "advance far")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start"], r["window_end"], r["token"], r["n"], r["rank"])
        for r in IdempotentParquetSink(out).read_committed(spark).collect()
    }
    batch_docs = spark.createDataFrame(
        _B0 + [(_ts(6, 0), "advance far")], "ts timestamp, text string"
    )
    twin = topk_per_window(
        windowed_term_counts(batch_docs, window="2 hours", slide="1 hour"),
        topk=3,
    )
    want = {
        (r["window_start"], r["window_end"], r["token"], r["n"], r["rank"])
        for r in twin.collect()
        if r["window_end"] <= _ts(5)  # watermark 05:00 → these closed
    }
    assert got == want
    # each _B0 event hour appears in two overlapping windows
    starts = {r[0] for r in got}
    assert len(starts) >= 3
