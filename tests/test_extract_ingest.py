"""Ingest-time extraction door-check (streaming/extract_ingest.py):
stream ≡ batch twin, exactly-once restart replay, boilerplate-only
rows land with accounting."""

from __future__ import annotations

import os

from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.extract_ingest import (
    attach_extract_stream,
    extract_batch,
)

_B0 = [
    (
        1,
        "<p>first arriving document with plenty of real words</p>"
        "<script>var x = 1;</script>"
        "<footer>Copyright 2099 Crawl Corp | Legal</footer>",
    ),
    (2, "<nav>Home | About</nav><div>Share</div>"),  # boilerplate-only
]
_B1 = [
    (
        3,
        "<p>second batch content with &amp; entity and enough words</p>",
    ),
]


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def _stream(spark, spool):
    return (
        spark.readStream.schema("doc_id bigint, html string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )


def _canon(rows):
    return sorted(
        (r["doc_id"], r["n_lines_raw"], r["n_lines_kept"], r["extract_text"])
        for r in rows
    )


def test_stream_matches_batch_twin(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "extracted")
    summaries: list[dict] = []
    q = attach_extract_stream(
        _stream(spark, spool), out, on_summary=summaries.append,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        _write_batch(spark, spool, 0, _B0)
        q.processAllAvailable()
        _write_batch(spark, spool, 1, _B1)
        q.processAllAvailable()
    finally:
        q.stop()

    got = _canon(IdempotentParquetSink(out).read_committed(spark).collect())
    want = _canon(
        extract_batch(
            spark.createDataFrame(_B0 + _B1, "doc_id bigint, html string")
        ).collect()
    )
    assert got == want

    # boilerplate-only doc 2 LANDED (gate decides drops, not the
    # extractor) with zero kept lines; entity decoded in doc 3
    by_id = {r[0]: r for r in got}
    assert by_id[2][2] == 0 and by_id[2][3] == ""
    assert "&" in by_id[3][3] and "&amp;" not in by_id[3][3]
    assert "Copyright" not in by_id[1][3]

    assert [s["batch_id"] for s in summaries] == [0, 1]
    assert summaries[0]["n_docs"] == 2
    assert summaries[0]["n_boilerplate_only"] == 1
    assert summaries[0]["chars_kept"] == len(by_id[1][3])


def test_restart_replay_is_exactly_once(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "extracted")
    ck = str(tmp_path / "ck")
    summaries: list[dict] = []

    q = attach_extract_stream(
        _stream(spark, spool), out, on_summary=summaries.append,
        checkpoint_dir=ck,
    )
    try:
        _write_batch(spark, spool, 0, _B0)
        q.processAllAvailable()
    finally:
        q.stop()

    q2 = attach_extract_stream(
        _stream(spark, spool), out, on_summary=summaries.append,
        checkpoint_dir=ck,
    )
    try:
        q2.processAllAvailable()  # replays committed batch 0
        _write_batch(spark, spool, 1, _B1)
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = _canon(IdempotentParquetSink(out).read_committed(spark).collect())
    assert len(rows) == len(set(rows)) == 3  # no duplicates, B1 arrived
    assert [s["batch_id"] for s in summaries] == [0, 1]
