"""Ingest-time CDC coverage (streaming/cdc_ingest.py): stream ≡ batch
twin, artifact probes with compaction growth (no reattach), and the
exactly-once restart contract for rows and summaries."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators.compaction import (
    compact_cdc_ingest,
)
from streamlit_flink_demo_spark.operators.dedup import (
    cdc_coverage_batch,
    cdc_hash_rows,
    init_cdc_index,
)
from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.cdc_ingest import (
    attach_cdc_coverage_stream,
)

# the corpus carries one long block so arrivals repeating it share
# whole CDC chunks; "* 4" pushes it across several chunk boundaries
_SHARED = (
    "the-shared-corpus-passage-0123456789-abcdefghij-KLMNOPQRST " * 4
)
_CORPUS = [
    (101, f"corpus document one holding {_SHARED} and a tail"),
    (102, "corpus document two with entirely unrelated words"),
]


@pytest.fixture()
def artifact_root(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    import streamlit_flink_demo_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "_ARTIFACT_ROOT", root)
    return root


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _write_batch(spark, spool, n, rows):
    df = _docs(spark, rows)
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def _stream(spark, spool):
    return (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )


_BATCH = [
    (1, f"arrival that repeats {_SHARED} nearly wholesale"),
    (2, "arrival with completely fresh content and new words only"),
]


def test_batch_coverage_flags_shared_content(spark):
    corpus = _docs(spark, _CORPUS)
    got = {
        r["doc_id"]: r
        for r in cdc_coverage_batch(
            _docs(spark, _BATCH), cdc_hash_rows(corpus)
        ).collect()
    }
    assert got[1]["n_dup_chunks"] >= 1  # the shared block's chunks hit
    assert got[1]["dup_chars"] >= 60
    assert got[2]["dup_chars"] == 0 and got[2]["dup_frac_r"] == 0.0


def test_stream_equals_batch_twin_and_exactly_once(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "coverage")
    ck = str(tmp_path / "ck")
    corpus = _docs(spark, _CORPUS)
    summaries = []
    q = attach_cdc_coverage_stream(
        _stream(spark, spool), corpus, out,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        _write_batch(spark, spool, 0, _BATCH)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = sorted(
        map(tuple, IdempotentParquetSink(out).read_committed(spark).collect())
    )
    want = sorted(
        map(
            tuple,
            cdc_coverage_batch(
                _docs(spark, _BATCH), cdc_hash_rows(corpus)
            ).collect(),
        )
    )
    assert rows == want
    assert len(summaries) == 1
    assert summaries[0]["n_docs"] == 2
    assert summaries[0]["dup_chars"] >= 60

    # restart from the same checkpoint: nothing rewritten, no re-fire
    q2 = attach_cdc_coverage_stream(
        _stream(spark, spool), corpus, out,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows2 = sorted(
        map(tuple, IdempotentParquetSink(out).read_committed(spark).collect())
    )
    assert rows2 == rows
    assert len(summaries) == 1


def test_artifact_mode_compaction_grows_coverage_no_reattach(
    spark, artifact_root, tmp_path
):
    """Through the STREAM on the persisted artifact: batch 0's fresh
    content is folded (compact_cdc_ingest over the landed docs sink),
    and batch 1 repeating that content is flagged — same attached
    query, no reattach. Coverage equals the batch recompute on the
    grown corpus."""
    corpus = _docs(spark, _CORPUS)
    art = str(tmp_path / "cdc_idx")
    init_cdc_index(corpus, art)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "coverage")
    ck = str(tmp_path / "ck")
    docs_sink_path = str(tmp_path / "landed_docs")
    docs_sink = IdempotentParquetSink(docs_sink_path)

    fresh = "a-brand-new-repeated-passage-9876543210-zyxwvuts " * 4
    b0 = [(11, f"first arrival introducing {fresh} to the corpus")]
    b1 = [(12, f"second arrival reusing {fresh} verbatim")]

    q = attach_cdc_coverage_stream(
        _stream(spark, spool), None, out,
        checkpoint_dir=ck, cdc_index_path=art,
    )
    try:
        _write_batch(spark, spool, 0, b0)
        q.processAllAvailable()
        docs_sink(_docs(spark, b0), 0)  # the landed-document store
        digest = compact_cdc_ingest(spark, art, docs_sink_path)
        assert digest["folded_batches"] == [0]
        _write_batch(spark, spool, 1, b1)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r["doc_id"]: r
        for r in IdempotentParquetSink(out).read_committed(spark).collect()
    }
    assert rows[11]["dup_chars"] == 0  # fresh at first sight
    assert rows[12]["dup_chars"] >= 60  # flagged against ingested doc
    want = {
        r["doc_id"]: r
        for r in cdc_coverage_batch(
            _docs(spark, b1),
            cdc_hash_rows(corpus.unionByName(_docs(spark, b0))),
        ).collect()
    }
    assert tuple(rows[12]) == tuple(want[12])
    # idempotent re-fold: no-op
    assert compact_cdc_ingest(spark, art, docs_sink_path)[
        "folded_batches"
    ] == []
