"""Streaming takedown ingest (streaming/takedown_ingest.py): probe
after a streamed takedown ≡ fresh build without the keys, exactly-once
tombstoning across restart replay, and compaction retiring the
anti-join with an identical probe."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators.incremental import (
    _read_meta,
    build_lsh_base_index,
    build_lsh_full_index,
    compact_index,
    read_index_data,
    read_live_index,
    _split_col,
    _NEW_PCT,
)
from streamlit_flink_demo_spark.operators.similarity import lsh_probe_topk
from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.sources.catalog import load_spread, load_table
from streamlit_flink_demo_spark.streaming.takedown_ingest import (
    attach_takedown_stream,
)


@pytest.fixture()
def artifact_root(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    import streamlit_flink_demo_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "_ARTIFACT_ROOT", root)
    return root


def _write_key_batch(spark, spool, n, ids):
    df = spark.createDataFrame([(int(i),) for i in ids], "vec_id bigint")
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def _key_stream(spark, spool):
    return (
        spark.readStream.schema("vec_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )


def _probe_rows(spark, sf_dir, index_df):
    e = load_table(spark, sf_dir, "embeddings").filter(
        _split_col() < _NEW_PCT
    )
    return sorted(
        (r["q_id"], r["vec_id"], round(r["cos_sim"], 9), r["rk"])
        for r in lsh_probe_topk(e, index_df).collect()
    )


def _takedown_ids(spark, sf_dir):
    return [
        r["vec_id"]
        for r in load_spread(spark, sf_dir, "embeddings")
        .filter(_split_col() >= _NEW_PCT)
        .select("vec_id")
        .collect()
    ]


def test_streamed_takedown_matches_fresh_build_without_keys(
    spark, sf_dir, artifact_root, tmp_path
):
    """The door-check's correctness bar: after the takedown stream
    consumes the 10% slice's keys (two batches), probing the
    full-corpus artifact must yield EXACTLY what a fresh build over
    the surviving 90% yields — the batch tombstone oracle's claim,
    now arriving through the stream."""
    path = build_lsh_full_index(spark, sf_dir)
    base = build_lsh_base_index(spark, sf_dir)  # the A-only fresh build
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    ledger = str(tmp_path / "ledger")
    ck = str(tmp_path / "ck")
    ids = _takedown_ids(spark, sf_dir)
    assert len(ids) > 2
    summaries: list[dict] = []

    q = attach_takedown_stream(
        _key_stream(spark, spool),
        path,
        ledger,
        on_summary=summaries.append,
        checkpoint_dir=ck,
    )
    try:
        _write_key_batch(spark, spool, 0, ids[: len(ids) // 2])
        q.processAllAvailable()
        _write_key_batch(spark, spool, 1, ids[len(ids) // 2 :])
        q.processAllAvailable()
    finally:
        q.stop()

    got = _probe_rows(spark, sf_dir, read_live_index(spark, path))
    want = _probe_rows(spark, sf_dir, read_index_data(spark, base))
    assert got == want
    assert [s["batch_id"] for s in summaries] == [0, 1]
    assert sum(s["n_keys"] for s in summaries) == len(ids)
    assert all(s["tombstoned"] for s in summaries)

    # compaction drops the rows physically; the probe is unchanged
    assert compact_index(spark, path, partition_cols=("band", "bsig"))
    meta = _read_meta(os.path.realpath(path))
    assert not meta.get("deltas")
    assert _probe_rows(spark, sf_dir, read_live_index(spark, path)) == want


def test_restart_replay_tombstones_exactly_once(
    spark, sf_dir, artifact_root, tmp_path
):
    """Kill the query after batch 0, restart on the same checkpoint:
    the replayed batch must not stack a second tombstone delta, the
    ledger must not duplicate keys, and the summary must not re-fire."""
    path = build_lsh_full_index(spark, sf_dir)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    ledger = str(tmp_path / "ledger")
    ck = str(tmp_path / "ck")
    ids = _takedown_ids(spark, sf_dir)
    summaries: list[dict] = []

    q = attach_takedown_stream(
        _key_stream(spark, spool), path, ledger,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        _write_key_batch(spark, spool, 0, ids[:2])
        q.processAllAvailable()
    finally:
        q.stop()
    n_deltas = len(_read_meta(os.path.realpath(path))["deltas"])

    q2 = attach_takedown_stream(
        _key_stream(spark, spool), path, ledger,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        q2.processAllAvailable()  # replays committed batch 0
        _write_key_batch(spark, spool, 1, ids[2:4])
        q2.processAllAvailable()
    finally:
        q2.stop()

    meta = _read_meta(os.path.realpath(path))
    keys = [d["key"] for d in meta["deltas"]]
    assert len(keys) == len(set(keys)) == n_deltas + 1
    ledger_ids = [
        r["vec_id"]
        for r in IdempotentParquetSink(ledger)
        .read_committed(spark)
        .collect()
    ]
    assert sorted(ledger_ids) == sorted(ids[:4])
    assert [s["batch_id"] for s in summaries] == [0, 1]

    live = read_live_index(spark, path)
    gone = live.filter(F.col("vec_id").isin([int(i) for i in ids[:4]]))
    assert gone.count() == 0


def test_streamed_takedown_reaches_gram_index_span_rewrite(
    spark, artifact_root, tmp_path
):
    """Cross-family integration: a takedown key stream pointed at the
    GRAM index (key_col='doc_id') removes the corpus document's
    positions from every later span rewrite — the arriving batch that
    WOULD have been cut against it lands uncut, exactly as if the
    document had never been indexed."""
    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
        init_gram_index,
        read_gram_index,
        span_rewrite_batch,
    )

    block = "A-REPEATED-CORPUS-SPAN-0123456789-ABCDEFGHIJ"  # 44 chars
    corpus = spark.createDataFrame(
        [
            (101, f"corpus document carrying {block} inside it"),
            (102, "another corpus document with only its own words"),
        ],
        "doc_id bigint, text string",
    )
    art = str(tmp_path / "gram_idx")
    init_gram_index(corpus, art)
    batch = spark.createDataFrame(
        [(7, f"arrival that reuses {block} verbatim")],
        "doc_id bigint, text string",
    )
    # before the takedown: the arrival is cut against doc 101
    pre = span_rewrite_batch(batch, read_gram_index(spark, art)).collect()
    assert pre[0]["chars_removed"] >= len(block) - 1

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    q = attach_takedown_stream(
        _key_stream(spark, spool).withColumnRenamed("vec_id", "doc_id"),
        art,
        str(tmp_path / "ledger"),
        key_col="doc_id",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        _write_key_batch(spark, spool, 0, [101])
        q.processAllAvailable()
    finally:
        q.stop()

    # after: rewrite against the live index ≡ rewrite against a fresh
    # index built without doc 101 — the arrival lands uncut
    post = span_rewrite_batch(batch, read_gram_index(spark, art)).collect()
    want = span_rewrite_batch(
        batch, gram_index_rows(corpus.filter("doc_id <> 101"))
    ).collect()
    assert post[0]["chars_removed"] == 0
    assert post[0]["clean_text"] == want[0]["clean_text"]
    assert post[0]["n_spans_removed"] == want[0]["n_spans_removed"]
