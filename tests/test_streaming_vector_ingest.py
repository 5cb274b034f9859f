"""Streaming vector-index ingest (streaming/vector_ingest.py):
stream ≡ batch-twin vector rows, exactly-once restart, and bucket
agreement with the batch sign-LSH bucketing."""

from __future__ import annotations

import os

from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.vector_ingest import (
    attach_vector_ingest,
    chunk_embed_rows,
)

_B0 = [
    (1, "spark streams join windows " * 12),  # long -> several chunks
    (2, "short doc"),
]
_B1 = [
    (3, "flink state checkpoints " * 15),
    (4, ""),  # empty -> no chunks
]


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
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


def _canon(rows):
    return sorted(
        (
            r["doc_id"],
            r["chunk_id"],
            r["n_tokens"],
            r["bucket"],
            tuple(r["embedding"]),
        )
        for r in rows
    )


def test_stream_matches_batch_twin(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "vec")
    q = attach_vector_ingest(
        _stream(spark, spool), out, checkpoint_dir=str(tmp_path / "ck")
    )
    try:
        _write_batch(spark, spool, 0, _B0)
        q.processAllAvailable()
        _write_batch(spark, spool, 1, _B1)
        q.processAllAvailable()
    finally:
        q.stop()
    got = _canon(IdempotentParquetSink(out).read_committed(spark).collect())
    batch_docs = spark.createDataFrame(
        _B0 + _B1, "doc_id bigint, text string"
    )
    want = _canon(chunk_embed_rows(batch_docs).collect())
    assert got == want
    assert got, "expected vector rows"
    # empty doc contributed nothing; long docs contributed >1 chunk
    doc_ids = [g[0] for g in got]
    assert 4 not in doc_ids
    assert doc_ids.count(1) > 1


def test_buckets_agree_with_sign_of_embedding(spark):
    """The stream's bucket column must be the sign-LSH over the first
    8 dims — re-derive it INDEPENDENTLY in Python from the emitted
    embedding's signs (bit d set ⟺ component d > 0; the zero vector
    gets bucket 0) and compare row-for-row."""
    docs = spark.createDataFrame(_B0, "doc_id bigint, text string")
    for r in chunk_embed_rows(docs).collect():
        want = sum(1 << d for d in range(8) if r["embedding"][d] > 0)
        assert r["bucket"] == want, (r["doc_id"], r["chunk_id"])


def test_restart_replay_is_exactly_once(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "vec")
    ck = str(tmp_path / "ck")
    summaries: list[dict] = []

    q = attach_vector_ingest(
        _stream(spark, spool), out, on_summary=summaries.append,
        checkpoint_dir=ck,
    )
    try:
        _write_batch(spark, spool, 0, _B0)
        q.processAllAvailable()
    finally:
        q.stop()
    n_rows_before = IdempotentParquetSink(out).read_committed(spark).count()

    q2 = attach_vector_ingest(
        _stream(spark, spool), out, on_summary=summaries.append,
        checkpoint_dir=ck,
    )
    try:
        q2.processAllAvailable()  # replays the committed batch
        _write_batch(spark, spool, 1, _B1)
        q2.processAllAvailable()
    finally:
        q2.stop()

    committed = IdempotentParquetSink(out).read_committed(spark)
    rows = [
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["bucket"],
         tuple(r["embedding"]))
        for r in committed.collect()
    ]
    assert len(rows) == len(set(rows)), "replay duplicated vector rows"
    assert committed.count() > n_rows_before  # _B1's chunks arrived
    ids = [s["batch_id"] for s in summaries]
    assert len(ids) == len(set(ids)), "summary re-fired on replay"


def test_probe_fresh_serves_streamed_docs_and_matches_brute_force(
    spark, tmp_path
):
    """End-to-end ingest → serve: stream docs B into the sink, probe
    base(A) ∪ tail(B), and pin (1) exact equality with a brute-force
    top-k over the full A∪B chunk index built in one batch, and (2)
    freshness — a query vector taken FROM a streamed doc's chunk must
    retrieve that chunk at rank 1."""
    from streamlit_flink_demo_spark.streaming.vector_ingest import (
        probe_fresh,
    )

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "vec")
    q = attach_vector_ingest(
        _stream(spark, spool), out, checkpoint_dir=str(tmp_path / "ck")
    )
    try:
        _write_batch(spark, spool, 0, _B1)  # doc 3 arrives by stream
        q.processAllAvailable()
    finally:
        q.stop()

    base_docs = spark.createDataFrame(_B0, "doc_id bigint, text string")
    base_rows = chunk_embed_rows(base_docs)
    # query = the embedding of streamed doc 3's first chunk
    all_docs = spark.createDataFrame(
        _B0 + _B1, "doc_id bigint, text string"
    )
    full = chunk_embed_rows(all_docs)
    q3 = (
        full.filter("doc_id = 3 AND chunk_id = 0")
        .selectExpr("CAST(99 AS BIGINT) AS q_id", "embedding AS q_emb")
    )
    got = sorted(
        tuple(r)
        for r in probe_fresh(spark, base_rows, out, q3, k=3).collect()
    )
    # brute force over the one-shot batch index of A∪B
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.functions.vectors import dot

    scored = F.broadcast(q3).join(full, how="cross").select(
        "q_id",
        "doc_id",
        "chunk_id",
        dot(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
    )
    w = W.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id"), F.col("chunk_id")
    )
    want = sorted(
        tuple(r)
        for r in scored.withColumn(
            "rk", F.row_number().over(w).cast("bigint")
        )
        .filter("rk <= 3")
        .collect()
    )
    assert got == want
    # freshness: the streamed chunk itself is the top hit
    top = min(got, key=lambda t: t[4])
    assert (top[1], top[2]) == (3, 0)
