"""Streaming ingest-time near-dup flagging: flags land in the
IdempotentParquetSink exactly-once (including across a restart), equal
the batch-computed flags over the same documents (the dedup_incremental
equivalence), near-dups of corpus docs are caught, clean docs pass
unflagged, and the driver sees only the bounded per-batch summary —
never the flag rows themselves (VERDICT r8 item 4)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def corpus(spark, sf_dir):
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.sources.catalog import load_table

    # corpus = the stable 90% slice (dedup_incremental's convention)
    from streamlit_flink_demo_spark.functions.hashing import u60

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.filter(u60(F.col("doc_id").cast("string")) % 100 < 90)


def _spool_batches(spark, spool: str, parts, schema=None) -> None:
    os.makedirs(spool, exist_ok=True)
    for i, part in enumerate(parts):
        part_path = os.path.join(spool, f"b{i:04d}.parquet")
        staging = os.path.join(spool, f"_s{i}")
        df = (
            spark.createDataFrame(part, schema)
            if schema is not None
            else spark.createDataFrame(part)
        )
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        f = next(x for x in os.listdir(staging) if x.endswith(".parquet"))
        os.replace(os.path.join(staging, f), part_path)


def _doc_stream(spark, spool: str):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )


def test_stream_flags_equal_batch_flags(spark, sf_dir, tmp_path, corpus):
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.functions.hashing import u60
    from streamlit_flink_demo_spark.operators.dedup import (
        _band_keys_col,
        minhash_signatures,
    )
    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
    from streamlit_flink_demo_spark.sources.catalog import load_table
    from streamlit_flink_demo_spark.streaming.dedup_ingest import (
        attach_near_dup_stream,
        near_dup_flags_batch,
    )

    new_docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(u60(F.col("doc_id").cast("string")) % 100 >= 90)
    )
    spool = str(tmp_path / "spool")
    pdf = new_docs.toPandas().sort_values("doc_id")
    half = len(pdf) // 2
    _spool_batches(spark, spool, (pdf.iloc[:half], pdf.iloc[half:]))

    flags_path = str(tmp_path / "flags")
    summaries: list[dict] = []
    q = attach_near_dup_stream(
        _doc_stream(spark, spool),
        corpus,
        flags_path,
        on_summary=summaries.append,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["doc_id"]: (r["dup_of"], r["est_jaccard"])
        for r in IdempotentParquetSink(flags_path)
        .read_committed(spark)
        .collect()
    }

    # batch twin over the full new slice at once
    corpus_sigs = minhash_signatures(corpus)
    corpus_bands = corpus_sigs.select(
        F.col("doc_id").alias("old_doc"),
        F.explode(_band_keys_col()).alias("band_key"),
    )
    want = {
        r["doc_id"]: (r["dup_of"], r["est_jaccard"])
        for r in near_dup_flags_batch(
            new_docs, corpus_sigs, corpus_bands
        ).collect()
    }
    assert got == want
    assert len(got) == len(pdf)  # every new doc flagged exactly once

    # bounded summaries: one per batch, counts add up to the corpus
    assert sorted(s["batch_id"] for s in summaries) == [0, 1]
    assert sum(s["n_docs"] for s in summaries) == len(pdf)
    n_flagged = sum(1 for v in got.values() if v[0] is not None)
    assert sum(s["n_flagged"] for s in summaries) == n_flagged


def test_flags_exactly_once_across_restart(spark, tmp_path, corpus):
    """Stop the stream, restart from the same checkpoint with one more
    spool file: the committed batch replays through foreachBatch but
    the sink rewrites nothing — total flag rows equal total documents,
    no duplicates."""
    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
    from streamlit_flink_demo_spark.streaming.dedup_ingest import (
        attach_near_dup_stream,
    )

    spool = str(tmp_path / "spool")
    ck = str(tmp_path / "ck")
    flags_path = str(tmp_path / "flags")
    rows0 = [(910001, "alpha beta gamma delta epsilon zeta"),
             (910002, "eta theta iota kappa lambda mu")]
    _spool_batches(spark, spool, [rows0], schema="doc_id long, text string")

    q = attach_near_dup_stream(
        _doc_stream(spark, spool), corpus, flags_path, checkpoint_dir=ck
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = IdempotentParquetSink(flags_path)
    first_ids = set(sink.committed_ids())
    assert first_ids

    # second run: same checkpoint, one new file
    staging = os.path.join(spool, "_s9")
    spark.createDataFrame(
        [(910003, "nu xi omicron pi rho sigma tau")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    f = next(x for x in os.listdir(staging) if x.endswith(".parquet"))
    os.replace(os.path.join(staging, f), os.path.join(spool, "b9999.parquet"))

    q2 = attach_near_dup_stream(
        _doc_stream(spark, spool), corpus, flags_path, checkpoint_dir=ck
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    flags = sink.read_committed(spark).collect()
    assert len(flags) == 3  # 2 + 1, no replay duplicates
    assert {r["doc_id"] for r in flags} == {910001, 910002, 910003}


def test_planted_near_dup_is_caught(spark, tmp_path, corpus):
    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
    from streamlit_flink_demo_spark.streaming.dedup_ingest import (
        attach_near_dup_stream,
    )

    # plant: one doc copied verbatim from the corpus (id shifted), one
    # clean synthetic doc
    src = corpus.limit(1).collect()[0]
    rows = [
        (900001, src["text"]),
        (900002, "entirely novel words nowhere else present at all "
                 "zebra quark flume "
                 + " ".join(f"tok{i}" for i in range(30))),
    ]
    spool = str(tmp_path / "spool")
    _spool_batches(spark, spool, [rows], schema="doc_id long, text string")

    flags_path = str(tmp_path / "flags")
    q = attach_near_dup_stream(
        _doc_stream(spark, spool), corpus, flags_path
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: (r["dup_of"], r["est_jaccard"])
        for r in IdempotentParquetSink(flags_path)
        .read_committed(spark)
        .collect()
    }
    assert got[900001][0] == src["doc_id"]  # exact copy → its source
    assert got[900001][1] == 1.0
    assert got[900002] == (None, None)  # clean doc passes unflagged


def test_hot_path_has_no_flag_collect():
    """Source-level pin for the r9 rework: the ingest hot path must not
    collect flag rows on the driver (the only driver-side read is the
    one-row summary aggregate)."""
    import inspect

    from streamlit_flink_demo_spark.streaming import dedup_ingest

    src = inspect.getsource(dedup_ingest.attach_near_dup_stream)
    assert "flags.collect()" not in src
    assert "IdempotentParquetSink" in inspect.getsource(dedup_ingest)


# --------------------------------------------------------------------------
# Semantic (embedding) ingest tier — round 10
# --------------------------------------------------------------------------


def test_semantic_stream_flags_equal_batch_flags(spark, sf_dir, tmp_path, corpus):
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.functions.hashing import u60
    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
    from streamlit_flink_demo_spark.sources.catalog import load_table
    from streamlit_flink_demo_spark.streaming.dedup_ingest import (
        attach_semantic_dedup_stream,
        corpus_embedding_buckets,
        semantic_dup_flags_batch,
    )

    new_docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(u60(F.col("doc_id").cast("string")) % 100 >= 90)
    )
    spool = str(tmp_path / "spool")
    pdf = new_docs.toPandas().sort_values("doc_id")
    half = len(pdf) // 2
    _spool_batches(spark, spool, (pdf.iloc[:half], pdf.iloc[half:]))

    flags_path = str(tmp_path / "flags")
    summaries: list[dict] = []
    q = attach_semantic_dedup_stream(
        _doc_stream(spark, spool),
        corpus,
        flags_path,
        on_summary=summaries.append,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["doc_id"]: (r["dup_of"], r["cos_sim"])
        for r in IdempotentParquetSink(flags_path)
        .read_committed(spark)
        .collect()
    }
    want = {
        r["doc_id"]: (r["dup_of"], r["cos_sim"])
        for r in semantic_dup_flags_batch(
            new_docs, corpus_embedding_buckets(corpus)
        ).collect()
    }
    assert got == want
    assert len(got) == len(pdf)
    assert sorted(s["batch_id"] for s in summaries) == [0, 1]
    assert sum(s["n_docs"] for s in summaries) == len(pdf)


def test_semantic_planted_paraphrase_is_caught(spark, tmp_path, corpus):
    """A word-order permutation of a corpus doc has the IDENTICAL
    bag-of-words embedding (cosine 1.0) but a different shingle set —
    the case the semantic tier exists for; a clean doc passes."""
    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
    from streamlit_flink_demo_spark.streaming.dedup_ingest import (
        attach_semantic_dedup_stream,
    )

    src = corpus.limit(1).collect()[0]
    words = src["text"].split()
    rows = [
        (900001, " ".join(reversed(words))),
        (900002, "entirely novel vocabulary nowhere else present "
                 + " ".join(f"qzx{i}" for i in range(30))),
    ]
    spool = str(tmp_path / "spool")
    _spool_batches(spark, spool, [rows], schema="doc_id long, text string")

    flags_path = str(tmp_path / "flags")
    q = attach_semantic_dedup_stream(
        _doc_stream(spark, spool), corpus, flags_path
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: (r["dup_of"], r["cos_sim"])
        for r in IdempotentParquetSink(flags_path)
        .read_committed(spark)
        .collect()
    }
    assert got[900001][0] is not None  # permuted copy flagged
    assert got[900001][1] >= 0.97
    assert got[900002] == (None, None)


def test_semantic_summaries_fire_once_across_restart(spark, tmp_path, corpus):
    """Replayed committed batches must NOT re-fire on_summary (ADVICE
    r9: summaries are exactly-once per batch id, keyed off the sink's
    committed/replayed status)."""
    from streamlit_flink_demo_spark.streaming.dedup_ingest import (
        attach_semantic_dedup_stream,
    )

    spool = str(tmp_path / "spool")
    ck = str(tmp_path / "ck")
    flags_path = str(tmp_path / "flags")
    rows0 = [(910001, "alpha beta gamma delta epsilon zeta")]
    _spool_batches(spark, spool, [rows0], schema="doc_id long, text string")

    summaries: list[dict] = []
    q = attach_semantic_dedup_stream(
        _doc_stream(spark, spool), corpus, flags_path,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert [s["batch_id"] for s in summaries] == [0]

    # restart from the same checkpoint with one new file: batch 0 may
    # replay through foreachBatch, but only batch 1 may summarize
    staging = os.path.join(spool, "_s9")
    import pyspark.sql  # noqa: F401

    spark.createDataFrame(
        [(910003, "nu xi omicron pi rho sigma tau")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    f = next(x for x in os.listdir(staging) if x.endswith(".parquet"))
    os.replace(os.path.join(staging, f), os.path.join(spool, "b9999.parquet"))

    q2 = attach_semantic_dedup_stream(
        _doc_stream(spark, spool), corpus, flags_path,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert sorted(s["batch_id"] for s in summaries) == [0, 1]
