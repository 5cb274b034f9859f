"""Streaming ingest-time near-dup flagging: per-batch flags equal the
batch-computed flags over the same accumulated documents (the
dedup_incremental equivalence), near-dups of corpus docs are caught,
clean docs pass unflagged."""

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


def test_stream_flags_equal_batch_flags(spark, sf_dir, tmp_path, corpus):
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.functions.hashing import u60
    from streamlit_flink_demo_spark.operators.dedup import (
        _band_keys_col,
        minhash_signatures,
    )
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
    # spool the "new" slice as two parquet micro-batches
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    pdf = new_docs.toPandas().sort_values("doc_id")
    half = len(pdf) // 2
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        part_path = os.path.join(spool, f"b{i:04d}.parquet")
        staging = os.path.join(spool, f"_s{i}")
        spark.createDataFrame(part).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        f = next(x for x in os.listdir(staging) if x.endswith(".parquet"))
        os.replace(os.path.join(staging, f), part_path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    got: dict[int, tuple] = {}

    def on_flags(rows, batch_id):
        for r in rows:
            got[r["doc_id"]] = (r["dup_of"], r["est_jaccard"])

    q = attach_near_dup_stream(
        stream, corpus, on_flags, checkpoint_dir=str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

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


def test_planted_near_dup_is_caught(spark, tmp_path, corpus):
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
    os.makedirs(spool)
    staging = os.path.join(spool, "_s0")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(staging)
    f = next(x for x in os.listdir(staging) if x.endswith(".parquet"))
    os.replace(os.path.join(staging, f), os.path.join(spool, "b0.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    got = {}

    def on_flags(rows_, batch_id):
        for r in rows_:
            got[r["doc_id"]] = (r["dup_of"], r["est_jaccard"])

    q = attach_near_dup_stream(stream, corpus, on_flags)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got[900001][0] == src["doc_id"]  # exact copy → its source
    assert got[900001][1] == 1.0
    assert got[900002] == (None, None)  # clean doc passes unflagged
