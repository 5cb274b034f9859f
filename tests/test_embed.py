"""Batch embedding encoder (operators/embed.py).

The deterministic tier's value parity vs DuckDB is covered by
tests/test_oracle_parity.py (docs_embed / docs_embed_semdedup are
registered with oracles); these tests pin the contracts parity can't
see: the encoder's geometric invariants, the composed pipeline's
consistency with its own stages, the real-tier mapInPandas plumbing
(via an injected fake encoder — torch is not installable here), and
the plan shape (no shuffle in the encode stage).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators import embed
from streamlit_flink_demo_spark.operators.embed import (
    _EMB_DIM,
    _EMB_TAU,
    docs_embed,
    docs_embed_semdedup,
    encode_documents,
)


def test_embed_unit_norm_and_dim(spark, sf_dir):
    rows = docs_embed(spark, sf_dir).collect()
    assert rows, "encoder produced no rows"
    for r in rows[:50]:
        assert len(r.embedding) == _EMB_DIM
        n = math.sqrt(sum(x * x for x in r.embedding))
        if r.l2_norm > 0:
            assert abs(n - 1.0) < 1e-9, "embedding not unit-norm"
        else:
            assert all(x == 0.0 for x in r.embedding)


def test_embed_covers_every_document(spark, sf_dir):
    from streamlit_flink_demo_spark.sources.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert docs_embed(spark, sf_dir).count() == n_docs


def test_embed_deterministic_across_runs(spark, sf_dir):
    a = {r.doc_id: list(r.embedding) for r in docs_embed(spark, sf_dir).collect()}
    b = {r.doc_id: list(r.embedding) for r in docs_embed(spark, sf_dir).collect()}
    assert a == b


def test_embed_identical_text_identical_vector(spark):
    """The dedup-enabling property: same token bag -> same vector."""
    df = spark.createDataFrame(
        [(1, "spark join merge sort"), (2, "spark join merge sort"), (3, "other words entirely")],
        "doc_id bigint, text string",
    )
    df.write.mode("overwrite").parquet("/tmp/embed_docs_tiny/documents.parquet")
    out = {
        r.doc_id: list(r.embedding)
        for r in embed._embed_frame(spark, "/tmp/embed_docs_tiny").collect()
    }
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_embed_plan_no_shuffle(spark, sf_dir):
    """The encode stage is map-only: no Exchange in the physical plan
    (load_spread's byte-gated repartition stays off at test SF) and no
    Python evaluation anywhere."""
    plan = (
        docs_embed(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_semdedup_drops_within_summary_bounds(spark, sf_dir):
    rows = docs_embed_semdedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dropped < r.n_docs or (r.n_docs == 1 and r.n_dropped == 0)
        assert r.kept_checksum + r.dropped_checksum >= 0


def test_semdedup_composes_with_encoder(spark, sf_dir):
    """Bucket populations in the composed query must equal a direct
    recount over the encoder frame — the two stages share one
    definition (_embed_frame), and this pins it."""
    emb = embed._embed_frame(spark, sf_dir)
    bucket = sum(
        F.when(F.col("v")[d] > 0, F.lit(1 << d)).otherwise(F.lit(0))
        for d in range(embed._BKT_BITS)
    ).cast("bigint")
    direct = {
        r.bucket: r.n
        for r in emb.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n")).collect()
    }
    summary = {r.bucket: r.n_docs for r in docs_embed_semdedup(spark, sf_dir).collect()}
    assert direct == summary


# --------------------------------------------------------------------------
# Real-tier plumbing (injected encoder; torch absent in this container)
# --------------------------------------------------------------------------


def test_encode_documents_plumbing(spark, sf_dir):
    from streamlit_flink_demo_spark.sources.catalog import load_table

    # defined INSIDE the test: cloudpickle serializes it by value, so
    # the Python workers don't need tests/ on their path (the
    # by-reference bug driver_sim exists to catch)
    def _fake_encoder(texts: list) -> np.ndarray:
        return np.array(
            [[float(len(t)), float(t.count(" ")), 1.0] for t in texts]
        )

    d = load_table(spark, sf_dir, "documents").limit(100)
    out = encode_documents(d, encoder=_fake_encoder, batch_size=7)
    rows = out.collect()
    assert len(rows) == 100
    assert out.columns == ["doc_id", "embedding"]
    by_id = {r.doc_id: r.embedding for r in rows}
    for r in d.select("doc_id", "text").collect()[:10]:
        exp = _fake_encoder([r.text])[0]
        assert by_id[r.doc_id] == pytest.approx(list(exp))


def test_encode_documents_real_tier_gated(spark):
    """Without sentence-transformers installed, the default tier must
    fail with the install remedy, lazily (plan builds fine; the error
    surfaces at execution, on the executor)."""
    pytest.importorskip  # not used: we assert the ABSENCE path
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers installed; gate not exercisable")
    except ImportError:
        pass
    df = spark.createDataFrame([(1, "hello")], "doc_id bigint, text string")
    plan = encode_documents(df)  # builds without the package
    with pytest.raises(Exception) as ei:
        plan.collect()
    assert "sentence-transformers" in str(ei.value)


def test_encoder_runs_on_a_stream(spark, sf_dir, tmp_path):
    """The encoder is a stateless shuffle-free projection, so it
    attaches to a readStream source unchanged; the streamed encode of
    a document batch equals the batch encode (crawl-time embedding —
    the ingest-side twin of the batch pipeline)."""
    import os

    from streamlit_flink_demo_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(50)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    staging = os.path.join(spool, "_s")
    docs.coalesce(1).write.mode("overwrite").parquet(staging)
    f = next(x for x in os.listdir(staging) if x.endswith(".parquet"))
    os.replace(os.path.join(staging, f), os.path.join(spool, "b0.parquet"))

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        spool
    )
    q = (
        embed.embed_columns(stream)
        .select("doc_id", "n_tokens", "l2_norm", "embedding")
        .writeStream.format("memory")
        .queryName("enc_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: (r.n_tokens, r.l2_norm, list(r.embedding))
        for r in spark.sql("SELECT * FROM enc_stream").collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.l2_norm, list(r.embedding))
        for r in embed.embed_columns(docs).collect()
    }
    assert got == want
    assert len(got) == 50
