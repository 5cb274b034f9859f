"""Unified ingest compaction (operators/compaction.py): fold committed
streaming tails into standing index artifacts — equivalence with batch
recompute on the grown corpus, exactly-once across a crash
mid-compaction, idempotent replay, reconciling reader correct at every
instant of the fold cycle."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators.compaction import (
    compact_dedup_ingest,
    compact_span_ingest,
    compact_vector_ingest,
    fold_sink_into_index,
    folded_ids,
    read_index_with_tail,
    truncate_folded_tail,
)
from streamlit_flink_demo_spark.sinks import IdempotentParquetSink


@pytest.fixture()
def artifact_root(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    import streamlit_flink_demo_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "_ARTIFACT_ROOT", root)
    return root


_VEC_COLS = ["doc_id", "chunk_id", "n_tokens", "bucket", "embedding"]


def _rowset(df, cols=None):
    if cols is not None:
        df = df.select(*cols)
    return sorted(
        tuple(tuple(v) if isinstance(v, list) else v for v in row)
        for row in df.collect()
    )


# --------------------------------------------------------------------------
# Vector ingest: tail rows ARE the artifact rows; fold + truncate
# --------------------------------------------------------------------------


def _new_docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id bigint, text string")


def test_vector_fold_preserves_rows_and_truncates(
    spark, sf_dir, artifact_root, tmp_path
):
    from streamlit_flink_demo_spark.operators.retrieval import (
        build_chunk_embed_index,
        chunk_embed_rows,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table

    art = build_chunk_embed_index(spark, sf_dir)
    sink_path = str(tmp_path / "vec_tail")
    sink = IdempotentParquetSink(sink_path)
    d1 = _new_docs(
        spark,
        [(900001, "fresh streamed document one " * 12)],
    )
    d2 = _new_docs(
        spark,
        [(900002, "another streamed arrival entirely " * 11)],
    )
    sink(chunk_embed_rows(d1), 0)
    sink(chunk_embed_rows(d2), 1)

    base_docs = load_table(spark, sf_dir, "documents")
    want = _rowset(
        chunk_embed_rows(base_docs)
        .unionByName(chunk_embed_rows(d1))
        .unionByName(chunk_embed_rows(d2)),
        _VEC_COLS,
    )
    pre = _rowset(read_index_with_tail(spark, art, sink_path), _VEC_COLS)
    assert pre == want

    digest = compact_vector_ingest(spark, art, sink_path)
    assert digest["folded_batches"] == [0, 1]
    assert digest["truncated"] == 2
    post = _rowset(read_index_with_tail(spark, art, sink_path), _VEC_COLS)
    assert post == want  # fold + truncate changed NOTHING visible

    # truncated ids stay replay-protected under the watermark
    assert sink.committed_ids() == []
    assert sink(chunk_embed_rows(d1), 0) == "replayed"
    assert sink(chunk_embed_rows(d2), 1) == "replayed"

    # re-run: nothing new to fold, nothing truncated — pure no-op
    digest2 = compact_vector_ingest(spark, art, sink_path)
    assert digest2 == {
        "folded_batches": [],
        "folded_compactions": [],
        "truncated": 0,
    }
    assert _rowset(read_index_with_tail(spark, art, sink_path), _VEC_COLS) == want


def test_vector_fold_crash_between_commit_and_truncate(
    spark, sf_dir, artifact_root, tmp_path
):
    """Simulate the crash point: delta committed, tail NOT truncated.
    The reconciling reader must not double-count; resuming (re-fold →
    no-op, then truncate) converges to the same rows."""
    from streamlit_flink_demo_spark.operators.retrieval import (
        build_chunk_embed_index,
        chunk_embed_rows,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table

    art = build_chunk_embed_index(spark, sf_dir)
    sink_path = str(tmp_path / "vec_tail")
    sink = IdempotentParquetSink(sink_path)
    d1 = _new_docs(spark, [(900003, "crash window document " * 14)])
    sink(chunk_embed_rows(d1), 0)
    base_docs = load_table(spark, sf_dir, "documents")
    want = _rowset(
        chunk_embed_rows(base_docs).unionByName(chunk_embed_rows(d1)),
        _VEC_COLS,
    )

    def write(rows, staging):
        (
            rows.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(staging)
        )

    # "crash": fold commits the delta but truncation never runs
    fold_sink_into_index(
        spark, sink_path, art, write, key_prefix="vec", truncate=False
    )
    fb, _ = folded_ids(art)
    assert fb == {0}
    assert sink.committed_ids() == [0]  # tail still lists the batch
    mid = _rowset(read_index_with_tail(spark, art, sink_path), _VEC_COLS)
    assert mid == want  # NOT doubled

    # resume: re-fold is a no-op (same key), truncate completes
    digest = compact_vector_ingest(spark, art, sink_path)
    assert digest["folded_batches"] == []
    assert digest["truncated"] == 1
    assert _rowset(read_index_with_tail(spark, art, sink_path), _VEC_COLS) == want
    # second truncate: idempotent no-op
    assert truncate_folded_tail(sink_path, art) == 0


# --------------------------------------------------------------------------
# Span ingest: fold cleaned docs into the gram index; later batches
# are rewritten against earlier ingested documents
# --------------------------------------------------------------------------

_BLOCK = "THE-INGESTED-REPEATED-BLOCK-0123456789-ABCDEF"  # 45 chars


def test_span_fold_grows_corpus_for_later_batches(
    spark, artifact_root, tmp_path
):
    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
        init_gram_index,
        span_rewrite_batch,
    )

    corpus = _new_docs(
        spark, [(101, "standing corpus doc with only its own words")]
    )
    art = str(tmp_path / "gram_idx")
    init_gram_index(corpus, art)
    sink_path = str(tmp_path / "span_tail")
    sink = IdempotentParquetSink(sink_path)

    # batch 0 arrives: block is UNIQUE at this point -> lands uncut
    b0 = _new_docs(spark, [(1, f"first arrival with {_BLOCK} inside")])
    rows0 = span_rewrite_batch(
        b0, gram_index_rows(corpus)
    )
    sink(rows0, 0)
    landed0 = sink.read_committed(spark).collect()
    assert landed0[0]["n_spans_removed"] == 0
    assert landed0[0]["clean_text"] == f"first arrival with {_BLOCK} inside"

    digest = compact_span_ingest(spark, art, sink_path)
    assert digest["folded_batches"] == [0]
    assert digest["truncated"] == 0  # landed documents are the product
    assert sink.committed_ids() == [0]  # tail untouched

    # batch 1 repeats the block -> cut against the GROWN corpus
    from streamlit_flink_demo_spark.operators.suffix import read_gram_index

    b1 = _new_docs(spark, [(2, f"later arrival reusing {_BLOCK} verbatim")])
    got = span_rewrite_batch(b1, read_gram_index(spark, art))
    # batch recompute on the grown corpus: corpus ∪ cleaned batch-0 docs
    grown = corpus.unionByName(
        _new_docs(spark, [(1, landed0[0]["clean_text"])])
    )
    want = span_rewrite_batch(b1, gram_index_rows(grown))
    assert _rowset(got) == _rowset(want)
    assert got.collect()[0]["chars_removed"] >= len(_BLOCK) - 1

    # idempotent: nothing new -> no-op
    assert compact_span_ingest(spark, art, sink_path)[
        "folded_batches"
    ] == []


def test_span_fold_via_attached_stream_no_reattach(
    spark, artifact_root, tmp_path
):
    """End-to-end through the STREAM: batch 0 lands, compaction folds
    it, batch 1 (same attached query, no reattach) is rewritten
    against the ingested document."""
    from streamlit_flink_demo_spark.operators.suffix import init_gram_index
    from streamlit_flink_demo_spark.streaming.span_ingest import (
        attach_span_rewrite_stream,
    )

    corpus = _new_docs(spark, [(101, "corpus words of the standing set")])
    art = str(tmp_path / "gram_idx")
    init_gram_index(corpus, art)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "rewritten")
    ck = str(tmp_path / "ck")

    def write_batch(n, rows):
        df = _new_docs(spark, rows)
        staging = os.path.join(spool, f"_stage_{n}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(staging, part),
            os.path.join(spool, f"b{n:04d}.parquet"),
        )

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    q = attach_span_rewrite_stream(
        stream, None, out, checkpoint_dir=ck, gram_index_path=art
    )
    try:
        write_batch(0, [(1, f"arrival carrying {_BLOCK} through")])
        q.processAllAvailable()
        compact_span_ingest(spark, art, out)
        write_batch(1, [(2, f"second arrival with {_BLOCK} again")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r["doc_id"]: r
        for r in IdempotentParquetSink(out).read_committed(spark).collect()
    }
    assert rows[1]["n_spans_removed"] == 0  # first sighting: uncut
    assert rows[2]["chars_removed"] >= len(_BLOCK) - 1  # cut vs ingested


# --------------------------------------------------------------------------
# Dedup ingest: fold admitted docs' signatures into the standing index
# --------------------------------------------------------------------------


def test_dedup_fold_flags_against_admitted_docs(
    spark, artifact_root, tmp_path
):
    from streamlit_flink_demo_spark.operators.dedup import (
        minhash_signatures,
    )
    from streamlit_flink_demo_spark.streaming.dedup_ingest import (
        _band_keys_col,
        init_minhash_index,
        near_dup_flags_batch,
    )
    from streamlit_flink_demo_spark.operators.incremental import (
        read_index_data,
    )

    corpus = _new_docs(
        spark,
        [(101, "standing corpus words that describe nothing shared")],
    )
    art = str(tmp_path / "sig_idx")
    init_minhash_index(corpus, art)

    admitted_text = (
        "freshly ingested admitted document about spark compaction "
        "folding signatures into the standing index for the door check"
    )
    docs_sink_path = str(tmp_path / "docs_tail")
    docs_sink = IdempotentParquetSink(docs_sink_path)
    docs_sink(_new_docs(spark, [(5001, admitted_text)]), 0)

    probe = _new_docs(
        spark,
        [
            (
                9001,
                admitted_text + " with one extra clause appended here",
            )
        ],
    )

    def flags_against_index():
        sigs = read_index_data(spark, art)
        bands = sigs.select(
            F.col("doc_id").alias("old_doc"),
            F.explode(_band_keys_col()).alias("band_key"),
        )
        return {
            r["doc_id"]: (r["dup_of"], r["est_jaccard"])
            for r in near_dup_flags_batch(probe, sigs, bands).collect()
        }

    before = flags_against_index()
    assert before[9001][0] is None  # unknown pre-fold

    digest = compact_dedup_ingest(spark, art, docs_sink_path)
    assert digest["folded_batches"] == [0]
    after = flags_against_index()
    assert after[9001][0] == 5001  # flagged against the admitted doc

    # equivalence with batch recompute on the grown corpus
    grown_sigs = minhash_signatures(
        corpus.unionByName(_new_docs(spark, [(5001, admitted_text)]))
    )
    grown_bands = grown_sigs.select(
        F.col("doc_id").alias("old_doc"),
        F.explode(_band_keys_col()).alias("band_key"),
    )
    want = {
        r["doc_id"]: (r["dup_of"], r["est_jaccard"])
        for r in near_dup_flags_batch(
            probe, grown_sigs, grown_bands
        ).collect()
    }
    assert after == want

    # idempotent replay
    assert compact_dedup_ingest(spark, art, docs_sink_path)[
        "folded_batches"
    ] == []


def test_fold_key_and_ledger_recorded_in_artifact_meta(
    spark, artifact_root, tmp_path
):
    from streamlit_flink_demo_spark.operators.suffix import init_gram_index

    corpus = _new_docs(spark, [(1, "ledger corpus words here")])
    art = str(tmp_path / "gram_idx")
    init_gram_index(corpus, art)
    sink_path = str(tmp_path / "span_tail")
    sink = IdempotentParquetSink(sink_path)
    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
        span_rewrite_batch,
    )

    b0 = _new_docs(spark, [(2, "arriving text body for the ledger")])
    sink(span_rewrite_batch(b0, gram_index_rows(corpus)), 7)
    compact_span_ingest(spark, art, sink_path)
    with open(os.path.join(os.path.realpath(art), "meta.json")) as fh:
        meta = json.load(fh)
    (entry,) = meta["deltas"]
    assert entry["folded_batches"] == [7]
    assert entry["key"].startswith("span:b[7]")


def test_probe_fresh_compacted_identical_across_fold_cycle(
    spark, sf_dir, artifact_root, tmp_path
):
    """Serving parity: probe_fresh_compacted answers identically at
    every instant of the fold cycle — before the fold (artifact +
    tail), mid-crash (delta committed, tail not truncated), and after
    truncation — and equals probe_fresh over the direct base ∪ tail."""
    from streamlit_flink_demo_spark.operators.retrieval import (
        build_chunk_embed_index,
        chunk_embed_rows,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table
    from streamlit_flink_demo_spark.streaming.vector_ingest import (
        probe_fresh,
        probe_fresh_compacted,
    )

    art = build_chunk_embed_index(spark, sf_dir)
    sink_path = str(tmp_path / "vec_tail")
    sink = IdempotentParquetSink(sink_path)
    d1 = _new_docs(spark, [(900004, "serving parity document " * 13)])
    sink(chunk_embed_rows(d1), 0)

    base_docs = load_table(spark, sf_dir, "documents")
    base_rows = chunk_embed_rows(base_docs)
    q = spark.createDataFrame(
        [(1,)], "q_id bigint"
    ).crossJoin(
        chunk_embed_rows(d1)
        .limit(1)
        .select(F.col("embedding").alias("q_emb"))
    )
    want = _rowset(probe_fresh(spark, base_rows, sink_path, q))

    def got():
        return _rowset(probe_fresh_compacted(spark, art, sink_path, q))

    assert got() == want  # pre-fold

    def write(rows, staging):
        (
            rows.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(staging)
        )

    fold_sink_into_index(
        spark, sink_path, art, write, key_prefix="vec", truncate=False
    )
    assert got() == want  # mid-crash: delta + unfolded tail, no double
    truncate_folded_tail(sink_path, art)
    assert got() == want  # post-truncate
    # the freshly-ingested chunk is retrievable (top hit for its own
    # embedding as the query)
    top = probe_fresh_compacted(spark, art, sink_path, q).collect()[0]
    assert top["doc_id"] == 900004 and top["rk"] == 1


def test_fold_refuses_unattributable_sink_generation(
    spark, artifact_root, tmp_path
):
    """sinks.compact_sink after an artifact fold smuggles already-
    folded rows into a fresh generation dir; the fold must refuse
    (duplicating or dropping rows are the only other options)."""
    import pytest as _pytest

    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
        init_gram_index,
        span_rewrite_batch,
    )
    from streamlit_flink_demo_spark.sinks import compact_sink

    corpus = _new_docs(spark, [(1, "guard corpus words entirely own")])
    art = str(tmp_path / "gram_idx")
    init_gram_index(corpus, art)
    sink_path = str(tmp_path / "span_tail")
    sink = IdempotentParquetSink(sink_path)
    b0 = _new_docs(spark, [(2, "first landed arrival text body")])
    sink(span_rewrite_batch(b0, gram_index_rows(corpus)), 0)
    compact_span_ingest(spark, art, sink_path)  # fold batch 0
    b1 = _new_docs(spark, [(3, "second landed arrival text body")])
    sink(span_rewrite_batch(b1, gram_index_rows(corpus)), 1)
    compact_sink(spark, sink_path)  # folds 0 AND 1 into compact=0
    with _pytest.raises(ValueError, match="unattributable"):
        compact_span_ingest(spark, art, sink_path)


def test_batch_committed_mid_fold_survives_truncation(
    spark, artifact_root, tmp_path
):
    """A batch the live sink commits BETWEEN the fold's manifest
    snapshot and the truncation must be neither folded nor truncated:
    it stays in the tail, is served by the reconciling reader, and the
    NEXT fold picks it up exactly once."""
    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
        init_gram_index,
        span_rewrite_batch,
    )

    corpus = _new_docs(spark, [(1, "race corpus words all its own")])
    art = str(tmp_path / "gram_idx")
    init_gram_index(corpus, art)
    sink_path = str(tmp_path / "span_tail")
    sink = IdempotentParquetSink(sink_path)
    idx = gram_index_rows(corpus)
    sink(span_rewrite_batch(_new_docs(spark, [(2, "first race arrival text")]), idx), 0)

    def write(rows, staging):
        (
            rows.repartition("gb")
            .write.mode("overwrite")
            .partitionBy("gb")
            .parquet(staging)
        )

    from pyspark.sql import functions as F2

    def rows_fn(tail):
        return gram_index_rows(
            tail.select("doc_id", F2.col("clean_text").alias("text"))
        )

    # fold batch 0 WITHOUT truncation (the snapshot point), then the
    # "live stream" commits batch 1 before truncation runs
    fold_sink_into_index(
        spark, sink_path, art, write, rows_fn=rows_fn,
        key_prefix="span", truncate=False,
    )
    sink(span_rewrite_batch(_new_docs(spark, [(3, "second race arrival text")]), idx), 1)
    truncate_folded_tail(sink_path, art)

    # batch 1 survived: still committed, not folded
    assert sink.committed_ids() == [1]
    fb, _ = folded_ids(art)
    assert fb == {0}
    # next fold picks up exactly batch 1
    digest = fold_sink_into_index(
        spark, sink_path, art, write, rows_fn=rows_fn,
        key_prefix="span", truncate=False,
    )
    assert digest["folded_batches"] == [1]
    fb2, _ = folded_ids(art)
    assert fb2 == {0, 1}


# --------------------------------------------------------------------------
# Major compaction must carry the fold ledger forward (r11 ADVICE high)
# --------------------------------------------------------------------------


def test_compact_index_preserves_fold_ledger(
    spark, artifact_root, tmp_path
):
    """compact_index folds delta entries away — including the entries
    whose folded_batches/folded_compactions ARE the fold ledger for
    never-truncated tails (gram/sig/cdc). The compacted version must
    carry the accumulated ledger at top level, so a post-compaction
    re-fold is a no-op instead of silently duplicating rows."""
    from streamlit_flink_demo_spark.operators.incremental import (
        compact_index,
        read_index_data,
    )
    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
        init_gram_index,
        span_rewrite_batch,
    )

    corpus = _new_docs(
        spark, [(101, "standing corpus doc with only its own words")]
    )
    art = str(tmp_path / "gram_idx")
    init_gram_index(corpus, art)
    sink_path = str(tmp_path / "span_tail")
    sink = IdempotentParquetSink(sink_path)
    b0 = _new_docs(spark, [(1, f"first arrival with {_BLOCK} inside")])
    sink(span_rewrite_batch(b0, gram_index_rows(corpus)), 0)
    compact_span_ingest(spark, art, sink_path)
    pre = _rowset(read_index_data(spark, art))
    assert folded_ids(art)[0] == {0}

    # the documented maintenance sequence: major compaction of the
    # fold-managed artifact
    assert compact_index(
        spark, art, partition_cols=("gb",),
        sort_cols=("g", "s64", "doc_id", "p"),
    )
    assert folded_ids(art)[0] == {0}  # ledger survived the compaction
    assert _rowset(read_index_data(spark, art)) == pre

    # re-fold after compaction: batch 0 must NOT fold again (the tail
    # is never truncated — only the ledger prevents duplication)
    digest = compact_span_ingest(spark, art, sink_path)
    assert digest["folded_batches"] == []
    assert _rowset(read_index_data(spark, art)) == pre

    # a LATER batch still folds normally, and a second compaction
    # accumulates both ledgers
    b1 = _new_docs(spark, [(2, "later arrival with its own words too")])
    sink(span_rewrite_batch(b1, gram_index_rows(corpus)), 1)
    digest = compact_span_ingest(spark, art, sink_path)
    assert digest["folded_batches"] == [1]
    assert compact_index(
        spark, art, partition_cols=("gb",),
        sort_cols=("g", "s64", "doc_id", "p"),
    )
    assert folded_ids(art)[0] == {0, 1}
    assert compact_span_ingest(spark, art, sink_path)[
        "folded_batches"
    ] == []


def test_concurrent_fold_and_compact_lose_nothing(
    spark, artifact_root, tmp_path
):
    """The maintenance lock's end-state guarantee (code-review r12):
    a fold and a major compaction racing on one artifact serialize —
    whichever interleaving the scheduler picks, the final artifact
    holds the base rows plus the folded batch's rows exactly once,
    and the fold ledger records the batch. Without the lock, a fold
    landing between the compaction's meta snapshot and its publish
    had its delta rows and ledger entries dropped by the version
    swap."""
    import threading

    from streamlit_flink_demo_spark.operators.incremental import (
        compact_index,
        read_index_data,
    )
    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
        init_gram_index,
        span_rewrite_batch,
    )

    corpus = _new_docs(
        spark, [(101, "standing corpus doc with only its own words")]
    )
    art = str(tmp_path / "gram_idx")
    init_gram_index(corpus, art)
    sink_path = str(tmp_path / "span_tail")
    sink = IdempotentParquetSink(sink_path)
    idx = gram_index_rows(corpus)
    # batch 0 folds FIRST (so the compaction has a delta to fold);
    # batch 1 is the one that races the compaction
    sink(span_rewrite_batch(_new_docs(
        spark, [(1, "first landed arrival with its own words")]), idx), 0)
    compact_span_ingest(spark, art, sink_path)
    sink(span_rewrite_batch(_new_docs(
        spark, [(2, "second landed arrival racing the compaction")]), idx), 1)

    errs: list[Exception] = []

    def compact():
        try:
            compact_index(
                spark, art, partition_cols=("gb",),
                sort_cols=("g", "s64", "doc_id", "p"),
            )
        except Exception as ex:  # surfaced below
            errs.append(ex)

    def fold():
        try:
            compact_span_ingest(spark, art, sink_path)
        except Exception as ex:
            errs.append(ex)

    t1 = threading.Thread(target=compact)
    t2 = threading.Thread(target=fold)
    t1.start()
    t2.start()
    t1.join()
    t2.join()
    assert not errs, errs

    # end state: every corpus + folded doc's positions present exactly
    # once, ledger complete, and a re-fold is a no-op
    fb, _ = folded_ids(art)
    assert fb == {0, 1}
    grown = corpus.unionByName(
        _new_docs(
            spark,
            [
                (1, "first landed arrival with its own words"),
                (2, "second landed arrival racing the compaction"),
            ],
        )
    )
    want = _rowset(gram_index_rows(grown))
    assert _rowset(read_index_data(spark, art)) == want
    assert compact_span_ingest(spark, art, sink_path)[
        "folded_batches"
    ] == []
    assert _rowset(read_index_data(spark, art)) == want
