"""Ingest-time exact repeated-span CLEANUP over a document stream.

The streaming twin of ``operators/suffix.dedup_span_rewrite_delta``
and the third door-check module (dedup_ingest flags near-dups,
contamination_ingest screens eval leakage — this one REWRITES):
every arriving micro-batch of documents has its >=24-char spans that
repeat anywhere in (standing corpus ∪ this batch) cut before the text
lands, Lee-et-al cleanup applied at ingest instead of as a periodic
batch pass.

Exactness rides the gram-group argument (suffix.py): a position's
credited repeat length is capped at 64 chars and thresholded at 24,
so any qualifying partner shares the position's exact 24-char prefix.
The standing corpus index is either built in-session at attach time
(``corpus_docs`` — persisted (g, s64) frame) or, the production form,
the PERSISTED bucketed gram-index artifact (``gram_index_path`` —
suffix.build_gram_index / init_gram_index: parquet partitioned by
gb = hash(24-gram), so each batch's broadcast gram set prunes the
scan to its own buckets and corpus text is never rescanned). Per-
batch cost ∝ batch size + matching corpus groups — never the corpus.

Batch semantics: each batch is rewritten against corpus ∪ ITSELF
(a document repeated inside one batch is cut), not against earlier
batches — folding committed batches into the standing gram index is
the compaction path (operators/compaction.compact_span_ingest folds
the landed ``clean_text`` rows in as index deltas, after which later
batches ARE cleaned against earlier ingested documents). No streaming
state store: stateless per batch; restart safety is the sink's
batch-id dedup. Rewrite rows — accounting PLUS the cleaned text
itself (the ingest product) — land DISTRIBUTED in an
``IdempotentParquetSink`` (exactly-once by batch id); the optional
``on_summary`` sees one bounded digest per COMMITTED batch; an
in-session index unpersists on query termination.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators.suffix import (  # noqa: F401
    gram_positions,
    read_gram_index,
    span_rewrite_batch,  # re-export; shared batch/stream rewrite
)
from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.dedup_ingest import (
    _unpersist_on_termination,
)


def corpus_span_index(corpus_docs: DataFrame) -> DataFrame:
    """The attach-time in-session standing index: every corpus
    position keyed by its exact 24-gram, carrying the 64-char window
    the LCP needs (suffix.gram_positions)."""
    return gram_positions(corpus_docs)


def attach_span_rewrite_stream(
    doc_stream: DataFrame,
    corpus_docs: DataFrame | None,
    out_path: str,
    on_summary: Callable[[dict], None] | None = None,
    checkpoint_dir: str | None = None,
    gram_index_path: str | None = None,
):
    """Wire a (doc_id, text) document stream through per-batch exact
    span cleanup. The standing index is ``corpus_docs`` (in-session:
    built and persisted ONCE) or — the production form — the
    persisted artifact at ``gram_index_path`` (bucket-pruned probes;
    pass ``corpus_docs=None``). Rewrite rows (accounting +
    ``clean_text``) land exactly-once by batch id at ``out_path``;
    ``on_summary`` (optional) receives per COMMITTED batch:

        {"batch_id": int, "n_docs": int, "n_rewritten": int,
         "chars_removed": int}

    and never re-fires for a replayed batch. Returns the started
    StreamingQuery; an in-session index unpersists on termination."""
    if (corpus_docs is None) == (gram_index_path is None):
        raise ValueError(
            "pass exactly one of corpus_docs / gram_index_path"
        )
    if gram_index_path is None:
        index = corpus_span_index(corpus_docs).persist()
        index.count()  # materialize before the stream starts
        persisted = [index]
    else:
        index = None
        persisted = []
    sink = IdempotentParquetSink(out_path)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Artifact mode re-resolves per batch (one driver-side
        # meta.json read): a compaction delta committed mid-stream is
        # visible to the NEXT batch without reattaching.
        idx = (
            index
            if index is not None
            else read_gram_index(batch_df.sparkSession, gram_index_path)
        )
        rows = span_rewrite_batch(batch_df, idx)
        status = sink(rows, batch_id)
        if on_summary is None or status != "committed":
            return
        # Summarize from the just-committed durable batch directory,
        # not the unmaterialized plan — re-aggregating `rows` would
        # run the whole gram-join/window/LCP rewrite a second time.
        # run_on_committed_batch retries on the batch plan if a
        # concurrent sink compaction truncated the directory between
        # commit and this aggregation (the TOCTOU window).
        d = sink.run_on_committed_batch(
            batch_df.sparkSession,
            batch_id,
            rows,
            lambda df: df.agg(
                F.count("*").alias("n_docs"),
                F.sum((F.col("n_spans_removed") > 0).cast("int")).alias(
                    "n_rewritten"
                ),
                F.sum("chars_removed").alias("chars_removed"),
            ).first(),
        )
        on_summary(
            {
                "batch_id": batch_id,
                "n_docs": d["n_docs"],
                "n_rewritten": int(d["n_rewritten"] or 0),
                "chars_removed": int(d["chars_removed"] or 0),
            }
        )

    writer = doc_stream.writeStream.outputMode("append").foreachBatch(
        on_batch
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    if persisted:
        _unpersist_on_termination(
            doc_stream.sparkSession, query.id, persisted
        )
    return query
