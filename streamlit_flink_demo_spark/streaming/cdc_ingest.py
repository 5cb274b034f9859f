"""Ingest-time CDC coverage over a document stream — the sixth
door-check: how many of each arriving document's bytes does the
standing corpus already store, at content-defined-chunk granularity
(operators/dedup.cdc_chunks_col — boundaries that re-synchronize
after insertions, so offsets don't defeat the measure).

Per batch: the arriving docs are CDC-chunked and digested in-plan
(map-only higher-order functions), the batch's small digest set is
broadcast against the standing chunk-digest index — the in-session
frame (``corpus_docs``) or, the production form, the PERSISTED
bucket-partitioned artifact (``cdc_index_path`` —
operators/dedup.init_cdc_index; probes dynamic-partition-prune to the
batch's hash buckets, re-resolved per batch so compaction deltas
serve the NEXT batch without reattaching). Stateless per batch; no
watermark, no state store. Coverage rows land exactly-once in an
``IdempotentParquetSink``; ``on_summary`` fires one bounded digest
per COMMITTED batch id (total/duplicated chars — the new-bytes rate a
crawl monitor graphs). operators/compaction.compact_cdc_ingest folds
admitted documents' digests back into the artifact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators.dedup import (
    cdc_coverage_batch,
    cdc_hash_rows,
)
from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.dedup_ingest import (
    _unpersist_on_termination,
)


def attach_cdc_coverage_stream(
    doc_stream: DataFrame,
    corpus_docs: DataFrame | None,
    out_path: str,
    on_summary: Callable[[dict], None] | None = None,
    checkpoint_dir: str | None = None,
    cdc_index_path: str | None = None,
):
    """Wire a (doc_id, text) stream through per-batch CDC coverage.
    Pass exactly one of ``corpus_docs`` (in-session digest frame,
    persisted once) / ``cdc_index_path`` (persisted artifact,
    re-resolved per batch). Returns the started StreamingQuery."""
    if (corpus_docs is None) == (cdc_index_path is None):
        raise ValueError(
            "pass exactly one of corpus_docs / cdc_index_path"
        )
    if cdc_index_path is None:
        index = cdc_hash_rows(corpus_docs).persist()
        index.count()  # materialize before the stream starts
        persisted = [index]
    else:
        index = None
        persisted = []
    sink = IdempotentParquetSink(out_path)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if index is not None:
            idx = index
        else:
            from streamlit_flink_demo_spark.operators.incremental import (
                read_live_index,
            )

            idx = read_live_index(batch_df.sparkSession, cdc_index_path)
        rows = cdc_coverage_batch(batch_df, idx)
        status = sink(rows, batch_id)
        if on_summary is None or status != "committed":
            return
        # summarize from the durable batch directory — re-aggregating
        # `rows` would run the digest probe join a second time.
        # Retries on the batch plan if a concurrent compaction
        # truncated the directory mid-read.
        d = sink.run_on_committed_batch(
            batch_df.sparkSession,
            batch_id,
            rows,
            lambda df: df.agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chunks").alias("n_chunks"),
                F.sum("dup_chars").alias("dup_chars"),
            ).first(),
        )
        on_summary(
            {
                "batch_id": batch_id,
                "n_docs": d["n_docs"],
                "n_chunks": int(d["n_chunks"] or 0),
                "dup_chars": int(d["dup_chars"] or 0),
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
