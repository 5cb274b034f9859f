"""Ingest-time HTML → text extraction — the eighth door-check: the
first-mile stage (operators/extract.py) applied where production
pipelines actually run it, on the arriving crawl stream.

A crawl lands as (doc_id, html); everything downstream — quality
gates, dedup, contamination screens — wants extracted text. Batch
re-extraction of a standing corpus is a corpus-wide job; extracting
at the door costs exactly the arriving batch, and extraction is
STATELESS (a pure per-row projection), so the stream form is the
batch operator applied per micro-batch — no state store, no
watermark, stream ≡ batch twin by construction (pinned in
tests/test_extract_ingest.py).

Delivery contract (the door-check family's):
- extracted rows (doc_id, n_lines_raw, n_lines_kept, extract_text)
  land DISTRIBUTED in an ``IdempotentParquetSink`` — exactly-once by
  batch id across restart replays;
- the optional ``on_summary`` sees one bounded digest per COMMITTED
  batch — aggregated from the just-committed durable batch directory
  (never by re-executing the batch plan);
- rows the boilerplate filter empties out (n_lines_kept = 0) still
  land, carrying their accounting: dropping documents is the quality
  GATE's decision, not the extractor's.

At 100 TB: the extraction itself is one map-only JVM projection
(whole-stage codegen, no shuffle — tests/test_plans.py pins the batch
twin), so per-batch cost is scan bandwidth on the batch. The landed
sink is the corpus the other door-checks then sign/digest/screen.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators.extract import extract_text
from streamlit_flink_demo_spark.sinks import IdempotentParquetSink


def extract_batch(batch_docs: DataFrame, html_col: str = "html") -> DataFrame:
    """The shared batch/stream extraction projection: accounting plus
    the extracted text for every arriving document."""
    return extract_text(batch_docs, html_col=html_col).select(
        "doc_id", "n_lines_raw", "n_lines_kept", "extract_text"
    )


def attach_extract_stream(
    doc_stream: DataFrame,
    out_path: str,
    html_col: str = "html",
    on_summary: Callable[[dict], None] | None = None,
    checkpoint_dir: str | None = None,
):
    """Wire a (doc_id, html) stream through ingest-time extraction.
    Extracted rows land exactly-once by batch id at ``out_path``;
    ``on_summary`` (optional) receives per COMMITTED batch:

        {"batch_id": int, "n_docs": int, "n_boilerplate_only": int,
         "chars_kept": int}

    and never re-fires for a replayed batch. Returns the started
    StreamingQuery."""
    sink = IdempotentParquetSink(out_path)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = extract_batch(batch_df, html_col=html_col)
        status = sink(rows, batch_id)
        if on_summary is None or status != "committed":
            return
        # Durable-dir summary with retry-on-fallback: a concurrent
        # compaction truncating the batch dir mid-read must not kill
        # the stream (run_on_committed_batch re-runs on the plan).
        d = sink.run_on_committed_batch(
            batch_df.sparkSession,
            batch_id,
            rows,
            lambda df: df.agg(
                F.count("*").alias("n_docs"),
                F.sum((F.col("n_lines_kept") == 0).cast("int")).alias(
                    "n_boilerplate_only"
                ),
                F.sum(F.length("extract_text")).alias("chars_kept"),
            ).first(),
        )
        on_summary(
            {
                "batch_id": batch_id,
                "n_docs": d["n_docs"],
                "n_boilerplate_only": int(d["n_boilerplate_only"] or 0),
                "chars_kept": int(d["chars_kept"] or 0),
            }
        )

    writer = doc_stream.writeStream.outputMode("append").foreachBatch(
        on_batch
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
