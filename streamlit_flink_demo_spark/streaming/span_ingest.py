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
The standing corpus is indexed ONCE at attach time as a (g, s64)
frame — its 24-gram key plus the 64-char window, the same ~88 B/char
payload the batch gram-group pass exchanges; per batch, the batch's
(small, broadcastable) gram set prunes the corpus index to the groups
a batch position can possibly join, the batch and corpus rows sort
WITHIN those groups only, and only batch positions are credited. Per-
batch cost ∝ batch size + matching corpus groups — never the corpus.
In production the index is a parquet artifact hash-bucketed by g
(operators/incremental.py pattern) so the probe prunes to buckets.

Batch semantics: each batch is rewritten against corpus ∪ ITSELF
(a document repeated inside one batch is cut), not against earlier
batches — folding committed batches into the standing index is the
compaction path, exactly like the vector-ingest tail. No streaming
state store: stateless per batch; restart safety is the sink's
batch-id dedup. Rewrite rows land DISTRIBUTED in an
``IdempotentParquetSink`` (exactly-once by batch id); the optional
``on_summary`` sees one bounded digest per COMMITTED batch; the
persisted index unpersists on query termination.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators.suffix import (
    _LCP_CAP,
    _MIN_REPEAT,
    _apply_span_cut,
    _lcp_expr,
    _ranges_from_credited,
)
from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.dedup_ingest import (
    _unpersist_on_termination,
)


def _positions(docs: DataFrame) -> DataFrame:
    """(doc_id, p, s64, g) for every position whose 24-gram is full
    width (shorter suffixes can never reach the threshold)."""
    return (
        docs.filter(F.length("text") >= _MIN_REPEAT)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.length("text") - _MIN_REPEAT)
            ).alias("p"),
            "text",
        )
        .select(
            "doc_id",
            "p",
            F.col("text")
            .substr(F.col("p") + 1, F.lit(_LCP_CAP))
            .alias("s64"),
        )
        .withColumn("g", F.substring("s64", 1, _MIN_REPEAT))
    )


def corpus_span_index(corpus_docs: DataFrame) -> DataFrame:
    """The attach-time standing index: every corpus position keyed by
    its exact 24-gram, carrying the 64-char window the LCP needs."""
    return _positions(corpus_docs)


def span_rewrite_batch(
    batch_docs: DataFrame, corpus_index: DataFrame
) -> DataFrame:
    """Rewrite one (micro-)batch of (doc_id, text) docs against
    corpus ∪ batch: returns _apply_span_cut's accounting rows
    (doc_id, orig_chars, clean_chars, n_spans_removed, chars_removed,
    clean_md5) for every nonempty batch doc. Pure composition —
    usable from foreachBatch AND from batch tests."""
    from pyspark.sql import Window as W

    bpos = _positions(batch_docs).withColumn("is_b", F.lit(True))
    bg = bpos.select("g").distinct()
    cpos = (
        corpus_index.join(F.broadcast(bg), "g")
        .select("g", "doc_id", "p", "s64")
        .withColumn("is_b", F.lit(False))
    )
    allpos = cpos.unionByName(bpos.select("g", "doc_id", "p", "s64", "is_b"))
    # deterministic in-group order: s64 first (the crediting order),
    # then origin/doc/p purely as a tie-break among equal windows
    wg = W.partitionBy("g").orderBy("s64", "is_b", "doc_id", "p")
    wc = W.partitionBy("g")
    sized = allpos.withColumn("gsz", F.count("*").over(wc)).filter(
        F.col("gsz") >= 2
    )
    credited = (
        sized.select(
            "doc_id",
            "is_b",
            "p",
            F.greatest(
                F.coalesce(
                    _lcp_expr(F.col("s64"), F.lag("s64").over(wg)), F.lit(0)
                ),
                F.coalesce(
                    _lcp_expr(F.col("s64"), F.lead("s64").over(wg)),
                    F.lit(0),
                ),
            ).alias("lcp"),
        )
        .filter("is_b")
        .drop("is_b")
    )
    clean_batch = batch_docs.filter(F.length("text") > 0)
    return _apply_span_cut(clean_batch, _ranges_from_credited(credited))


def attach_span_rewrite_stream(
    doc_stream: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    on_summary: Callable[[dict], None] | None = None,
    checkpoint_dir: str | None = None,
):
    """Wire a (doc_id, text) document stream through per-batch exact
    span cleanup against ``corpus_docs``. The corpus index is built
    and persisted ONCE; rewrite rows land exactly-once by batch id at
    ``out_path``; ``on_summary`` (optional) receives per COMMITTED
    batch:

        {"batch_id": int, "n_docs": int, "n_rewritten": int,
         "chars_removed": int}

    and never re-fires for a replayed batch. Returns the started
    StreamingQuery; the persisted index unpersists on termination."""
    index = corpus_span_index(corpus_docs).persist()
    index.count()  # materialize before the stream starts
    sink = IdempotentParquetSink(out_path)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = span_rewrite_batch(batch_df, index)
        status = sink(rows, batch_id)
        if on_summary is None or status != "committed":
            return
        d = (
            rows.agg(
                F.count("*").alias("n_docs"),
                F.sum((F.col("n_spans_removed") > 0).cast("int")).alias(
                    "n_rewritten"
                ),
                F.sum("chars_removed").alias("chars_removed"),
            )
            .first()
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
    _unpersist_on_termination(doc_stream.sparkSession, query.id, [index])
    return query
