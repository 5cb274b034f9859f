"""Unified ingest compaction: fold committed streaming tails into the
standing index artifacts.

Each streaming door-check grows a tail the batch side must eventually
absorb: the vector ingest lands chunk-embedding rows, the span-cleanup
ingest lands cleaned documents, the near-dup ingest admits documents
whose signatures the standing corpus frame should learn. This module
is the one periodic job that folds those COMMITTED tails into the
artifacts — the "compaction path" each module's docstring names —
with the same exactly-once discipline the sinks and artifacts already
carry:

- **Idempotent fold.** A fold is a ``commit_delta`` (incremental.py)
  whose key is derived from the folded batch ids, and whose delta
  entry records ``folded_batches`` / ``folded_compactions`` in the
  artifact's meta.json. Re-running after a crash re-derives the same
  unfolded set: an already-committed key is a no-op, and batches
  recorded as folded are never folded again — replaying the job any
  number of times, from any crash point, folds each committed batch
  exactly once.
- **Reconciling reader.** Between the delta commit and the tail
  truncation a naive artifact ∪ tail union would double-count;
  ``read_index_with_tail`` subtracts the artifact's folded ids from
  the tail's committed set, so the combined view is correct at EVERY
  instant of the fold cycle (and after a crash between the two
  steps).
- **Truncation is garbage collection, not a correctness event.** Only
  tails whose rows are REDUNDANT after the fold (the vector tail — its
  rows are exactly the artifact's rows) are truncated: folded ids
  leave the sink manifest under the watermark (so a Spark checkpoint
  replay of a truncated id still short-circuits) and their
  directories are removed last. The span tail is the landed cleaned
  DOCUMENTS — the ingest product — and is never truncated; the fold
  ledger alone prevents re-folding.

At 100 TB this is the standard background job every table format
schedules, applied to index artifacts: batch-sized delta appends per
cycle, never a corpus-wide rebuild; ``compact_index`` (incremental.py)
remains the major compaction that folds accumulated deltas into a
fresh base layout.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from streamlit_flink_demo_spark.operators.incremental import (
    _read_meta,
    commit_delta,
    maintenance_lock,
    read_index_data,
)
from streamlit_flink_demo_spark.sinks import IdempotentParquetSink


def folded_ids(
    artifact_path: str, meta: dict | None = None
) -> tuple[set[int], set[int]]:
    """(folded streaming batch ids, folded sink-compaction gens)
    recorded across the live artifact version's delta entries PLUS
    the top-level ledger a major compaction (compact_index) carries
    forward when it folds those deltas away. ``meta`` lets a caller
    pass its own single meta.json snapshot (read_index_with_tail)."""
    if meta is None:
        meta = _read_meta(os.path.realpath(artifact_path))
    fb: set[int] = set(meta.get("folded_batches", []))
    fc: set[int] = set(meta.get("folded_compactions", []))
    for d in meta.get("deltas", []):
        fb.update(d.get("folded_batches", []))
        fc.update(d.get("folded_compactions", []))
    return fb, fc


def _unfolded_dirs(
    sink: IdempotentParquetSink, manifest: dict, fb: set[int], fc: set[int]
) -> tuple[list[str], list[int], list[int]]:
    new_b = [b for b in manifest["batch_ids"] if b not in fb]
    new_c = [c for c in manifest["compactions"] if c not in fc]
    dirs = [os.path.join(sink.path, f"compact={c}") for c in new_c] + [
        os.path.join(sink.path, f"batch_id={b}") for b in new_b
    ]
    return dirs, new_b, new_c


def fold_sink_into_index(
    spark: SparkSession,
    sink_path: str,
    artifact_path: str,
    write_rows,
    rows_fn=None,
    key_prefix: str = "ingest",
    truncate: bool = False,
) -> dict:
    """Fold the sink's committed-but-unfolded tail into the artifact
    as ONE delta. ``rows_fn`` (optional) maps the tail frame to the
    artifact's row schema (e.g. cleaned documents → gram-index rows);
    ``write_rows(rows, staging_dir)`` materializes them in the
    artifact's layout (partitioning is the artifact family's choice).
    Returns a digest {"folded_batches", "folded_compactions",
    "truncated"}; a tail with nothing new is a no-op.

    Runs under the artifact's ``maintenance_lock`` (incremental.py):
    a major compaction (compact_index) publishing a fresh version
    mid-fold would silently drop this fold's delta rows and ledger
    entries in its version swap — with a truncating tail that is data
    loss. Maintenance operations on one artifact are serialized;
    live-stream appends (commit_delta's own short lock) still
    interleave freely."""
    with maintenance_lock(artifact_path):
        return _fold_sink_into_index_locked(
            spark, sink_path, artifact_path, write_rows, rows_fn,
            key_prefix, truncate,
        )


def _fold_sink_into_index_locked(
    spark, sink_path, artifact_path, write_rows, rows_fn,
    key_prefix, truncate,
) -> dict:
    sink = IdempotentParquetSink(sink_path)
    m = sink._read_manifest()  # ONE snapshot drives the whole fold
    fb, fc = folded_ids(artifact_path)
    dirs, new_b, new_c = _unfolded_dirs(sink, m, fb, fc)
    if new_c and (fb or fc):
        # A sink-level compaction (sinks.compact_sink) folds EVERY
        # live directory — including batches/generations this artifact
        # already absorbed — into one new generation, so an unfolded
        # generation appearing AFTER any artifact fold cannot be
        # attributed: folding it would duplicate rows, skipping it
        # would lose the new ones. Run fold_sink_into_index before
        # compact_sink on a fold-managed tail (or let the fold's own
        # truncate reclaim the vector tail).
        raise ValueError(
            f"unattributable sink generation(s) {new_c} under "
            f"{sink_path}: sink-level compaction ran after an artifact "
            "fold — fold before compact_sink on a fold-managed tail"
        )
    if dirs:
        rows = spark.read.parquet(*dirs)
        if rows_fn is not None:
            rows = rows_fn(rows)
        key = (
            f"{key_prefix}:b[{','.join(map(str, new_b))}]"
            f":c[{','.join(map(str, new_c))}]"
        )
        commit_delta(
            artifact_path,
            key,
            lambda staging: write_rows(rows, staging),
            extra={
                "folded_batches": new_b,
                "folded_compactions": new_c,
            },
        )
    truncated = 0
    if truncate:
        truncated = _truncate_folded_tail_locked(sink_path, artifact_path)
    return {
        "folded_batches": new_b,
        "folded_compactions": new_c,
        "truncated": truncated,
    }


def truncate_folded_tail(sink_path: str, artifact_path: str) -> int:
    """Drop every tail directory the artifact records as folded: the
    ids leave the sink manifest under an advanced ``watermark`` (a
    checkpoint replay of a truncated batch id still short-circuits —
    the rows are durable inside the artifact delta), directories are
    removed only after the atomic manifest replace. Idempotent; safe
    to re-run from any crash point. Takes the artifact's maintenance
    lock (a compaction publishing mid-truncation could drop the very
    delta that makes the truncated rows durable)."""
    with maintenance_lock(artifact_path):
        return _truncate_folded_tail_locked(sink_path, artifact_path)


def _truncate_folded_tail_locked(sink_path: str, artifact_path: str) -> int:
    sink = IdempotentParquetSink(sink_path)
    fb, fc = folded_ids(artifact_path)
    with sink._manifest_lock():
        now = sink._read_manifest()
        drop_b = [b for b in now["batch_ids"] if b in fb]
        drop_c = [c for c in now["compactions"] if c in fc]
        if not drop_b and not drop_c:
            return 0
        sink._write_manifest(
            {
                "batch_ids": [
                    b for b in now["batch_ids"] if b not in fb
                ],
                "compactions": [
                    c for c in now["compactions"] if c not in fc
                ],
                "watermark": max([now["watermark"]] + drop_b),
            }
        )
    for b in drop_b:
        shutil.rmtree(
            os.path.join(sink_path, f"batch_id={b}"), ignore_errors=True
        )
    for c in drop_c:
        shutil.rmtree(
            os.path.join(sink_path, f"compact={c}"), ignore_errors=True
        )
    return len(drop_b) + len(drop_c)


def read_index_with_tail(
    spark: SparkSession, artifact_path: str, sink_path: str
) -> DataFrame:
    """Artifact (base + committed deltas) ∪ the tail's committed
    NOT-YET-FOLDED batches — correct at every instant of the fold
    cycle. Read order matters: the tail manifest is snapshotted FIRST,
    so a fold landing between the two reads can only move rows from
    the tail set into the artifact's folded ledger (subtracted below),
    never drop them from both — and the artifact's meta.json is read
    exactly ONCE, with both the delta-dir enumeration and the
    folded-id sets derived from that single snapshot (a fold landing
    between two separate meta reads would otherwise subtract the new
    batches from the tail while the base enumeration predates the
    new delta, dropping the rows from both legs)."""
    sink = IdempotentParquetSink(sink_path)
    m = sink._read_manifest()
    # resolve the live version ONCE and read everything from it —
    # resolving again inside read_index_data could land on a version
    # published mid-call and mix version A's delta list with version
    # B's directory root.
    live = os.path.realpath(artifact_path)
    meta = _read_meta(live)
    base = read_index_data(spark, live, meta=meta)
    fb, fc = folded_ids(live, meta=meta)
    dirs, _, _ = _unfolded_dirs(sink, m, fb, fc)
    if not dirs:
        return base
    return base.unionByName(spark.read.parquet(*dirs))


# --------------------------------------------------------------------------
# Adapters: one per ingest stream
# --------------------------------------------------------------------------


def compact_vector_ingest(
    spark: SparkSession, chunk_index_path: str, sink_path: str
) -> dict:
    """Fold the vector-ingest tail (streaming/vector_ingest.py — rows
    already in the chunk artifact's exact schema) into the
    chunk-embedding artifact, bucket-partitioned like the base, then
    truncate the redundant tail. After the fold,
    ``read_index_with_tail`` (and a reattached/next-batch probe)
    serves the identical rows the pre-fold artifact ∪ tail served."""

    def write(rows: DataFrame, staging: str) -> None:
        (
            rows.repartition("bucket")
            .sortWithinPartitions("doc_id", "chunk_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(staging)
        )

    return fold_sink_into_index(
        spark,
        sink_path,
        chunk_index_path,
        write,
        key_prefix="vec",
        truncate=True,
    )


def compact_span_ingest(
    spark: SparkSession, gram_index_path: str, sink_path: str
) -> dict:
    """Fold the span-cleanup tail's landed CLEANED documents into the
    standing gram index: their (gb, g, doc_id, p, s64) positions land
    as a bucket-partitioned delta, so every LATER batch's rewrite sees
    earlier ingested documents as corpus (the attach loop re-resolves
    the index per batch). The tail itself — the cleaned documents —
    is the ingest product and is NOT truncated; the fold ledger
    prevents re-folding."""
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
    )

    def rows_fn(tail: DataFrame) -> DataFrame:
        return gram_index_rows(
            tail.select("doc_id", F.col("clean_text").alias("text"))
        )

    def write(rows: DataFrame, staging: str) -> None:
        # same bucketed layout as the base version
        (
            rows.repartition("gb")
            .sortWithinPartitions("g", "s64", "doc_id", "p")
            .write.mode("overwrite")
            .partitionBy("gb")
            .parquet(staging)
        )

    return fold_sink_into_index(
        spark,
        sink_path,
        gram_index_path,
        write,
        rows_fn=rows_fn,
        key_prefix="span",
        truncate=False,
    )


def compact_dedup_ingest(
    spark: SparkSession, sig_index_path: str, docs_sink_path: str
) -> dict:
    """Fold the ADMITTED ingested documents' MinHash signatures into
    the standing signature index (streaming/dedup_ingest.py's corpus
    frame, persisted): sign the unfolded committed documents with the
    batch pipeline (operators/dedup.minhash_signatures — the same
    columns the probe joins on) and commit them as a delta. The docs
    sink is the landed-document store and is not truncated."""
    from streamlit_flink_demo_spark.operators.dedup import (
        minhash_signatures,
    )

    def write(rows: DataFrame, staging: str) -> None:
        rows.write.mode("overwrite").parquet(staging)

    return fold_sink_into_index(
        spark,
        docs_sink_path,
        sig_index_path,
        write,
        rows_fn=lambda tail: minhash_signatures(
            tail.select("doc_id", "text")
        ),
        key_prefix="dedup",
        truncate=False,
    )


def compact_cdc_ingest(
    spark: SparkSession, cdc_index_path: str, docs_sink_path: str
) -> dict:
    """Fold the ADMITTED ingested documents' CDC chunk digests into
    the standing chunk-digest index (streaming/cdc_ingest.py's probe
    target): digest the unfolded committed documents with the batch
    pipeline (operators/dedup.cdc_hash_rows — the same (hb, h) rows
    the probe joins on) and commit them as a bucket-partitioned
    delta. The docs sink is the landed-document store and is not
    truncated."""
    from streamlit_flink_demo_spark.operators.dedup import cdc_hash_rows

    def write(rows: DataFrame, staging: str) -> None:
        (
            rows.repartition("hb")
            .sortWithinPartitions("h")
            .write.mode("overwrite")
            .partitionBy("hb")
            .parquet(staging)
        )

    return fold_sink_into_index(
        spark,
        docs_sink_path,
        cdc_index_path,
        write,
        rows_fn=lambda tail: cdc_hash_rows(
            tail.select("doc_id", "text")
        ),
        key_prefix="cdc",
        truncate=False,
    )
