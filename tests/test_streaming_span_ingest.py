"""Ingest-time exact span cleanup (streaming/span_ingest.py):
batch rows pinned against an INDEPENDENT pure-Python rewrite oracle,
corpus-vs-batch-internal repeat visibility, and the exactly-once
restart contract for rows and summaries."""

from __future__ import annotations

import hashlib
import os

from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.span_ingest import (
    attach_span_rewrite_stream,
    corpus_span_index,
    span_rewrite_batch,
)

_CAP, _T = 64, 24

_CORPUS = [
    (101, "corpus doc holding THE-REPEATED-CORPUS-BLOCK-24+ and tail"),
    (102, "another corpus doc, entirely unrelated words only here"),
]
_BATCH = [
    # shares a >=24-char block ONLY with the corpus
    (1, "arrival with THE-REPEATED-CORPUS-BLOCK-24+ trailing text"),
    # batch-INTERNAL repeat: 2 and 3 share a block absent from corpus
    (2, "first copy of BATCH-INTERNAL-REPEATED-SPAN-XYZ in here"),
    (3, "second copy of BATCH-INTERNAL-REPEATED-SPAN-XYZ over there"),
    # nothing repeated anywhere
    (4, "wholly unique arrival document with fresh words entirely"),
    (5, ""),  # empty: dropped (no row)
]


def _py_rewrite(batch, corpus):
    """Independent reference: credited max common prefix (cap 64) of
    each batch position against ALL other positions in corpus∪batch,
    threshold 24, merged intervals cut."""
    univ = [(d, t) for d, t in corpus + batch if t]
    wins = [
        (t[p : p + _CAP], d, p)
        for d, t in univ
        for p in range(len(t))
    ]
    out = {}
    for doc_id, text in batch:
        if not text:
            continue
        ivs = []
        for p in range(len(text)):
            w = text[p : p + _CAP]
            best = 0
            for w2, d2, p2 in wins:
                if (d2, p2) == (doc_id, p):
                    continue
                cp = 0
                for a, b in zip(w, w2):
                    if a != b:
                        break
                    cp += 1
                best = max(best, cp)
            if best >= _T:
                ivs.append((p, p + best))
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        clean = "".join(
            c
            for k, c in enumerate(text)
            if not any(s <= k < e for s, e in merged)
        )
        out[doc_id] = (
            len(text),
            len(clean),
            len(merged),
            sum(e - s for s, e in merged),
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


def test_batch_rewrite_matches_pure_python_oracle(spark):
    corpus = spark.createDataFrame(_CORPUS, "doc_id bigint, text string")
    batch = spark.createDataFrame(_BATCH, "doc_id bigint, text string")
    got = {
        r.doc_id: (
            r.orig_chars,
            r.clean_chars,
            r.n_spans_removed,
            r.chars_removed,
            r.clean_md5,
        )
        for r in span_rewrite_batch(
            batch, corpus_span_index(corpus)
        ).collect()
    }
    want = _py_rewrite(_BATCH, _CORPUS)
    assert got == want
    # semantics spot-checks: corpus-repeat cut, batch-internal cut,
    # unique doc byte-identical
    assert got[1][3] >= _T
    assert got[2][3] >= _T and got[3][3] >= _T
    assert got[4][2] == 0
    assert got[4][4] == hashlib.md5(_BATCH[3][1].encode()).hexdigest()
    assert 5 not in got


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def test_stream_lands_exactly_once_with_bounded_summaries(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "rewritten")
    ck = str(tmp_path / "ck")
    corpus = spark.createDataFrame(_CORPUS, "doc_id bigint, text string")
    summaries = []

    q = attach_span_rewrite_stream(
        _stream(spark, spool), corpus, out,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        _write_batch(spark, spool, 0, _BATCH)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = IdempotentParquetSink(out).read_committed(spark).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 3, 4]
    assert len(summaries) == 1
    assert summaries[0]["n_docs"] == 4
    assert summaries[0]["n_rewritten"] == 3
    assert summaries[0]["chars_removed"] >= 3 * _T

    # restart from the same checkpoint: the committed batch must not
    # rewrite anything or re-fire its summary
    q2 = attach_span_rewrite_stream(
        _stream(spark, spool), corpus, out,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows2 = IdempotentParquetSink(out).read_committed(spark).collect()
    assert sorted(tuple(r) for r in rows2) == sorted(tuple(r) for r in rows)
    assert len(summaries) == 1


def _stream(spark, spool):
    return (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
