"""Ingest → compact → serve loop demo (round 11).

The continuous half of the pipeline: documents arrive on a stream,
are cleaned and indexed at the door, periodically folded into the
standing artifacts, and served fresh — every stage is the same code
the pytest crash-matrix pins (streaming/*, operators/compaction.py):

    base corpus
      1. base indexes        build_chunk_embed_index (chunk+embed,
                             bucket-partitioned) and init_gram_index
                             (24-gram positions, hash-bucketed)
      2. span-clean ingest   attach_span_rewrite_stream on the gram
                             artifact: arriving docs have spans that
                             repeat in (corpus ∪ batch) cut; cleaned
                             text lands exactly-once
      3. vector ingest       attach_vector_ingest: cleaned docs are
                             chunked, encoded, bucketed, landed
      4. fresh serving       probe_fresh_compacted answers over
                             artifact ∪ committed-unfolded tail — a
                             document ingested seconds ago is
                             retrievable with no rebuild
      5. compaction          tools/compact_ingest adapters fold the
                             committed tails into the artifacts; the
                             probe answers IDENTICALLY before, during,
                             and after the fold, and the NEXT batch's
                             span cleanup sees earlier ingested docs
                             as corpus
      6. takedown            attach_takedown_stream (round 12): a
                             streamed deletion request tombstones the
                             ingested document, and later cleanup
                             batches treat it as never indexed

Run:  python examples/ingest_compact_serve.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints each phase's counts)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamlit_flink_demo_spark.operators.compaction import (  # noqa: E402
    compact_span_ingest,
    compact_vector_ingest,
)
from streamlit_flink_demo_spark.operators.retrieval import (  # noqa: E402
    build_chunk_embed_index,
    chunk_embed_rows,
)
from streamlit_flink_demo_spark.operators.suffix import (  # noqa: E402
    init_gram_index,
)
from streamlit_flink_demo_spark.session import get_spark  # noqa: E402
from streamlit_flink_demo_spark.sinks import (  # noqa: E402
    IdempotentParquetSink,
)
from streamlit_flink_demo_spark.sources.catalog import load_table  # noqa: E402
from streamlit_flink_demo_spark.streaming.span_ingest import (  # noqa: E402
    attach_span_rewrite_stream,
)
from streamlit_flink_demo_spark.streaming.vector_ingest import (  # noqa: E402
    attach_vector_ingest,
    probe_fresh_compacted,
)

_BLOCK = "A-REPEATED-INGEST-BLOCK-THAT-MUST-BE-CUT-0123456789"


def _spool_batch(spark, spool: str, n: int, rows) -> None:
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest_compact_serve_demo")
    work = tempfile.mkdtemp(prefix="ingest_loop_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        print(f"base corpus: {docs.count()} documents ({sf_dir})")

        # 1. standing artifacts
        chunk_art = build_chunk_embed_index(spark, sf_dir)
        gram_art = init_gram_index(
            docs.filter(F.length("text") > 0),
            os.path.join(work, "gram_idx"),
        )
        print("artifacts built: chunk index + gram index")

        # 2. span-clean ingest (artifact-backed, batch semantics)
        spool = os.path.join(work, "spool")
        os.makedirs(spool)
        clean_sink = os.path.join(work, "cleaned")
        q1 = attach_span_rewrite_stream(
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(spool),
            None,
            clean_sink,
            checkpoint_dir=os.path.join(work, "ck_span"),
            gram_index_path=gram_art,
        )
        _spool_batch(
            spark, spool, 0,
            [(900001, f"first arrival carrying {_BLOCK} in its body")],
        )
        q1.processAllAvailable()
        first = IdempotentParquetSink(clean_sink).read_committed(
            spark
        ).collect()[0]
        print(
            f"batch 0 cleaned: spans_removed={first['n_spans_removed']} "
            "(block is new -> kept)"
        )

        # 3. vector ingest of the CLEANED text
        vec_tail = os.path.join(work, "vec_tail")
        os.makedirs(os.path.join(work, "vec_spool"), exist_ok=True)
        q2 = attach_vector_ingest(
            spark.readStream.schema(
                "doc_id bigint, clean_text string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(work, "vec_spool"))
            .select("doc_id", F.col("clean_text").alias("text")),
            vec_tail,
            checkpoint_dir=os.path.join(work, "ck_vec"),
        )
        df0 = spark.createDataFrame(
            [(900001, first["clean_text"])],
            "doc_id bigint, clean_text string",
        )
        stage = os.path.join(work, "vec_spool", "_s0")
        df0.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(stage, part),
            os.path.join(work, "vec_spool", "b0.parquet"),
        )
        q2.processAllAvailable()

        # 4. fresh serving: the just-ingested doc is its own top hit
        q = spark.createDataFrame([(1,)], "q_id bigint").crossJoin(
            chunk_embed_rows(
                spark.createDataFrame(
                    [(900001, first["clean_text"])],
                    "doc_id bigint, text string",
                )
            )
            .limit(1)
            .select(F.col("embedding").alias("q_emb"))
        )
        hit = probe_fresh_compacted(
            spark, chunk_art, vec_tail, q
        ).collect()[0]
        print(
            f"fresh probe top hit: doc {hit['doc_id']} "
            f"(rk={hit['rk']}) — ingested seconds ago, no rebuild"
        )

        # 5. compaction: fold both tails into the standing artifacts
        d1 = compact_span_ingest(spark, gram_art, clean_sink)
        d2 = compact_vector_ingest(spark, chunk_art, vec_tail)
        print(
            f"compacted: span folded {d1['folded_batches']}, vector "
            f"folded {d2['folded_batches']} (tail truncated: "
            f"{d2['truncated']} dirs)"
        )
        hit2 = probe_fresh_compacted(
            spark, chunk_art, vec_tail, q
        ).collect()[0]
        assert (hit2["doc_id"], hit2["rk"]) == (
            hit["doc_id"],
            hit["rk"],
        ), "compaction must not change answers"
        print("probe identical after compaction")

        # 6. the loop pays off: a LATER batch repeating the ingested
        # block is cut against the grown corpus (no reattach needed)
        _spool_batch(
            spark, spool, 1,
            [(900002, f"later arrival reusing {_BLOCK} verbatim")],
        )
        q1.processAllAvailable()
        rows = {
            r["doc_id"]: r
            for r in IdempotentParquetSink(clean_sink)
            .read_committed(spark)
            .collect()
        }
        print(
            "batch 1 cleaned against ingested corpus: "
            f"chars_removed={rows[900002]['chars_removed']} "
            f"(>= {len(_BLOCK) - 1} -> the block was cut)"
        )
        assert rows[900002]["chars_removed"] >= len(_BLOCK) - 1
        q1.stop()
        q2.stop()

        # 7. takedown closes the loop (round 12): a streamed deletion
        # request tombstones doc 900001 in the gram artifact, and the
        # NEXT cleanup batch treats it as never indexed — the block it
        # carried is no longer corpus, so a re-arrival lands uncut.
        from streamlit_flink_demo_spark.streaming.takedown_ingest import (
            attach_takedown_stream,
        )

        td_spool = os.path.join(work, "td_spool")
        os.makedirs(td_spool)
        q3 = attach_takedown_stream(
            spark.readStream.schema("doc_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(td_spool),
            gram_art,
            os.path.join(work, "td_ledger"),
            key_col="doc_id",
            checkpoint_dir=os.path.join(work, "ck_td"),
        )
        df_td = spark.createDataFrame([(900001,)], "doc_id bigint")
        stage = os.path.join(td_spool, "_s0")
        df_td.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(stage, part), os.path.join(td_spool, "b0.parquet")
        )
        q3.processAllAvailable()
        q3.stop()
        from streamlit_flink_demo_spark.operators.suffix import (
            read_gram_index,
            span_rewrite_batch,
        )

        reprobe = span_rewrite_batch(
            spark.createDataFrame(
                [(900003, f"re-arrival with {_BLOCK} after takedown")],
                "doc_id bigint, text string",
            ),
            read_gram_index(spark, gram_art),
        ).collect()[0]
        print(
            "after streamed takedown of doc 900001: re-arrival "
            f"chars_removed={reprobe['chars_removed']} (0 -> the "
            "taken-down document no longer cuts anyone)"
        )
        assert reprobe["chars_removed"] == 0
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
