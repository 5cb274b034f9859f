#!/usr/bin/env python
"""Reproduce the SCALE.md 10× corpus-replication measurement.

Generates perturbed 10× replicas of ``documents`` / ``embeddings`` from
$SPARK_GRAFT_SF_DIR (default sf0.1) into /tmp/scale10 via DuckDB, then
times the LLM-pipeline operators at 1× and 10× on the same session
(best-of-2, cache cleared between operators) and prints one JSON line.

Texts get a per-replica suffix so shingle document-frequencies keep
their shape (pure duplication would trip the Jaccard df-cap and
understate join work); embeddings get an ε-perturbation per replica so
near-dup semantics stay realistic.

Usage:  python tools/scale_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OPS = (
    "text_quality_stats",
    "text_fingerprint",
    "multimodal_video_keyframes",
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_passages",
    "dedup_substring_spans",
    "dedup_span_rewrite",
    "dedup_incremental",
    "dedup_connected_clusters",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "docs_cluster_kmeans",
    "docs_bm25_topk",
    "multimodal_audio_features",
    "docs_lm_score",
    "docs_semdedup",
    "docs_dsir_weights",
    "docs_nb_classify",
    "text_topngram",
    "docs_pagerank",
    "multimodal_phash_pairs",
    "ann_pq_adc_topk",
    "docs_bpe_merges",
    "docs_bpe_tokenize",
    "ann_ivfpq_topk",
    "embeddings_hard_negatives",
    "docs_source_overlap",
    "embeddings_label_margins",
    # round 9
    "dedup_suffix_spans",
    "docs_embed",
    "docs_embed_semdedup",
    "docs_embed_search",
    "corpus_suffix_array",
    "docs_bloom_dedup",
    # round 10 (construction scaling for the suffix family lives in
    # tools/suffix_scale.py — this harness's best-of-2 would report
    # their post-build probe floor, the SCALE.md round-9 caveat)
    "ann_ivf_incremental_topk",
    "ann_lsh_incremental_topk",
    # round 10 continuation: gram-count lookup is scan+probe per call
    # (no build artifact), temperature mix is one map-side-combined agg
    "corpus_gram_lookup",
    "corpus_pattern_lookup",
    "docs_lang_temperature_mix",
    # round 10, third session: hybrid fusion (two top-k scans + a
    # 50-row join), greedy k-center (k bounded argmax scans), and
    # A-ES weighted sampling (one scan into per-partition heaps)
    "docs_hybrid_search_rrf",
    "docs_kcenter_diverse",
    "docs_weighted_sample",
    # CCNet gate: LM-score two aggs + distributed-NTILE rank
    "docs_ccnet_buckets",
    # recall eval: three memoized rankers + two k-row joins
    "ann_recall_eval",
    # multi-probe LSH: same artifact, 3x probe fan-out per band
    "ann_lsh_multiprobe_topk",
    # chunking is map-only; chunk search = chunk+encode pass + rank
    "docs_chunk_overlap",
    "docs_chunk_embed_search",
    # filtered ANN: label-pruned scoring join; calibration: candidate-
    # bounded exact-Jaccard joins over the emitted pair list
    "ann_filtered_topk",
    "dedup_minhash_calibration",
    # leakage-safe split: cluster labels + one per-cluster agg
    "docs_leakage_safe_split",
    "events_zorder_skipping",
    # round 11: build-once artifacts probed bucket-pruned (best-of-2
    # reports the probe floor — the build is ledgered in bench.py /
    # disclosed in SCALE.md), the sampled k-center twin, and the
    # tombstone-probe parity path
    "docs_chunk_ann_search",
    "dedup_span_rewrite_delta_gramidx",
    "docs_kcenter_sampled",
    "ann_lsh_tombstone_topk",
    # round 11 continuation: multiprobe fan-out over the same chunk
    # artifact, CDC dedup (map-only chunking + one digest group-by),
    # frozen-quantizer IVF deletion probe
    "docs_chunk_ann_multiprobe",
    "dedup_cdc_chunks",
    "ann_ivf_tombstone_topk",
    # round 11 late additions: retention is two shared-exchange aggs;
    # the 13-gram screen is one gram projection + one hash join
    "events_retention_cohorts",
    "contamination_ngram13",
    # round 12: extraction is one map-only projection; the CDC and
    # suffix artifact probes report their post-build probe floor
    # (builds ledgered in bench.py, disclosed in SCALE.md)
    "docs_extract_text",
    "docs_extract_quality",
    "docs_extract_links",
    "dedup_cdc_incremental",
    "dedup_cdc_incremental_idx",
    "dedup_incremental_sigidx",
    "corpus_longest_repeat_indexed",
    # round 13: WARC container framing (map-only walk per file row),
    # the URL frontier (projection + one combine-enabled group-by),
    # and the extraction yield rollup (one global aggregate)
    "docs_warc_extract",
    "docs_url_frontier",
    "docs_extract_yield",
    # round 13: robots gate = frontier + broadcast rules join + one
    # host-partitioned wave window
    "docs_crawl_gate",
    # round 13 continuation: host rank = one edge-build scan + power
    # iterations on the host-sized graph; recrawl = frontier + 4-way
    # explode + one group-by + one host-partitioned window
    "docs_host_rank",
    "docs_recrawl_schedule",
)


def generate(src: str, dst: str, factor: int = 10) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT doc_id + k.k * {n_docs} AS doc_id,
         CASE WHEN k.k = 0 THEN text
              ELSE text || ' rep' || k.k || ' tok' || k.k END AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'),
       (SELECT unnest(range({factor})) AS k) k
) TO '{dst}/documents.parquet' (FORMAT parquet)
""")
    con.execute(f"""
COPY (
  SELECT vec_id + k.k * {n_vecs} AS vec_id,
         CASE WHEN k.k = 0 THEN embedding
              ELSE list_transform(embedding,
                                  x -> x + (k.k * 0.0001)::FLOAT)
         END AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'),
       (SELECT unnest(range({factor})) AS k) k
) TO '{dst}/embeddings.parquet' (FORMAT parquet)
""")
    # events: 10 user cohorts inside the SAME time window (new
    # user_ids, fresh event_ids) — grows the user dimension the way a
    # bigger deployment does, without stretching the clamped time axis
    con.execute(f"""
COPY (
  SELECT event_id + k.k * 100000000 AS event_id,
         ts, user_id + k.k * 10000 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'),
       (SELECT unnest(range({factor})) AS k) k
) TO '{dst}/events.parquet' (FORMAT parquet)
""")


def main() -> int:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # reuse existing replicas (SCALE_SWEEP_REUSE=1) so a sweep can be
    # split across invocations; SCALE_SWEEP_OPS=a,b,c narrows the set.
    # The replica dir and metric tag DEFAULT from the factor so a
    # SCALE_SWEEP_FACTOR=100 run can't silently overwrite /tmp/scale10
    # or label its rows scale_sweep_x10 (code-review r12).
    try:
        factor = int(os.environ.get("SCALE_SWEEP_FACTOR", "10"))
    except ValueError:
        factor = 10
    dst = os.environ.get("SCALE_SWEEP_DIR", f"/tmp/scale{factor}")
    tag_hi = os.environ.get("SCALE_SWEEP_TAG", f"x{factor}")
    ops = tuple(
        o.strip()
        for o in os.environ.get("SCALE_SWEEP_OPS", "").split(",")
        if o.strip()
    ) or OPS
    unknown = set(ops) - set(OPS)
    if unknown:
        # fail BEFORE the minutes-long 10× generation, like bench.py's
        # BENCH_QUERIES guard
        print(f"unknown SCALE_SWEEP_OPS: {sorted(unknown)}", file=sys.stderr)
        return 2
    if not (
        os.environ.get("SCALE_SWEEP_REUSE") == "1"
        and os.path.exists(os.path.join(dst, "embeddings.parquet"))
    ):
        generate(src, dst, factor=factor)

    from streamlit_flink_demo_spark.plans import load_all
    from streamlit_flink_demo_spark.session import get_spark

    spark = get_spark("scale_sweep")
    reg = load_all(exposed_only=False)
    spark.read.parquet(os.path.join(src, "region.parquet")).count()

    # SCALE_SWEEP_COLD=1: clear cached blocks before EVERY timed rep,
    # so operators that persist a shared corpus frame (track_persist —
    # the _minhash_frame/_cdc_chunks_frame discipline) measure their
    # cold scan instead of the warm-session floor. Required for honest
    # probe-vs-recompute comparisons: an artifact probe pays its delta
    # work every rep while a recompute's corpus pass would otherwise
    # amortize into rep 1 and vanish from best-of-2.
    cold = os.environ.get("SCALE_SWEEP_COLD") == "1"
    out = {}
    for name in ops:
        row = {}
        for tag, d in (("base", src), (tag_hi, dst)):
            best = None
            for _ in range(2):
                if cold:
                    spark.catalog.clearCache()
                t0 = time.perf_counter()
                reg[name].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            row[tag] = round(best, 2)
            spark.catalog.clearCache()
        row["ratio"] = (
            round(row[tag_hi] / row["base"], 1) if row["base"] else None
        )
        out[name] = row
        print(f"  {name}: {row}", file=sys.stderr)
    print(
        json.dumps(
            {"metric": f"scale_sweep_{tag_hi}", "operators": out}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
