#!/usr/bin/env python
"""End-to-end training-data pipeline over the documents corpus:

    quality gate -> exact dedup -> stratified sample -> train/eval
    split -> domain-mix report -> deterministic shard write

Every decision is a pure function of the data (md5-derived hashes, no
RAND()), so re-running this script produces byte-identical shards —
the property a resumable 100 TB ingestion run needs. The per-stage
logic is the same code the verified operators run
(operators/pipeline.py, operators/sampling.py, sinks.py).

Run: python examples/training_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from streamlit_flink_demo_spark.functions.hashing import u60
from streamlit_flink_demo_spark.operators.sampling import _rate_bps_col
from streamlit_flink_demo_spark.session import get_spark
from streamlit_flink_demo_spark.sinks import write_training_shards
from streamlit_flink_demo_spark.sources.catalog import load_table

N_SHARDS = 8


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(tempfile.mkdtemp(prefix="shards-"), "docs")
    )
    spark = get_spark("training-pipeline")

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. quality gate (length + token floor)
    kept = docs.filter(
        F.col("n_chars").between(100, 500)
        & (F.regexp_count(F.col("text"), F.lit(r"\S+")) >= 20)
    )

    # 2. exact dedup: keep the lowest doc_id per content digest
    #    (digest-only shuffle; text never crosses the wire)
    hashed = kept.withColumn("h", F.md5("text"))
    uniq = (
        hashed.withColumn("keep_id", F.min("doc_id").over(W.partitionBy("h")))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("h", "keep_id")
    )

    # 3. per-language stratified sample (salted hash gate)
    draw = u60(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))) % 10_000
    sampled = uniq.filter(draw < _rate_bps_col()).persist()

    # 4. train/eval split (independent hash draw)
    split = F.when(
        u60(F.col("doc_id").cast("string")) % 100 < 90, "train"
    ).otherwise("eval")
    train = sampled.filter(split == "train")

    # yield report
    print(f"raw documents:      {n_raw}")
    report = (
        sampled.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("chars"))
        .orderBy("split", "lang")
    )
    for r in report.collect():
        print(f"  {r.split:5s} {r.lang}  n={r.n_docs:<6d} chars={r.chars}")

    # domain mix of what survived
    mix = (
        train.groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(5)
    )
    print("top-5 sources in train:")
    for r in mix.collect():
        print(f"  {r.source}: {r.n}")

    # 5. deterministic shard write of the train split
    write_training_shards(
        train.select("doc_id", "text", "lang", "source"),
        out,
        key_col="doc_id",
        n_shards=N_SHARDS,
    )
    files = sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    )
    print(f"wrote {len(files)} shards to {out}")
    sampled.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
