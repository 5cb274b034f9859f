"""Batch sinks: deterministic training-shard writer.

The reference's sinks are client-side (pandas frames feeding Streamlit
widgets — `dashboard.py`); those live in changelog.py. This module is
the batch counterpart a training pipeline needs: materialize a corpus
as N parquet shards whose assignment AND within-shard order are pure
functions of the data (operators/sampling.py docs_shuffle_shard is the
accounting view of the same layout), so a re-run over 100 TB produces
byte-identical shards and a data loader can resume mid-epoch.

Layout: ``<path>/shard=<k>/part-*.parquet`` — one directory per shard
(Spark partitioned layout, so shard-pruned reads are free), exactly one
file per shard directory, rows ordered by the shuffle sort key.

Scale posture: one hash repartition on the shard id (the only shuffle),
sortWithinPartitions (shard-local sort, never a global sort), then a
direct parquet write. Shard count should scale with the corpus
(~1-4 GB per shard at 100 TB → tens of thousands of shards); the
writer takes it as a parameter rather than guessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.hashing import u60


def with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Add deterministic ``sort_key`` / ``shard`` columns derived from
    u60('shuf:' || key) — the same derivation docs_shuffle_shard
    verifies against the DuckDB oracle."""
    sort_key = u60(F.concat(F.lit("shuf:"), F.col(key_col).cast("string")))
    return df.withColumn("sort_key", sort_key).withColumn(
        "shard", F.col("sort_key") % n_shards
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 16,
) -> None:
    """Write ``df`` as ``n_shards`` deterministic parquet shards.

    repartition(n_shards, shard) maps each shard id to exactly one
    task, so each shard directory gets exactly one file (no small-file
    explosion). sortWithinPartitions leads with the partition column:
    the dynamic-partition writer would otherwise inject its own
    (unstable) sort on 'shard' and scramble the secondary order — with
    the shard-first sort already in place it writes rows as-is, in the
    (sort_key, key) order the docs_shuffle_shard oracle pins via
    ROW_NUMBER()."""
    keyed = with_shard(df, key_col, n_shards)
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Read one shard via partition pruning (no other shard's files
    are touched — the pushed filter on the partition column prunes
    directories, not rows)."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)
