"""Parquet-backed catalog.

The reference scopes every statement to a configured catalog/database
(reference ``api/statements.py:27-31``, ``config.template.ini:41-44``);
tables appear implicitly (Kafka topics become Flink tables).  Our batch
equivalent: a scale-factor directory of parquet files registered as temp
views, one per table.

Parquet + column pruning + predicate pushdown is the scan path that
survives 100 TB: Catalyst pushes filters and projections into the scan
(visible as ``PushedFilters`` / ``ReadSchema`` in ``.explain``), and
partitioned layouts prune entire files.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always small relative to the fact tables and
# safe to broadcast at any scale factor (region: 5 rows, nation: 25 —
# fixed cardinality in the TPC-H-style schema regardless of SF).
ALWAYS_BROADCAST = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Lazy — no I/O until an action runs.

    ``events.parquet`` has shipped ``ts`` in three vintages: parquet
    TIMESTAMP(NANOS) (which Spark refuses to map to TimestampType — we
    read nanos as LONG via the legacy conf and truncate to micros the
    way DuckDB does), TIMESTAMP(MICROS) without timezone (Spark maps it
    to TIMESTAMP_NTZ), and TIMESTAMP(MICROS) UTC.  Normalize all three
    to session-local TimestampType (session tz is pinned UTC in
    ``session.py``, so the NTZ cast is numerically the identity and
    agrees with DuckDB's naive read) so downstream operators always see
    one type.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


# Memoized scan-partition counts, keyed (weak session → table key):
# one RDD-conversion probe per table per SESSION instead of per
# operator call — the probe itself costs an analysis + JVM roundtrip +
# file listing, which at ~50 queries/session was measurable driver
# drag. The session dimension matters: split confs
# (maxPartitionBytes/defaultParallelism) are per-session, so a count
# memoized under one session must not leak into another; a stopped
# session's entries evaporate with the weak key. In-process file
# rewrites can still stale a live session's memo —
# ``clear_spread_cache()`` is the invalidation hook (pairs with
# ``plans.clear_plan_cache()``).
_SPREAD_PARTS: "weakref.WeakKeyDictionary[SparkSession, dict[str, int]]" = (
    weakref.WeakKeyDictionary()
)


def clear_spread_cache() -> None:
    _SPREAD_PARTS.clear()


def spread(df: DataFrame, n: int | None = None, key: str | None = None) -> DataFrame:
    """Round-robin repartition UP to engine parallelism before a
    compute-heavy per-row kernel (shingling, per-gram hashing, codec
    UDFs, JSON parsing, array explodes).

    Why: a parquet file is splittable only at row-group boundaries, so
    a single-row-group file scans as ONE task and every downstream
    narrow transform inherits that 1-task parallelism — the kernel
    runs on one core of the cluster. Spreading first costs one
    round-robin shuffle of the (pruned, filtered — Catalyst pushes
    both through Repartition) input rows, which is trivial next to the
    kernel it parallelizes.

    When NOT to use: cheap scans feeding aggregations/joins — partial
    aggregation in the scan stage beats an extra full-row shuffle
    (measured: plain groupBy 0.25 s direct vs 0.46 s spread at sf0.1).

    At 100 TB inputs arrive as many well-sized files, so the gate
    (only repartition UP, never down) makes this a no-op there; it
    exists for small/skewed file layouts, which also happen at scale
    (one giant consolidated file, a skewed compaction)."""
    spark = df.sparkSession
    target = n or spark.sparkContext.defaultParallelism
    memo = _SPREAD_PARTS.setdefault(spark, {}) if key is not None else None
    if memo is not None and key in memo:
        parts = memo[key]
    else:
        parts = df.rdd.getNumPartitions()
        if memo is not None:
            memo[key] = parts
    if parts >= target:
        return df
    return df.repartition(target)


def _table_bytes(sf_dir: str, name: str) -> int:
    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, min_bytes: int = 0
) -> DataFrame:
    """``spread(load_table(...))`` with the partition-count probe
    memoized per (sf_dir, table): the raw scan's split count is a
    property of the file layout, constant for the session.

    ``min_bytes`` gates the repartition by INPUT SIZE: below it the
    per-row kernel finishes faster than the round-robin shuffle costs;
    above it the kernel's single-task (or few-task) inheritance of the
    scan split dominates. Heavy kernels (shingle explodes, Arrow
    matmuls, per-gram hashing) pass 0 — they win from parallelism at
    any size measured. Cheap projection kernels pass ~32 MB: at sf0.1
    (≈5 MB documents) the shuffle is a measured 2-4× LOSS, while at
    10× replication (≈50 MB, one parquet file → few scan tasks) the
    unspread kernel goes super-linear (measured 6-21× for 10× data)."""
    df = load_table(spark, sf_dir, name)
    if min_bytes and _table_bytes(sf_dir, name) < min_bytes:
        return df
    return spread(df, key=f"{sf_dir}/{name}")


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table in ``sf_dir`` as a temp view; return the dfs.

    Mirrors the reference's implicit catalog: after this, SQL can say
    ``FROM lineitem`` the way the reference says ``FROM `user```
    (reference ``dashboard.py:83``).
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
