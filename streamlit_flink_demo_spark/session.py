"""SparkSession factory.

Centralizes every config the engine depends on.  The non-negotiable one
is ``spark.sql.ansi.enabled=false``: local Spark is 4.1.2 with ANSI on
by default, where ``CAST('3,277.32' AS DOUBLE)`` *throws*; the reference
relies on Flink's null-on-failure cast (reference ``dashboard.py:120``
``CAST(substring(balance FROM 2) AS DOUBLE)`` over ``"$1,234.56"``
strings), so ANSI must be off for compatible semantics.

Scale posture: these settings are tuned for the local[32] test box but
written so the same code runs on a 1000-executor cluster — AQE handles
runtime partition coalescing and skew joins, shuffle partitions are
overridable via env, and nothing below hard-codes single-node
assumptions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(app_name: str = "streamlit_flink_demo_spark") -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Idempotent: Spark returns the active session if one exists, so tests
    and the driver can call this freely.
    """
    cpus = _cpus()
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
        )
        .appName(app_name)
        # Flink-compatible cast semantics: null on failure, not error
        # (SURVEY.md §4; reference dashboard.py:120).
        .config("spark.sql.ansi.enabled", "false")
        # AQE: runtime re-planning — coalesce tiny shuffle partitions,
        # convert to broadcast joins when runtime stats allow, split
        # skewed partitions.  Essential at 100 TB, harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        # DuckDB timestamps are UTC-naive; pin the session TZ so the
        # oracle comparison sees identical wall-clock values.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for all pandas interchange (Pandas UDFs, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS); read as long + convert
        # (sources/catalog.py) — Spark has no nanos TimestampType.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
