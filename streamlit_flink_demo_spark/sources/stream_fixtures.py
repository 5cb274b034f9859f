"""Streaming test fixtures: the reference's ``user`` table as a
file-fed stream with deterministic microbatch boundaries.

The reference's input is JR-generated Avro rows on a Kafka topic
(reference ``README.md:108-112``, ``jrconfig.json:1-10``; fields used
by the queries: guid, eyeColor, age, balance — ``dashboard.py:83,100,
120-125``). For hermetic tests we generate the same row shape
deterministically and feed it through a file stream where **one file
= one microbatch** (``maxFilesPerTrigger=1``), which makes changelog
op-sequence assertions exact.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

USER_SCHEMA = (
    "guid string, eyeColor string, age int, balance string, "
    "name string, registered timestamp"
)

_EYE_COLORS = ("brown", "blue", "green")


def user_row(i: int) -> dict:
    """Deterministic JR-style user row. balance is the '$#,##0.00'
    string the reference's CAST-after-substring relies on (values over
    $1,000 carry the comma that makes the DOUBLE cast yield NULL)."""
    bal = round(100.0 + (i * 7919 % 990000) / 100.0, 2)
    whole, frac = divmod(round(bal * 100), 100)
    balance = f"${whole:,d}.{frac:02d}"
    return {
        "guid": str(uuid.UUID(int=i)),
        "eyeColor": _EYE_COLORS[i % len(_EYE_COLORS)],
        "age": 18 + (i * 31) % 48,
        "balance": balance,
        "name": f"user_{i}",
        "registered": None,
    }


def write_user_batch(
    spark: SparkSession, dir_path: str, batch_no: int, rows: Iterable[dict]
) -> None:
    """Append one microbatch-worth of users as a single parquet file."""
    df = spark.createDataFrame(list(rows), schema=USER_SCHEMA)  # type: ignore[arg-type]
    staging = os.path.join(dir_path, f"_stage_{batch_no}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging) if f.startswith("part-") and f.endswith(".parquet")
    )
    os.replace(
        os.path.join(staging, part),
        os.path.join(dir_path, f"batch_{batch_no:05d}.parquet"),
    )


def user_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    """Unbounded `user` stream over a spool directory; one file per
    trigger so tests control batch boundaries exactly."""
    os.makedirs(dir_path, exist_ok=True)
    return (
        spark.readStream.schema(USER_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )


# -- Kafka-shaped stream substitute ----------------------------------------
# The exact output schema of ``spark.readStream.format("kafka")`` (the
# seven columns every Kafka-source query sees). A file-backed stream
# with this schema is the sandbox substitute for a live broker: the
# entire downstream chain (header strip → Avro decode → view → continuous
# query) is byte-identical to the real source, only the transport
# differs. Reference ingest: README.md:108-112 (JR → Avro → topic user).
KAFKA_SHAPE = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def write_kafka_batch(
    spark: SparkSession,
    dir_path: str,
    batch_no: int,
    values: Iterable[bytes],
    topic: str = "user",
) -> None:
    """One microbatch of Kafka-shaped records; ``values`` are the raw
    message bytes (e.g. Confluent wire-format Avro)."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 0, 0, batch_no % 60)
    rows = [
        {
            "key": None,
            "value": bytes(v),
            "topic": topic,
            "partition": 0,
            "offset": batch_no * 1_000_000 + i,
            "timestamp": ts,
            "timestampType": 0,
        }
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, schema=KAFKA_SHAPE)  # type: ignore[arg-type]
    staging = os.path.join(dir_path, f"_stage_k{batch_no}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.replace(
        os.path.join(staging, part),
        os.path.join(dir_path, f"batch_{batch_no:05d}.parquet"),
    )


def kafka_shaped_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    """Unbounded stream with the Kafka source's schema; one file per
    trigger, like ``user_stream``."""
    os.makedirs(dir_path, exist_ok=True)
    return (
        spark.readStream.schema(KAFKA_SHAPE)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )
