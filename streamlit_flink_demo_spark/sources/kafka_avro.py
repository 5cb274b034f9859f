"""Kafka + Confluent-Avro source (SURVEY.md §2.1 S1).

The reference's input path: JR → Avro-generic (Schema Registry wire
format) → Kafka topic ``user`` → Flink dynamic table (reference
``README.md:108-112``, ``jrconfig.json:5-8``,
``schema-registry-config.template.properties:1-3``). Spark equivalent:

    spark.readStream.format("kafka") …
      → strip the 5-byte Confluent wire-format header
      → from_avro(payload, schema_json)
      → temp view ``user``

This container ships neither the spark-sql-kafka nor the spark-avro
connector jar, so the entry points raise ``ConnectorUnavailable`` with
the spark-submit coordinates a real cluster would add; the pure-
expression pieces (header strip, JSON fallback decode) are fully
functional and tested on batch data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0"
AVRO_PACKAGE = "org.apache.spark:spark-avro_2.13:4.0.0"


class ConnectorUnavailable(RuntimeError):
    pass


def strip_confluent_header(value: Column) -> Column:
    """Remove the Confluent Schema Registry wire-format prefix: one
    magic byte (0x00) + 4-byte big-endian schema id; the Avro body
    follows. Pure expressions over the PASSED column (an F.expr with a
    hardcoded 'value' name would silently read the wrong column — or
    blow up — when value_col differs); works on batch or stream."""
    body = F.substring(value, 6, F.octet_length(value) - F.lit(5))
    return (
        F.when(F.octet_length(value) > 5, body)
        .otherwise(F.lit(None).cast("binary"))
        .alias("avro_body")
    )


def confluent_schema_id(value: Column) -> Column:
    """The 4-byte big-endian schema id from the wire-format header —
    used to look the writer schema up in the registry."""
    b = lambda i: F.conv(
        F.hex(F.substring(value, i, 1)), 16, 10
    ).cast("int")
    return (
        b(2) * F.lit(1 << 24) + b(3) * F.lit(1 << 16) + b(4) * F.lit(1 << 8) + b(5)
    ).alias("schema_id")


def decode_avro(body: Column, schema_json: str) -> Column:
    """Avro decode via spark-avro; raises with remedy if jar missing.
    (Jar-free alternative: ``decode_wire_format`` below, which decodes
    the Avro body in Arrow-batched Python — same plan shape, no
    connector required.)"""
    try:
        from pyspark.sql.avro.functions import from_avro

        return from_avro(body, schema_json).alias("record")
    except Exception as ex:  # pragma: no cover - jar-dependent
        raise ConnectorUnavailable(
            f"spark-avro not on classpath; add --packages {AVRO_PACKAGE}"
        ) from ex


def decode_wire_format(
    df: DataFrame,
    schema_json: str | None = None,
    value_col: str = "value",
    registry: "object | None" = None,
    subject: str | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Full Confluent wire-format decode with NO connector jars: strip
    the 5-byte header (JVM expression), then decode the Avro binary
    body via the pure-Python Arrow-batched decoder
    (sources/avro_decode.py). Works identically on batch and streaming
    DataFrames — this is the sandbox-runnable twin of
    ``from_avro(strip_confluent_header(value), schema)``.

    Writer-schema resolution (reference
    ``schema-registry-config.template.properties:1-3``): pass either
    ``schema_json`` directly, or a ``registry``
    (sources/schema_registry.SchemaRegistryClient) — then the schema id
    the wire header carries is looked up over HTTP (cached per id).
    With ``subject`` the subject's latest version is used (required for
    streaming inputs, where the batch can't be probed up front); batch
    inputs are probed for their distinct schema ids, and a batch
    spanning several ids (mid-stream schema evolution) decodes each id
    with its own writer schema and unions by name — compatible
    evolutions merge, incompatible ones raise."""
    from streamlit_flink_demo_spark.sources.avro_decode import (
        decode_avro_python,
    )

    # ``keep_cols`` ride alongside the decode (kafka timestamp, key,
    # topic, partition, offset): without the passthrough, an event-time
    # window over the decoded stream has no timestamp column to group
    # on and callers must re-implement the strip/decode chain by hand.
    passthrough = ("schema_id",) + tuple(keep_cols)
    stripped = df.select(
        *[F.col(c) for c in keep_cols],
        confluent_schema_id(F.col(value_col)),
        strip_confluent_header(F.col(value_col)),
    )
    if schema_json is None:
        if registry is None:
            raise ValueError("provide schema_json or registry")
        if subject is not None:
            _, schema_json = registry.get_latest(subject)
        elif df.isStreaming:
            raise ValueError(
                "streaming decode needs subject= (or explicit "
                "schema_json=): the stream cannot be probed for its "
                "schema ids before it runs"
            )
        else:
            ids = sorted(
                r[0]
                for r in stripped.select("schema_id").distinct().collect()
                if r[0] is not None
            )
            if not ids:
                raise ValueError("no wire-format rows to resolve a schema from")
            if len(ids) > 1:
                parts = [
                    decode_avro_python(
                        stripped.filter(F.col("schema_id") == i),
                        registry.get_schema(i),
                        binary_col="avro_body",
                        keep_cols=passthrough,
                    )
                    for i in ids
                ]
                out = parts[0]
                for p in parts[1:]:
                    # allowMissingColumns: the canonical COMPATIBLE
                    # evolution is an added field — the older ids'
                    # rows take NULL for it (exactly what a reader
                    # schema with a defaulted new field yields);
                    # genuinely incompatible evolutions (same name,
                    # different type) still raise from the union's
                    # type check.
                    out = out.unionByName(p, allowMissingColumns=True)
                return out
            schema_json = registry.get_schema(ids[0])
    return decode_avro_python(
        stripped, schema_json, binary_col="avro_body", keep_cols=passthrough
    )


def decode_json_value(body: Column, schema_ddl: str) -> Column:
    """JSON fallback decode (for JR's json serializer mode) — always
    available; used by tests to exercise the full decode pipeline."""
    return F.from_json(body.cast("string"), schema_ddl).alias("record")


def kafka_user_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "user",
    avro_schema_json: str | None = None,
    json_schema_ddl: str | None = None,
    starting_offsets: str = "earliest",
    registry: "object | None" = None,
    subject: str | None = None,
) -> DataFrame:
    """The reference's dynamic table over topic ``user``.

    Scale posture: one Kafka partition maps to one Spark input
    partition; parallelism follows the topic, no repartition before
    per-record decode (narrow). Decode is JVM-side from_avro; with a
    ``registry`` (sources/schema_registry) and no explicit schema the
    writer schema is resolved from the subject's latest version
    (default subject: ``{topic}-value``), matching the reference's
    runtime lookup."""
    if avro_schema_json is None and registry is not None:
        _, avro_schema_json = registry.get_latest(subject or f"{topic}-value")
    try:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
        raw = reader.load()
    except Exception as ex:
        raise ConnectorUnavailable(
            f"kafka source unavailable; add --packages {KAFKA_PACKAGE}"
        ) from ex
    body = strip_confluent_header(F.col("value"))
    if avro_schema_json is not None:
        rec = decode_avro(body, avro_schema_json)
    elif json_schema_ddl is not None:
        rec = decode_json_value(F.col("value"), json_schema_ddl)
    else:
        raise ValueError("provide avro_schema_json or json_schema_ddl")
    return raw.select(rec).select("record.*")
