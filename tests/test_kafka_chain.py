"""Kafka-path integration proof (SURVEY.md §2.1 S1; VERDICT r2 item 7).

No broker or connector jar ships in this container, so the chain is
proven two ways:

1. END-TO-END on a Kafka-SHAPED stream: a file-backed stream with the
   exact ``format("kafka")`` output schema carries real Confluent
   wire-format Avro bytes through header-strip → Arrow-batched Avro
   decode → ``user`` view → continuous GROUP BY through the statements
   façade → retract changelog. Everything downstream of the transport
   is byte-identical to a live-broker run.
2. The REAL ``format("kafka")`` path is gated: when the connector jar
   is absent the entry point must fail with the exact spark-submit
   coordinates; with a jar + ``KAFKA_BOOTSTRAP`` set, the live path
   runs (skipped-with-reason here).

Reference ingest chain: ``README.md:108-112`` (JR → Avro-generic with
Schema Registry → topic ``user``), ``jrconfig.json:1-10``.
"""

from __future__ import annotations

import json
import os

import pytest

from streamlit_flink_demo_spark.changelog import Changelog
from streamlit_flink_demo_spark.sources.kafka_avro import (
    KAFKA_PACKAGE,
    ConnectorUnavailable,
    decode_wire_format,
    kafka_user_stream,
)
from streamlit_flink_demo_spark.sources.stream_fixtures import (
    kafka_shaped_stream,
    write_kafka_batch,
)
from streamlit_flink_demo_spark.statements import StatementsService
from test_avro_decode import USER_SCHEMA, encode


def _wire(schema_id: int, body: bytes) -> bytes:
    return b"\x00" + schema_id.to_bytes(4, "big") + body


def _user(i: int) -> dict:
    return {
        "guid": f"g{i:04d}",
        "eyeColor": ("brown", "blue", "green")[i % 3],
        "age": 20 + i % 40,
        "balance": f"${i}.00",
        "name": f"u{i}",
        "registered": None,
    }


def test_kafka_shaped_wire_chain_through_facade(spark, tmp_path):
    """Wire bytes → kafka-shaped stream → decode → continuous query →
    retract changelog, across two microbatches."""
    spool = str(tmp_path / "kspool")
    raw = kafka_shaped_stream(spark, spool)
    decoded = decode_wire_format(raw, json.dumps(USER_SCHEMA))
    decoded.createOrReplaceTempView("user")

    svc = StatementsService(spark)
    env = svc.create(
        "SELECT eyeColor, count(*) AS n FROM user GROUP BY eyeColor",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert env["status"]["phase"] == "running", env["status"]["detail"]

    write_kafka_batch(
        spark, spool, 0, [_wire(7, encode(USER_SCHEMA, _user(i))) for i in range(6)]
    )
    svc.process_available(env["name"])
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    assert cols == ["eyeColor", "n"]
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))
    got = cl.consume(100)
    # 6 users over 3 eye colors → one +I per color
    assert sorted((r["op"], tuple(r["row"])) for r in got) == [
        (0, ("blue", 2)),
        (0, ("brown", 2)),
        (0, ("green", 2)),
    ]

    # second batch: counts move → -U/+U pairs for the touched keys
    write_kafka_batch(
        spark, spool, 1, [_wire(7, encode(USER_SCHEMA, _user(100 + i))) for i in range(3)]
    )
    svc.process_available(env["name"])
    got2 = cl.consume(100)
    ops = sorted((r["op"], tuple(r["row"])) for r in got2)
    assert (1, ("brown", 2)) in ops and (2, ("brown", 3)) in ops
    assert len(got2) == 6  # three keys touched → three -U/+U pairs
    svc.stop(env["name"])


def test_kafka_shaped_schema_matches_real_source():
    """The substitute's schema is the Kafka source's documented seven
    columns — if this drifts, the chain test stops being a proof."""
    from streamlit_flink_demo_spark.sources.stream_fixtures import KAFKA_SHAPE

    assert KAFKA_SHAPE == (
        "key binary, value binary, topic string, partition int, "
        "offset bigint, timestamp timestamp, timestampType int"
    )


def test_real_kafka_source_gated(spark):
    """Without the connector jar the entry point raises
    ConnectorUnavailable carrying the exact --packages remedy; with a
    jar but no broker configured, the live path is skipped with the
    spark-submit instructions."""
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    try:
        df = kafka_user_stream(
            spark,
            bootstrap or "localhost:9092",
            json_schema_ddl="guid string, eyeColor string",
        )
    except ConnectorUnavailable as ex:
        assert KAFKA_PACKAGE in str(ex)
        return
    if not bootstrap:
        pytest.skip(
            "kafka jar present but no broker in sandbox; run "
            f"spark-submit --packages {KAFKA_PACKAGE} with "
            "KAFKA_BOOTSTRAP=<host:port> for the live path"
        )
    assert df.isStreaming


def test_decode_wire_format_keep_cols_passthrough(spark):
    """Source metadata (kafka timestamp/offset) must survive the
    decode — an event-time window over the decoded stream needs the
    timestamp column, and without the passthrough callers would have
    to re-implement the strip/decode chain by hand."""
    import datetime

    from streamlit_flink_demo_spark.sources.stream_fixtures import KAFKA_SHAPE

    ts = datetime.datetime(2024, 1, 1, 0, 0, 7)
    rows = [
        {
            "key": None,
            "value": _wire(7, encode(USER_SCHEMA, _user(i))),
            "topic": "user",
            "partition": 0,
            "offset": 100 + i,
            "timestamp": ts,
            "timestampType": 0,
        }
        for i in range(4)
    ]
    raw = spark.createDataFrame(rows, schema=KAFKA_SHAPE)
    out = decode_wire_format(
        raw, json.dumps(USER_SCHEMA), keep_cols=("timestamp", "offset")
    )
    assert {"timestamp", "offset", "schema_id", "guid"} <= set(out.columns)
    got = {(r["offset"], r["timestamp"], r["guid"]) for r in out.collect()}
    assert got == {(100 + i, ts, f"g{i:04d}") for i in range(4)}


def test_kafka_decoded_stream_event_time_window(spark, tmp_path):
    """The purpose of keep_cols end to end: wire bytes → decode with
    the kafka timestamp carried through → event-time tumbling window
    GROUP BY through the facade → retract changelog. Before the
    passthrough this failed analysis with an unresolved `timestamp`."""
    spool = str(tmp_path / "kwspool")
    raw = kafka_shaped_stream(spark, spool)
    decoded = decode_wire_format(
        raw, json.dumps(USER_SCHEMA), keep_cols=("timestamp",)
    )
    decoded.createOrReplaceTempView("user_evt")

    svc = StatementsService(spark)
    env = svc.create(
        "SELECT window(timestamp, '1 minute').start AS w_start, "
        "count(*) AS n FROM user_evt GROUP BY window(timestamp, '1 minute')",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert env["status"]["phase"] == "running", env["status"]["detail"]

    # batch 0 lands at 00:00:00, batch 61 at 00:01:01 (write_kafka_batch
    # stamps ts = batch_no % 60 seconds — use two batches a minute apart)
    write_kafka_batch(
        spark, spool, 0, [_wire(7, encode(USER_SCHEMA, _user(i))) for i in range(4)]
    )
    svc.process_available(env["name"])
    cl = Changelog(
        ["w_start", "n"], svc.results(env["name"], continuous_query=True)
    )
    got = cl.consume(100)
    assert [(r["op"], r["row"][1]) for r in got] == [(0, 4)]

    # same minute → the window's count updates with a retract pair
    write_kafka_batch(
        spark, spool, 1, [_wire(7, encode(USER_SCHEMA, _user(10 + i))) for i in range(2)]
    )
    svc.process_available(env["name"])
    got2 = cl.consume(100)
    assert [(r["op"], r["row"][1]) for r in got2] == [(1, 4), (2, 6)]
    svc.stop(env["name"])
