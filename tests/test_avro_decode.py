"""Avro binary decode round-trip (SURVEY §2.1 S1, jar-free path).

A mirrored pure-Python ENCODER lives here in the tests; the decoder
under test (sources/avro_decode.py) must invert it for every supported
Avro type, standalone and through the full wire-format DataFrame chain
(header strip → schema id → Arrow-batched decode)."""

from __future__ import annotations

import json
import struct

from streamlit_flink_demo_spark.sources.avro_decode import (
    avro_spark_ddl,
    decode_avro_python,
    decode_record,
)
from streamlit_flink_demo_spark.sources.kafka_avro import decode_wire_format

# -- test-local Avro binary encoder ---------------------------------------


def _wlong(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)  # zigzag
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _wbytes(b: bytes) -> bytes:
    return _wlong(len(b)) + b


def encode(schema, value) -> bytes:
    if isinstance(schema, str):
        if schema == "null":
            return b""
        if schema == "boolean":
            return b"\x01" if value else b"\x00"
        if schema in ("int", "long"):
            return _wlong(value)
        if schema == "float":
            return struct.pack("<f", value)
        if schema == "double":
            return struct.pack("<d", value)
        if schema == "bytes":
            return _wbytes(value)
        if schema == "string":
            return _wbytes(value.encode("utf-8"))
        raise ValueError(schema)
    if isinstance(schema, list):  # union
        if value is None:
            idx = schema.index("null")
        else:
            idx = next(i for i, b in enumerate(schema) if b != "null")
        return _wlong(idx) + encode(schema[idx], value)
    t = schema["type"]
    if t in ("null", "boolean", "int", "long", "float", "double", "bytes",
             "string"):
        return encode(t, value)
    if t == "record":
        return b"".join(
            encode(f["type"], value[f["name"]]) for f in schema["fields"]
        )
    if t == "enum":
        return _wlong(schema["symbols"].index(value))
    if t == "fixed":
        assert len(value) == schema["size"]
        return value
    if t == "array":
        if not value:
            return _wlong(0)
        return _wlong(len(value)) + b"".join(
            encode(schema["items"], v) for v in value
        ) + _wlong(0)
    if t == "map":
        if not value:
            return _wlong(0)
        body = b"".join(
            _wbytes(k.encode()) + encode(schema["values"], v)
            for k, v in value.items()
        )
        return _wlong(len(value)) + body + _wlong(0)
    raise ValueError(t)


FULL_SCHEMA = {
    "type": "record",
    "name": "everything",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "raw", "type": "bytes"},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "color", "type": {"type": "enum", "name": "c",
                                   "symbols": ["RED", "GREEN"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "fx8", "size": 3}},
        {"name": "nums", "type": {"type": "array", "items": "long"}},
        {"name": "attrs", "type": {"type": "map", "values": "int"}},
        {"name": "nested", "type": {
            "type": "record", "name": "inner",
            "fields": [{"name": "x", "type": "long"},
                       {"name": "y", "type": "string"}]}},
    ],
}

FULL_VALUE = {
    "b": True, "i": -42, "l": 1 << 40, "f": 0.5, "d": -2.25,
    "s": "héllo", "raw": b"\x00\x01", "maybe": None, "color": "GREEN",
    "fx": b"abc", "nums": [1, -2, 300], "attrs": {"k1": 7, "k2": -1},
    "nested": {"x": 9, "y": "z"},
}


def test_decode_record_roundtrip_all_types():
    body = encode(FULL_SCHEMA, FULL_VALUE)
    assert decode_record(FULL_SCHEMA, body) == FULL_VALUE
    # union non-null branch too
    v2 = dict(FULL_VALUE, maybe="present", nums=[], attrs={})
    assert decode_record(FULL_SCHEMA, encode(FULL_SCHEMA, v2)) == v2


def test_negative_zigzag_longs():
    s = {"type": "record", "name": "r",
         "fields": [{"name": "v", "type": "long"}]}
    for v in (0, -1, 1, -(1 << 62), (1 << 62), 63, -64):
        assert decode_record(s, encode(s, {"v": v})) == {"v": v}


# the reference's JR `user` topic shape (README.md:108-112)
USER_SCHEMA = {
    "type": "record",
    "name": "user",
    "fields": [
        {"name": "guid", "type": "string"},
        {"name": "eyeColor", "type": "string"},
        {"name": "age", "type": "int"},
        {"name": "balance", "type": "string"},
        {"name": "name", "type": "string"},
        {"name": "registered", "type": ["null", "string"]},
    ],
}


def _wire(schema_id: int, body: bytes) -> bytes:
    return b"\x00" + schema_id.to_bytes(4, "big") + body


def test_wire_format_dataframe_chain(spark):
    """Binary kafka values → header strip + schema id → Arrow-batched
    Avro decode → typed columns, no jars, no broker."""
    users = [
        {"guid": f"g{i}", "eyeColor": ["brown", "blue"][i % 2], "age": 20 + i,
         "balance": f"${i}.00", "name": f"u{i}",
         "registered": None if i % 3 == 0 else f"2024-01-0{i + 1}"}
        for i in range(6)
    ]
    msgs = [(_wire(42, encode(USER_SCHEMA, u)),) for u in users]
    msgs.append((b"\x00\x01",))  # runt message → NULL fields
    df = spark.createDataFrame(msgs, "value binary")
    out = decode_wire_format(df, json.dumps(USER_SCHEMA))
    assert out.columns == ["schema_id", "guid", "eyeColor", "age",
                           "balance", "name", "registered"]
    rows = out.collect()
    assert len(rows) == 7
    by_guid = {r["guid"]: r for r in rows if r["guid"] is not None}
    assert len(by_guid) == 6
    for u in users:
        r = by_guid[u["guid"]]
        assert r["schema_id"] == 42
        assert (r["eyeColor"], r["age"], r["balance"], r["registered"]) == (
            u["eyeColor"], u["age"], u["balance"], u["registered"])
    # the runt message decoded to NULLs, not an error
    assert sum(1 for r in rows if r["guid"] is None) == 1

    # and the decoded frame drives the reference's eyeColor aggregate
    out.createOrReplaceTempView("user_avro")
    agg = {
        r["eyeColor"]: r["n"]
        for r in spark.sql(
            "SELECT eyeColor, count(*) AS n FROM user_avro "
            "WHERE guid IS NOT NULL GROUP BY eyeColor"
        ).collect()
    }
    assert agg == {"brown": 3, "blue": 3}


def test_avro_spark_ddl():
    assert avro_spark_ddl(USER_SCHEMA) == (
        "guid string, eyeColor string, age int, balance string, "
        "name string, registered string"
    )
    ddl = avro_spark_ddl(FULL_SCHEMA)
    assert "nums array<bigint>" in ddl
    assert "attrs map<string, int>" in ddl
    assert "nested struct<x: bigint, y: string>" in ddl
