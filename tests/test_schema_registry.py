"""Schema Registry client: cached HTTP resolution feeding the
wire-format decode end to end, against a stub registry server."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from streamlit_flink_demo_spark.sources.kafka_avro import decode_wire_format
from streamlit_flink_demo_spark.sources.schema_registry import (
    SchemaRegistryClient,
    SchemaRegistryError,
)
from test_avro_decode import USER_SCHEMA, encode
from test_kafka_chain import _user, _wire


class _StubRegistry:
    """In-process registry speaking just enough of the REST surface:
    /schemas/ids/{id} and /subjects/{s}/versions/latest."""

    def __init__(self, schemas: dict[int, dict], latest: dict[str, int]):
        self.requests: list[str] = []
        self.auth_headers: list[str | None] = []
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                stub.requests.append(self.path)
                stub.auth_headers.append(self.headers.get("Authorization"))
                payload = None
                if self.path.startswith("/schemas/ids/"):
                    sid = int(self.path.rsplit("/", 1)[1])
                    if sid in schemas:
                        payload = {"schema": json.dumps(schemas[sid])}
                elif self.path.startswith("/subjects/") and self.path.endswith(
                    "/versions/latest"
                ):
                    subject = self.path.split("/")[2]
                    if subject in latest:
                        sid = latest[subject]
                        payload = {
                            "id": sid,
                            "version": 1,
                            "subject": subject,
                            "schema": json.dumps(schemas[sid]),
                        }
                if payload is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                body = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "application/vnd.schemaregistry.v1+json"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}"
        self._t = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._t.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def stub():
    s = _StubRegistry({7: USER_SCHEMA}, {"user-value": 7})
    yield s
    s.close()


def test_get_schema_cached(stub):
    c = SchemaRegistryClient(stub.url)
    s1 = c.get_schema(7)
    s2 = c.get_schema(7)
    assert json.loads(s1) == USER_SCHEMA and s1 == s2
    assert stub.requests == ["/schemas/ids/7"]  # one HTTP hit, cached after


def test_get_latest_seeds_id_cache(stub):
    c = SchemaRegistryClient(stub.url)
    sid, schema = c.get_latest("user-value")
    assert sid == 7 and json.loads(schema) == USER_SCHEMA
    c.get_schema(7)  # already seeded by the latest-version response
    assert stub.requests == ["/subjects/user-value/versions/latest"]


def test_basic_auth_header(stub):
    c = SchemaRegistryClient(stub.url, auth=("key", "secret"))
    c.get_schema(7)
    import base64

    expected = "Basic " + base64.b64encode(b"key:secret").decode()
    assert stub.auth_headers == [expected]


def test_unknown_id_raises(stub):
    c = SchemaRegistryClient(stub.url)
    with pytest.raises(SchemaRegistryError, match="registry GET"):
        c.get_schema(999)


def test_from_properties_and_config(tmp_path, stub):
    props = tmp_path / "sr.properties"
    props.write_text(
        f"schemaRegistryURL={stub.url}\n"
        "schemaRegistryUser=u\nschemaRegistryPassword=p\n"
    )
    c = SchemaRegistryClient.from_properties(str(props))
    assert c.base_url == stub.url
    assert "Authorization" in c._headers

    ini = tmp_path / "config.ini"
    ini.write_text(
        f"[schema_registry]\nendpoint={stub.url}\napi_key=k\napi_secret=s\n"
    )
    c2 = SchemaRegistryClient.from_config(str(ini))
    assert c2.base_url == stub.url
    assert c2.get_schema(7)


def test_wire_format_decode_via_registry_end_to_end(spark, stub):
    """The full seam the reference exercises at runtime: wire-format
    bytes whose header carries schema id 7 → HTTP lookup → Avro decode
    → typed rows. No schema JSON handed in anywhere."""
    msgs = [(_wire(7, encode(USER_SCHEMA, _user(i))),) for i in range(5)]
    df = spark.createDataFrame(msgs, "value binary")
    client = SchemaRegistryClient(stub.url)
    out = decode_wire_format(df, registry=client)
    rows = {r.guid: r for r in out.collect()}
    assert set(rows) == {f"g{i:04d}" for i in range(5)}
    assert rows["g0000"].schema_id == 7
    assert rows["g0001"].age == 21
    # exactly one registry round-trip for the whole batch
    assert stub.requests == ["/schemas/ids/7"]


def test_wire_format_decode_multi_id_batch(spark):
    """Mid-stream schema evolution: one batch, two writer-schema ids
    with compatible record shapes → each id decodes under its own
    schema, unioned by name."""
    evolved = dict(USER_SCHEMA)
    evolved["fields"] = list(USER_SCHEMA["fields"])  # same shape, new id
    stub = _StubRegistry({7: USER_SCHEMA, 8: evolved}, {})
    try:
        msgs = [(_wire(7, encode(USER_SCHEMA, _user(1))),),
                (_wire(8, encode(evolved, _user(2))),)]
        df = spark.createDataFrame(msgs, "value binary")
        out = decode_wire_format(df, registry=SchemaRegistryClient(stub.url))
        rows = sorted(out.collect(), key=lambda r: r.guid)
        assert [r.schema_id for r in rows] == [7, 8]
        assert sorted(stub.requests) == ["/schemas/ids/7", "/schemas/ids/8"]
    finally:
        stub.close()


def test_streaming_requires_subject(spark, stub, tmp_path):
    from streamlit_flink_demo_spark.sources.stream_fixtures import (
        kafka_shaped_stream,
    )

    stream = kafka_shaped_stream(spark, str(tmp_path / "spool"))
    with pytest.raises(ValueError, match="subject"):
        decode_wire_format(stream, registry=SchemaRegistryClient(stub.url))
    # with subject= the latest version resolves up front and the plan builds
    out = decode_wire_format(
        stream, registry=SchemaRegistryClient(stub.url), subject="user-value"
    )
    assert out.isStreaming and "guid" in out.columns
