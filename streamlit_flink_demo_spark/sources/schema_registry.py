"""Confluent Schema Registry HTTP client (SURVEY.md §2.1 S1).

The reference resolves writer schemas at runtime from a configured
registry endpoint with basic-auth credentials (reference
``schema-registry-config.template.properties:1-3``,
``config.template.ini:12-18``). This is the engine-side twin: a small
cached resolver over the registry's REST surface —

    GET {base}/schemas/ids/{id}          → {"schema": "<json>"}
    GET {base}/subjects/{s}/versions/latest
                                         → {"id": n, "schema": "<json>"}

— feeding ``decode_wire_format`` so the schema id the wire-format
header carries (``kafka_avro.confluent_schema_id``) is actually used
to fetch the writer schema, instead of callers hand-delivering the
schema JSON.

Scale posture: schema ids are tiny and immutable → the cache is a
plain forever-dict on the DRIVER; the resolved schema string ships to
executors inside the decoder closure (one registry round-trip per
schema id per process, never per record or per batch). stdlib urllib
only — no extra dependencies.
"""

from __future__ import annotations

import base64
import configparser
import json
import urllib.request
from typing import Any


class SchemaRegistryError(RuntimeError):
    pass


class SchemaRegistryClient:
    """Minimal cached client for the registry's schema-resolution REST
    calls. ``auth`` is (user, password) — Confluent Cloud API
    key/secret pairs use HTTP basic auth on the same header."""

    def __init__(
        self,
        base_url: str,
        auth: tuple[str, str] | None = None,
        timeout: float = 5.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._headers = {
            "Accept": (
                "application/vnd.schemaregistry.v1+json, application/json"
            )
        }
        if auth is not None:
            token = base64.b64encode(
                f"{auth[0]}:{auth[1]}".encode()
            ).decode()
            self._headers["Authorization"] = f"Basic {token}"
        self._by_id: dict[int, str] = {}
        self._latest: dict[str, tuple[int, str]] = {}

    @classmethod
    def from_properties(cls, path: str, **kwargs: Any) -> "SchemaRegistryClient":
        """Construct from the reference's .properties shape
        (schemaRegistryURL/User/Password, reference
        ``schema-registry-config.template.properties:1-3``)."""
        props: dict[str, str] = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, _, v = line.partition("=")
                props[k.strip()] = v.strip()
        url = props.get("schemaRegistryURL", "")
        if not url:
            raise SchemaRegistryError(f"schemaRegistryURL missing in {path}")
        user = props.get("schemaRegistryUser", "")
        pw = props.get("schemaRegistryPassword", "")
        auth = (user, pw) if user else None
        return cls(url, auth=auth, **kwargs)

    @classmethod
    def from_config(cls, path: str, **kwargs: Any) -> "SchemaRegistryClient":
        """Construct from the reference's config.ini shape
        ([schema_registry] endpoint/api_key/api_secret, reference
        ``config.template.ini:12-18``)."""
        config = configparser.ConfigParser()
        config.read(path)
        if not config.has_section("schema_registry"):
            raise SchemaRegistryError(f"[schema_registry] missing in {path}")
        sect = config["schema_registry"]
        endpoint = sect.get("endpoint", "")
        if not endpoint:
            raise SchemaRegistryError(f"endpoint missing in {path}")
        key = sect.get("api_key", "")
        auth = (key, sect.get("api_secret", "")) if key else None
        return cls(endpoint, auth=auth, **kwargs)

    # -- REST calls --------------------------------------------------------
    def _get(self, path: str) -> dict:
        req = urllib.request.Request(
            f"{self.base_url}{path}", headers=self._headers
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode())
        except Exception as ex:
            raise SchemaRegistryError(
                f"registry GET {path} failed: {ex}"
            ) from ex

    def get_schema(self, schema_id: int) -> str:
        """Writer schema JSON for a wire-format schema id (cached
        forever — registered schemas are immutable)."""
        if schema_id not in self._by_id:
            payload = self._get(f"/schemas/ids/{int(schema_id)}")
            if "schema" not in payload:
                raise SchemaRegistryError(
                    f"no 'schema' in registry response for id {schema_id}"
                )
            self._by_id[schema_id] = payload["schema"]
        return self._by_id[schema_id]

    def get_latest(self, subject: str) -> tuple[int, str]:
        """(schema_id, schema_json) of a subject's latest version —
        what a producer-side lookup uses (topic ``user`` → subject
        ``user-value``)."""
        if subject not in self._latest:
            payload = self._get(f"/subjects/{subject}/versions/latest")
            try:
                entry = (int(payload["id"]), payload["schema"])
            except KeyError as ex:
                raise SchemaRegistryError(
                    f"malformed latest-version response for {subject!r}: "
                    f"{sorted(payload)}"
                ) from ex
            self._latest[subject] = entry
            self._by_id.setdefault(entry[0], entry[1])
        return self._latest[subject]
