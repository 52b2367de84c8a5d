"""Iceberg REST catalog client against an in-process spec-subset
server.

The server below implements the slice of the PUBLIC Apache Iceberg
REST Catalog OpenAPI the client exercises — /v1/config, OAuth
client_credentials, namespace/table listing, load, register, and
CommitTableRequest with assert-table-uuid / assert-ref-snapshot-id
enforcement (409 on a lost race) — over tables exported by
export_iceberg_snapshot. The reference needs a live Polaris for this
surface (pg_lake_iceberg/src/rest_catalog/rest_catalog.c); here only
the base URI and credential would change.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

from pg_datalake_spark.tables.iceberg_external import (
    CommitConflictError,
    append_snapshot,
    export_iceberg_snapshot,
    load_table_metadata,
)
from pg_datalake_spark.tables.rest_catalog import RestCatalogClient, RestCatalogError

TOKEN = "test-token-abc"


class _CatalogState:
    """ns -> name -> {"metadata-location", "uuid", "main"}"""

    def __init__(self):
        self.tables: dict[str, dict[str, dict]] = {}

    def put(self, ns: str, name: str, metadata_location: str):
        meta = json.load(open(metadata_location))
        self.tables.setdefault(ns, {})[name] = {
            "metadata-location": metadata_location,
            "uuid": meta["table-uuid"],
            "main": meta.get("current-snapshot-id"),
        }


class _Handler(BaseHTTPRequestHandler):
    state: _CatalogState = None  # set by fixture

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code: int, body: dict | None = None):
        data = json.dumps(body or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _authed(self) -> bool:
        return self.headers.get("Authorization") == f"Bearer {TOKEN}"

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/v1/config":
            return self._send(200, {"defaults": {}, "overrides": {}})
        if not self._authed():
            return self._send(401, {"error": "missing/bad token"})
        parts = path.strip("/").split("/")
        # /v1/namespaces
        if parts == ["v1", "namespaces"]:
            return self._send(
                200, {"namespaces": [[ns] for ns in sorted(self.state.tables)]}
            )
        # /v1/namespaces/{ns}/tables[/{t}]
        if len(parts) >= 4 and parts[1] == "namespaces" and parts[3] == "tables":
            ns = parts[2]
            if ns not in self.state.tables:
                return self._send(404, {"error": f"no namespace {ns}"})
            if len(parts) == 4:
                return self._send(
                    200,
                    {
                        "identifiers": [
                            {"namespace": [ns], "name": n}
                            for n in sorted(self.state.tables[ns])
                        ]
                    },
                )
            name = parts[4]
            entry = self.state.tables[ns].get(name)
            if entry is None:
                return self._send(404, {"error": f"no table {name}"})
            meta = json.load(open(entry["metadata-location"]))
            return self._send(
                200,
                {
                    "metadata-location": entry["metadata-location"],
                    "metadata": meta,
                    "config": {},
                },
            )
        return self._send(404, {"error": f"unknown path {path}"})

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(length)
        path = urlparse(self.path).path
        if path == "/v1/oauth/tokens":
            form = parse_qs(raw.decode())
            if form.get("client_id") == ["cid"] and form.get("client_secret") == ["sec"]:
                return self._send(200, {"access_token": TOKEN, "token_type": "bearer"})
            return self._send(401, {"error": "bad credential"})
        if not self._authed():
            return self._send(401, {"error": "missing/bad token"})
        body = json.loads(raw) if raw else {}
        parts = path.strip("/").split("/")
        # /v1/namespaces/{ns}/register
        if len(parts) == 4 and parts[3] == "register":
            ns = parts[2]
            self.state.put(ns, body["name"], body["metadata-location"])
            entry = self.state.tables[ns][body["name"]]
            return self._send(
                200, {"metadata-location": entry["metadata-location"]}
            )
        # /v1/namespaces/{ns}/tables/{t}  (CommitTableRequest)
        if len(parts) == 5 and parts[3] == "tables":
            ns, name = parts[2], parts[4]
            entry = self.state.tables.get(ns, {}).get(name)
            if entry is None:
                return self._send(404, {"error": f"no table {name}"})
            for req in body.get("requirements", []):
                if req["type"] == "assert-table-uuid" and req["uuid"] != entry["uuid"]:
                    return self._send(409, {"error": "table uuid changed"})
                if (
                    req["type"] == "assert-ref-snapshot-id"
                    and req.get("ref") == "main"
                    and req.get("snapshot-id") != entry["main"]
                ):
                    return self._send(
                        409,
                        {
                            "error": f"ref main at {entry['main']}, "
                            f"expected {req.get('snapshot-id')}"
                        },
                    )
            new_loc = None
            new_main = entry["main"]
            for upd in body.get("updates", []):
                if upd["action"] == "set-location":
                    new_loc = upd["location"]
                if upd["action"] == "set-snapshot-ref" and upd["ref-name"] == "main":
                    new_main = upd["snapshot-id"]
            if new_loc:
                self.state.put(ns, name, new_loc)
            self.state.tables[ns][name]["main"] = new_main
            return self._send(
                200,
                {"metadata-location": self.state.tables[ns][name]["metadata-location"]},
            )
        return self._send(404, {"error": f"unknown path {path}"})


@pytest.fixture
def rest_server():
    state = _CatalogState()
    _Handler.state = state
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()


def _current_metadata_location(location: str) -> str:
    meta_dir = os.path.join(location, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        return os.path.join(meta_dir, f"v{fh.read().strip()}.metadata.json")


def test_rest_catalog_oauth_list_load_read(spark, tmp_path, rest_server):
    uri, state = rest_server
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    loc = str(tmp_path / "t1")
    export_iceberg_snapshot(df, loc)
    state.put("analytics", "t1", _current_metadata_location(loc))

    client = RestCatalogClient(uri, credential="cid:sec")
    assert client.list_namespaces() == [["analytics"]]
    assert client.list_tables("analytics") == ["t1"]
    loaded = client.load_table("analytics", "t1")
    assert loaded["metadata"]["format-version"] == 2
    back = client.read_table(spark, "analytics", "t1")
    assert back.count() == 100
    assert back.agg(F.sum("v")).collect()[0][0] == sum(i * 2 for i in range(100))


def test_rest_catalog_bad_credential_and_token(rest_server):
    uri, _ = rest_server
    with pytest.raises(Exception):
        RestCatalogClient(uri, credential="cid:wrong")
    client = RestCatalogClient(uri, token="bogus")
    with pytest.raises(RestCatalogError) as ei:
        client.list_namespaces()
    assert ei.value.status == 401


def test_rest_catalog_register_and_commit_cas(spark, tmp_path, rest_server):
    """Register via REST, append a snapshot locally, commit it through
    the spec-shaped CAS; a second commit against the stale snapshot id
    must 409 → CommitConflictError."""
    uri, state = rest_server
    df = spark.range(50).select(F.col("id").alias("k"))
    loc = str(tmp_path / "t2")
    export_iceberg_snapshot(df, loc)

    client = RestCatalogClient(uri, credential="cid:sec")
    client.register_table("lake", "t2", _current_metadata_location(loc))
    meta0 = load_table_metadata(loc)
    snap0 = meta0["current-snapshot-id"]

    append_snapshot(spark.range(50, 80).select(F.col("id").alias("k")), loc)
    meta1 = load_table_metadata(loc)
    snap1_obj = next(
        s for s in meta1["snapshots"] if s["snapshot-id"] == meta1["current-snapshot-id"]
    )
    client.commit_snapshot(
        "lake", "t2",
        new_metadata_location=_current_metadata_location(loc),
        table_uuid=meta1["table-uuid"],
        expected_snapshot_id=snap0,
        new_snapshot=snap1_obj,
    )
    assert client.read_table(spark, "lake", "t2").count() == 80

    # stale writer: still believes main == snap0
    with pytest.raises(CommitConflictError):
        client.commit_snapshot(
            "lake", "t2",
            new_metadata_location=_current_metadata_location(loc),
            table_uuid=meta1["table-uuid"],
            expected_snapshot_id=snap0,
            new_snapshot=snap1_obj,
        )
