"""Fixture-driven conformance of the REST catalog client against the
PUBLIC Apache Iceberg REST Catalog OpenAPI shapes (r11, VERDICT item
7). tests/test_rest_catalog.py proves the client against an
in-process BEHAVIORAL server; this file pins the WIRE SHAPES instead:
canned responses shaped after the published spec's schemas/examples
(CatalogConfig, ListNamespacesResponse, ListTablesResponse,
LoadTableResult, OAuthTokenResponse, IcebergErrorResponse) are served
verbatim, and every request the client emits is captured and checked
field-by-field against the spec's request schemas (CommitTableRequest
requirements/updates, RegisterTableRequest, the OAuth
client_credentials form). Shape drift on either side is a loud diff.

Reference: pg_lake_iceberg/src/rest_catalog/rest_catalog.c (the
reference's Polaris client); the spec is apache/iceberg's
rest-catalog-open-api.yaml (public).
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pg_datalake_spark.tables.rest_catalog import (
    RestCatalogClient,
    RestCatalogError,
)

# --- canned fixtures: shapes from the published OpenAPI examples ----------

OAUTH_TOKEN_RESPONSE = {  # OAuthTokenResponse
    "access_token": "fixture-token",
    "token_type": "bearer",
    "expires_in": 3600,
}

CATALOG_CONFIG = {  # CatalogConfig
    "overrides": {"warehouse": "s3://bucket/warehouse"},
    "defaults": {"clients": "4"},
}

LIST_NAMESPACES_RESPONSE = {  # ListNamespacesResponse
    "namespaces": [["accounting"], ["accounting", "tax"]],
    "next-page-token": None,
}

LIST_TABLES_RESPONSE = {  # ListTablesResponse (TableIdentifier items)
    "identifiers": [
        {"namespace": ["accounting", "tax"], "name": "paid"},
        {"namespace": ["accounting", "tax"], "name": "owed"},
    ],
    "next-page-token": None,
}

LOAD_TABLE_RESULT = {  # LoadTableResult
    "metadata-location": "s3://bucket/wh/accounting/paid/metadata/v3.metadata.json",
    "metadata": {
        "format-version": 2,
        "table-uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1",
        "location": "s3://bucket/wh/accounting/paid",
        "last-sequence-number": 3,
        "last-updated-ms": 1602638573590,
        "last-column-id": 2,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {"id": 2, "name": "v", "required": False, "type": "string"},
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "snapshots": [],
        "properties": {},
    },
    "config": {"s3.access-key-id": "vended", "s3.secret-access-key": "vended"},
}

NO_SUCH_TABLE_ERROR = {  # IcebergErrorResponse / ErrorModel
    "error": {
        "message": "The given table does not exist",
        "type": "NoSuchTableException",
        "code": 404,
    }
}

COMMIT_RESPONSE = {  # CommitTableResponse
    "metadata-location": "s3://bucket/wh/accounting/paid/metadata/v4.metadata.json",
    "metadata": LOAD_TABLE_RESULT["metadata"],
}


class _CannedHandler(BaseHTTPRequestHandler):
    """Serves the fixtures verbatim and records every request."""

    requests: list[dict] = []

    def log_message(self, *a):
        pass

    def _record(self, body):
        _CannedHandler.requests.append(
            {
                "method": self.command,
                "path": self.path,
                "headers": dict(self.headers),
                "body": body,
            }
        )

    def _send(self, code, payload):
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        self._record(None)
        p = self.path.split("?")[0]
        if p == "/v1/config":
            return self._send(200, CATALOG_CONFIG)
        if p == "/v1/namespaces":
            return self._send(200, LIST_NAMESPACES_RESPONSE)
        if p.endswith("/tables"):
            return self._send(200, LIST_TABLES_RESPONSE)
        if p.endswith("/tables/paid"):
            return self._send(200, LOAD_TABLE_RESULT)
        if p.endswith("/tables/missing"):
            return self._send(404, NO_SUCH_TABLE_ERROR)
        return self._send(404, NO_SUCH_TABLE_ERROR)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(n)
        ctype = self.headers.get("Content-Type", "")
        body = (
            dict(urllib.parse.parse_qsl(raw.decode()))
            if "x-www-form-urlencoded" in ctype
            else json.loads(raw or b"{}")
        )
        self._record(body)
        p = self.path.split("?")[0]
        if p == "/v1/oauth/tokens":
            return self._send(200, OAUTH_TOKEN_RESPONSE)
        if p.endswith("/register"):
            return self._send(200, LOAD_TABLE_RESULT)
        if p.endswith("/tables/paid"):
            return self._send(200, COMMIT_RESPONSE)
        return self._send(404, NO_SUCH_TABLE_ERROR)


@pytest.fixture()
def canned():
    _CannedHandler.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _CannedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _CannedHandler.requests
    srv.shutdown()


def _client(uri):
    return RestCatalogClient(uri, credential="cid:csecret", retry_sleep_s=0.0)


def test_oauth_request_matches_spec_form(canned):
    uri, reqs = canned
    c = _client(uri)
    c.list_namespaces()
    tok = next(r for r in reqs if r["path"] == "/v1/oauth/tokens")
    # spec: client_credentials grant, form-encoded
    assert "x-www-form-urlencoded" in tok["headers"]["Content-Type"]
    assert tok["body"] == {
        "grant_type": "client_credentials",
        "client_id": "cid",
        "client_secret": "csecret",
        "scope": "catalog",
    }
    # subsequent calls carry the vended bearer token
    listing = [r for r in reqs if r["path"].startswith("/v1/namespaces")]
    assert listing and all(
        r["headers"].get("Authorization") == "Bearer fixture-token"
        for r in listing
    )


def test_list_and_load_parse_spec_examples(canned):
    uri, _ = canned
    c = _client(uri)
    assert c.list_namespaces() == [["accounting"], ["accounting", "tax"]]
    assert c.list_tables("accounting.tax") == ["paid", "owed"]
    result = c.load_table("accounting.tax", "paid")
    assert result["metadata-location"].endswith("v3.metadata.json")
    assert result["metadata"]["table-uuid"] == (
        "9c12d441-03fe-4693-9a96-a0705ddf69c1"
    )
    # vended storage credentials surface through config (spec: config
    # map on LoadTableResult)
    assert result["config"]["s3.access-key-id"] == "vended"


def test_error_model_surfaces_spec_fields(canned):
    uri, _ = canned
    c = _client(uri)
    with pytest.raises(RestCatalogError) as ei:
        c.load_table("accounting.tax", "missing")
    assert ei.value.status == 404
    err = json.loads(ei.value.body)["error"]
    assert err["type"] == "NoSuchTableException" and err["code"] == 404


def test_register_table_request_shape(canned):
    uri, reqs = canned
    c = _client(uri)
    c.register_table("accounting.tax", "paid", "s3://b/t/metadata/v1.metadata.json")
    reg = next(r for r in reqs if r["path"].endswith("/register"))
    # spec RegisterTableRequest: name + metadata-location, nothing else
    assert reg["body"] == {
        "name": "paid",
        "metadata-location": "s3://b/t/metadata/v1.metadata.json",
    }
    assert reg["path"] == "/v1/namespaces/accounting.tax/register"


def test_commit_table_request_shape(canned):
    uri, reqs = canned
    c = _client(uri)
    snap = {
        "snapshot-id": 3051729675574597004,
        "sequence-number": 4,
        "timestamp-ms": 1515100955770,
        "manifest-list": "s3://b/t/metadata/snap-305...avro",
        "summary": {"operation": "append"},
    }
    c.commit_snapshot(
        "accounting.tax", "paid",
        new_metadata_location="s3://b/t/metadata/v4.metadata.json",
        table_uuid="9c12d441-03fe-4693-9a96-a0705ddf69c1",
        expected_snapshot_id=77,
        new_snapshot=snap,
    )
    com = next(
        r for r in reqs
        if r["method"] == "POST" and r["path"].endswith("/tables/paid")
    )
    body = com["body"]
    # spec CommitTableRequest: identifier + requirements + updates
    assert body["identifier"] == {
        "namespace": ["accounting.tax"], "name": "paid",
    }
    assert {"type": "assert-table-uuid",
            "uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1"} in body["requirements"]
    assert {"type": "assert-ref-snapshot-id", "ref": "main",
            "snapshot-id": 77} in body["requirements"]
    actions = [u["action"] for u in body["updates"]]
    assert actions == ["add-snapshot", "set-snapshot-ref", "set-location"]
    add = body["updates"][0]
    assert add["snapshot"]["snapshot-id"] == snap["snapshot-id"]
    ref = body["updates"][1]
    assert ref == {
        "action": "set-snapshot-ref", "ref-name": "main",
        "type": "branch", "snapshot-id": snap["snapshot-id"],
    }


def test_pagination_protocol_next_page_token(canned):
    """Spec pageToken protocol: the client must chase next-page-token
    until the server omits it, passing it back as ?pageToken=..."""
    uri, reqs = canned
    pages = [
        {"namespaces": [["a"]], "next-page-token": "t1"},
        {"namespaces": [["b"]], "next-page-token": None},
    ]
    served = []

    orig = _CannedHandler.do_GET

    def paged(self):
        p = self.path.split("?")[0]
        if p == "/v1/namespaces":
            self._record(None)
            served.append(self.path)
            return self._send(200, pages[len(served) - 1])
        return orig(self)

    _CannedHandler.do_GET = paged
    try:
        c = _client(uri)
        assert c.list_namespaces() == [["a"], ["b"]]
        assert "pageToken" not in served[0]
        assert "pageToken=t1" in served[1]
    finally:
        _CannedHandler.do_GET = orig
