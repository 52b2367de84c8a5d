"""Iceberg REST catalog client (the reference's Polaris integration).

The reference reads and writes external Iceberg REST catalogs
(reference: pg_lake_iceberg/src/rest_catalog/rest_catalog.c:45-80 —
GUC-configured host/auth; tests test_polaris_catalog.py:29). This is
the same surface as a pure-Python client of the PUBLIC Apache Iceberg
REST Catalog OpenAPI spec, stdlib-only (urllib), so it needs no jars:

- ``/v1/config``, ``/v1/oauth/tokens`` (client_credentials),
- namespace/table listing, ``load_table`` (→ metadata location the
  normal distributed read path consumes),
- ``register_table`` (pointer registration),
- spec-shaped commits: a ``CommitTableRequest`` carrying
  ``assert-table-uuid`` / ``assert-ref-snapshot-id`` REQUIREMENTS and
  ``add-snapshot`` / ``set-snapshot-ref`` UPDATES — the server
  enforces the CAS and answers 409 on a lost race, surfaced as
  :class:`CommitConflictError` (same type the local commit paths
  raise).

Only the catalog CONTROL PLANE is HTTP; table data stays on the
normal scan path (`read_iceberg_table` on the returned metadata
location — distributed parquet with pushdown/pruning). Vended
storage credentials (S3 session tokens in ``config``) are accepted
and exposed but not applied to local file:// reads; on a cluster they
feed the Hadoop FS configuration. Verified offline against an
in-process spec-subset server (tests/test_rest_catalog.py); against a
real Polaris only the base URI and credential change.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from pg_datalake_spark.tables.iceberg_external import CommitConflictError


class RestCatalogError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"REST catalog error {status}: {body[:300]}")
        self.status = status
        self.body = body


class RestCatalogClient:
    """Minimal Iceberg REST catalog client (read + register + commit)."""

    def __init__(
        self,
        uri: str,
        credential: str | None = None,
        token: str | None = None,
        warehouse: str | None = None,
    ):
        self.uri = uri.rstrip("/")
        self.token = token
        self.warehouse = warehouse
        self.prefix = ""
        if credential and not token:
            self.token = self._fetch_oauth_token(credential)
        cfg = self._get("/v1/config", params={"warehouse": warehouse} if warehouse else None)
        overrides = cfg.get("overrides", {})
        prefix = overrides.get("prefix", "")
        self.prefix = f"/{prefix}" if prefix else ""

    # -- transport ----------------------------------------------------------

    def _fetch_oauth_token(self, credential: str) -> str:
        client_id, _, client_secret = credential.partition(":")
        form = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": client_secret,
                "scope": "catalog",
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.uri}/v1/oauth/tokens",
            data=form,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())["access_token"]

    def _request(self, method: str, path: str, body: dict | None = None,
                 params: dict | None = None) -> dict:
        url = f"{self.uri}{path}"
        if params:
            url += "?" + urllib.parse.urlencode(
                {k: v for k, v in params.items() if v is not None}
            )
        headers = {"Content-Type": "application/json"}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode() if body is not None else None,
            headers=headers,
            method=method,
        )
        try:
            with urllib.request.urlopen(req) as resp:
                data = resp.read()
                return json.loads(data) if data else {}
        except urllib.error.HTTPError as e:
            body_text = e.read().decode(errors="replace")
            if e.code == 409:
                raise CommitConflictError(f"REST catalog commit conflict: {body_text[:300]}")
            raise RestCatalogError(e.code, body_text) from e

    def _get(self, path: str, params: dict | None = None) -> dict:
        return self._request("GET", path, params=params)

    def _post(self, path: str, body: dict) -> dict:
        return self._request("POST", path, body=body)

    # -- read surface -------------------------------------------------------

    def list_namespaces(self) -> list[list[str]]:
        return self._get(f"/v1{self.prefix}/namespaces").get("namespaces", [])

    def list_tables(self, namespace: str) -> list[str]:
        ns = urllib.parse.quote(namespace, safe="")
        out = self._get(f"/v1{self.prefix}/namespaces/{ns}/tables")
        return [ident["name"] for ident in out.get("identifiers", [])]

    def load_table(self, namespace: str, name: str) -> dict:
        """LoadTableResult: {"metadata-location", "metadata", "config"?}."""
        ns = urllib.parse.quote(namespace, safe="")
        tbl = urllib.parse.quote(name, safe="")
        return self._get(f"/v1{self.prefix}/namespaces/{ns}/tables/{tbl}")

    def read_table(self, spark, namespace: str, name: str, **kwargs):
        """Load through the catalog, scan through the normal
        distributed path (pushdown/pruning unchanged)."""
        from pg_datalake_spark.tables.iceberg_external import read_iceberg_table

        result = self.load_table(namespace, name)
        meta = result.get("metadata") or {}
        location = meta.get("location")
        if not location:
            # fall back: metadata-location is <table>/metadata/vN.metadata.json
            mloc = result["metadata-location"]
            location = mloc.rsplit("/metadata/", 1)[0]
        return read_iceberg_table(spark, location, **kwargs)

    # -- write surface ------------------------------------------------------

    def register_table(self, namespace: str, name: str, metadata_location: str) -> dict:
        ns = urllib.parse.quote(namespace, safe="")
        return self._post(
            f"/v1{self.prefix}/namespaces/{ns}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def commit_snapshot(
        self,
        namespace: str,
        name: str,
        new_metadata_location: str,
        table_uuid: str,
        expected_snapshot_id: int | None,
        new_snapshot: dict,
    ) -> dict:
        """Spec-shaped CommitTableRequest: assert the table UUID and
        that ``main`` still points at ``expected_snapshot_id`` (None =
        assert the ref does not exist yet), then add the new snapshot
        and advance ``main``. A concurrent writer that moved the ref
        first makes the server answer 409 → CommitConflictError, the
        optimistic-concurrency contract every other commit path in
        this repo shares."""
        ns = urllib.parse.quote(namespace, safe="")
        requirements = [{"type": "assert-table-uuid", "uuid": table_uuid}]
        requirements.append(
            {
                "type": "assert-ref-snapshot-id",
                "ref": "main",
                "snapshot-id": expected_snapshot_id,
            }
        )
        updates = [
            {"action": "add-snapshot", "snapshot": new_snapshot},
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "type": "branch",
                "snapshot-id": new_snapshot["snapshot-id"],
            },
            # our offline server applies the new metadata pointer from
            # this update; a full REST service writes metadata itself
            {"action": "set-location", "location": new_metadata_location},
        ]
        return self._post(
            f"/v1{self.prefix}/namespaces/{ns}/tables/{urllib.parse.quote(name, safe='')}",
            {
                "identifier": {"namespace": [namespace], "name": name},
                "requirements": requirements,
                "updates": updates,
            },
        )
