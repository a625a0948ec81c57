"""S6: HTTP search service parity (cmd/server.go — health, search with
limit cap, delete action, read-only refusal)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from deduplicator_go_spark.server import (
    DEFAULT_SEARCH_LIMIT,
    MAX_SEARCH_LIMIT,
    SearchService,
    parse_search_limit,
    start_server,
)
from deduplicator_go_spark.sources.catalog import CheckpointCatalog


def test_parse_search_limit():
    assert parse_search_limit(None) == DEFAULT_SEARCH_LIMIT
    assert parse_search_limit("") == DEFAULT_SEARCH_LIMIT
    assert parse_search_limit("junk") == DEFAULT_SEARCH_LIMIT
    assert parse_search_limit("-3") == DEFAULT_SEARCH_LIMIT
    assert parse_search_limit("17") == 17
    assert parse_search_limit("9999") == MAX_SEARCH_LIMIT


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    cat = CheckpointCatalog(str(tmp_path_factory.mktemp("serve-cat")))
    rows = [(f"/data/set{i % 3}/file{i:03d}.txt", "h1" if i % 2 else "h2", i * 10)
            for i in range(40)]
    df = spark.createDataFrame(rows, "path string, host string, size long")
    cat.write(df, "catalog", params_hash="test")
    service = SearchService(spark, cat, table="catalog", host="h1")
    server = start_server(service)
    port = server.server_address[1]
    yield service, f"http://127.0.0.1:{port}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def _post(url):
    req = urllib.request.Request(url, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(served):
    _, base = served
    status, body = _get(base + "/api/health")
    assert status == 200
    assert body["status"] == "ok"
    assert body["hostname"] == "h1"
    assert body["deleteEnabled"] is True


def test_search_scoped_and_capped(served):
    _, base = served
    # host h1 = odd i → 20 rows, set query matches all of them
    status, hits = _get(base + "/api/search?q=SET")
    assert status == 200
    assert len(hits) == 20
    assert all("h1" == h["host"] for h in hits)
    # limit respected; ids descending (reference ORDER BY id DESC)
    _, hits = _get(base + "/api/search?q=set&limit=5")
    assert len(hits) == 5
    ids = [h["id"] for h in hits]
    assert ids == sorted(ids, reverse=True)
    # empty q → []
    _, hits = _get(base + "/api/search?q=")
    assert hits == []
    # no match
    _, hits = _get(base + "/api/search?q=zzz-nope")
    assert hits == []


def test_delete_removes_row(served):
    service, base = served
    _, hits = _get(base + "/api/search?q=file001")
    assert len(hits) == 1
    rid = hits[0]["id"]
    status, resp = _post(f"{base}/api/files/{rid}/delete")
    assert status == 200
    assert resp["removedDb"] is True and resp["path"].endswith("file001.txt")
    _, hits = _get(base + "/api/search?q=file001")
    assert hits == []
    # second delete of the same id → 404 (reference sql.ErrNoRows path)
    status, resp = _post(f"{base}/api/files/{rid}/delete")
    assert status == 404
    # unknown action → 404
    status, _ = _post(f"{base}/api/files/{rid}/explode")
    assert status == 404


def test_read_only_scope_refuses_delete(spark, tmp_path):
    cat = CheckpointCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame([("/a/b.txt", "h1", 1)],
                               "path string, host string, size long")
    cat.write(df, "catalog", params_hash="test")
    # all-hosts scope (no host given) forces read-only, like the
    # reference's unregistered-hostname fallback (cmd/server.go:175-200)
    service = SearchService(spark, cat, table="catalog", host=None)
    assert service.all_hosts and not service.delete_enabled
    server = start_server(service)
    port = server.server_address[1]
    try:
        status, hits = _get(f"http://127.0.0.1:{port}/api/search?q=b.txt")
        assert status == 200 and len(hits) == 1
        status, body = _post(f"http://127.0.0.1:{port}/api/files/{hits[0]['id']}/delete")
        assert status == 403 and "read-only" in body["error"]
    finally:
        server.shutdown()


def test_delete_is_null_safe_and_by_identity(spark, tmp_path):
    """Deleting one id must not drop NULL-path rows; rows sharing a path
    share the id (identity = path) and go together (review regression)."""
    cat = CheckpointCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [("/dup/p.txt", "h1", 1), ("/dup/p.txt", "h1", 2),
         (None, "h1", 3), ("/other.txt", "h1", 4)],
        "path string, host string, size long",
    )
    cat.write(df, "catalog", params_hash="test")
    service = SearchService(spark, cat, table="catalog", host="h1")
    hits = service.search("dup/p", 10)
    assert len(hits) == 2 and len({h["id"] for h in hits}) == 1
    resp = service.delete(hits[0]["id"])
    assert resp["removedDb"]
    left = cat.read(spark, "catalog").collect()
    paths = sorted((r["path"] or "<null>") for r in left)
    assert paths == ["/other.txt", "<null>"]  # NULL row survived


def test_delete_is_host_scoped(spark, tmp_path):
    """A host-scoped delete removes the path's row on THIS host only —
    other hosts sharing the path (and NULL-host rows) keep theirs, like
    the reference's deleteIndexedFile removing one per-host indexed row
    (cmd/server.go:356-401)."""
    cat = CheckpointCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [("/shared/p.txt", "h1", 1), ("/shared/p.txt", "H2", 2),
         ("/shared/p.txt", None, 3), ("/only-h1.txt", "h1", 4)],
        "path string, host string, size long",
    )
    cat.write(df, "catalog", params_hash="test")
    service = SearchService(spark, cat, table="catalog", host="h1")
    hits = service.search("shared/p", 10)
    assert len(hits) == 1  # served view is already h1-scoped
    resp = service.delete(hits[0]["id"])
    assert resp["removedDb"]
    left = cat.read(spark, "catalog").collect()
    assert sorted((r["host"] or "<null>") for r in left if r["path"] == "/shared/p.txt") \
        == ["<null>", "H2"]  # h2 + NULL-host rows for the path survive
    assert any(r["path"] == "/only-h1.txt" for r in left)


def test_index_serves_web_ui(served):
    """GET / returns the single-file UI (webui.py) — the engine's
    re-expression of the reference's Vite frontend
    (/root/reference/web/src/App.jsx): search box wired to /api/search,
    health banner, delete-confirm flow."""
    _service, base = served
    with urllib.request.urlopen(base + "/") as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        body = r.read().decode()
    for needle in ("Deduplicator Files", "/api/search", "/api/health", "/delete"):
        assert needle in body
