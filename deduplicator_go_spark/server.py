"""HTTP search service (S6) — the reference's `server` mode re-expressed
over the engine's checkpoint catalog.

Reference parity (/root/reference/cmd/server.go):
  GET  /                      → single-file web UI (webui.py — the
                                engine's re-expression of the Vite
                                frontend in /root/reference/web/)
  GET  /api/health            → HandleServer health payload (:236-247)
  GET  /api/search?q=&limit=  → searchFiles LIKE query, host-scoped or
                                all-hosts, ORDER BY id DESC, capped at
                                500 (:299-354, parseSearchLimit :470-482)
  POST /api/files/<id>/delete → deleteIndexedFile (:356-401); here the
                                indexed row is removed from the served
                                catalog table (the engine's actions are
                                plans/tables, never filesystem mutations
                                — operators/actions.py), so the response
                                reports removedDb and alreadyMissing
                                (no local file), mirroring the reference
                                response shape.

Spark-first shape: the served table is loaded once, given a stable
``id = xxhash64(path)`` (computed distributed — no global row_number
sort), and persisted; each request is a pushed-down contains-filter +
limit over the cached snapshot. The reference leans on a Postgres
index for this; the engine analog at production scale would serve from
the same table published to an indexed store — this process is the
read-path parity surface, sized for operator/debug use (the reference
caps results at 500 for the same reason).
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_SEARCH_LIMIT = 500  # cmd/server.go:24 maxSearchLimit
DEFAULT_SEARCH_LIMIT = 100  # cmd/server.go:470-482 parseSearchLimit

_FILE_ACTION = re.compile(r"^/api/files/(-?\d+)/(\w+)/?$")


def parse_search_limit(raw: str | None) -> int:
    """parseSearchLimit parity: default 100, cap 500, junk → default."""
    if not raw:
        return DEFAULT_SEARCH_LIMIT
    try:
        limit = int(raw)
    except ValueError:
        return DEFAULT_SEARCH_LIMIT
    if limit <= 0:
        return DEFAULT_SEARCH_LIMIT
    return min(limit, MAX_SEARCH_LIMIT)


class SearchService:
    """Query layer the HTTP handler delegates to (separable for tests)."""

    def __init__(
        self,
        spark: SparkSession,
        catalog,
        table: str = "catalog",
        host: str | None = None,
        delete_enabled: bool = True,
    ) -> None:
        self.spark = spark
        self.catalog = catalog
        self.table = table
        self.host = host.lower() if host else None
        self.all_hosts = host is None
        self.delete_enabled = delete_enabled and not self.all_hosts
        self.delete_disabled_reason = (
            ""
            if self.delete_enabled
            else (
                "delete disabled because no host scope is set; serving all "
                "hosts in read-only mode"
                if self.all_hosts
                else "delete disabled by configuration"
            )
        )
        self._lock = threading.Lock()
        self._df: DataFrame | None = None
        self.refresh()

    def refresh(self) -> None:
        """(Re)load the served snapshot from the catalog table."""
        df = self.catalog.read(self.spark, self.table)
        if "path" not in df.columns:
            raise ValueError(f"table {self.table!r} has no 'path' column")
        df = df.withColumn("id", F.xxhash64("path"))
        if self.host is not None and "host" in df.columns:
            df = df.filter(F.lower(F.col("host")) == self.host)
        old, self._df = self._df, df.persist()
        self._df.count()
        if old is not None:
            old.unpersist()

    def health(self) -> dict:
        return {
            "status": "ok",
            "hostname": self.host or "",
            "allHosts": self.all_hosts,
            "deleteEnabled": self.delete_enabled,
            **(
                {"deleteDisabledReason": self.delete_disabled_reason}
                if self.delete_disabled_reason
                else {}
            ),
        }

    def search(self, query: str, limit: int) -> list[dict]:
        """Case-insensitive containment over path, descending id order.

        id = xxhash64(path), so ORDER BY id DESC is an arbitrary-but-
        deterministic order, not recency (the reference's serial ids
        make its ORDER BY id DESC newest-first; this catalog carries no
        ingest timestamp to reproduce that). With the result cap, broad
        queries return a stable, reproducible subset.

        `contains` rather than LIKE-with-interpolation: identical
        semantics to the reference's %q% pattern for plain text and no
        wildcard injection from the query string.
        """
        query = query.strip()
        if not query:
            return []
        # serialized with delete(): a concurrent rewrite renames the
        # backing table directory out from under an in-flight scan
        with self._lock:
            hits = (
                self._df.filter(
                    F.contains(F.lower(F.col("path")), F.lit(query.lower()))
                )
                .orderBy(F.desc("id"))
                .limit(limit)
            )
            return [r.asDict() for r in hits.collect()]

    def delete(self, row_id: int) -> dict | None:
        """Remove an indexed row (analog of deleteIndexedFile — the DB
        half; the engine never mutates filesystems). None = not found."""
        with self._lock:
            row = self._df.filter(F.col("id") == row_id).limit(1).collect()
            if not row:
                return None
            path = row[0]["path"]
            # eqNullSafe: a plain != would also silently drop NULL-path
            # rows. id = xxhash64(path), so rows sharing a path share an
            # identity — deleting the id deletes all of them *on this
            # host*. When serving host-scoped (the only configuration
            # where delete is enabled), other hosts' rows for the same
            # path must survive — the reference's deleteIndexedFile
            # removes one per-host indexed row, not every host's.
            keep = ~F.col("path").eqNullSafe(F.lit(path))
            if self.host and "host" in self._df.columns:
                # null-safe: rows with NULL or different host are outside
                # this server's scope and must never be rewritten away
                keep = keep | ~F.lower(F.col("host")).eqNullSafe(F.lit(self.host))
            remaining = (
                self.catalog.read(self.spark, self.table).filter(keep)
            )
            self.catalog.write(remaining, self.table, params_hash="serve-delete")
            self.refresh()
            return {
                "id": row_id,
                "path": path,
                "removedDb": True,
                "removedFile": False,
                "alreadyMissing": True,
            }


def _make_handler(service: SearchService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest/CLI output clean
            pass

        def _json(self, status: int, payload) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            url = urlparse(self.path)
            if url.path in ("/", "/index.html"):
                from .webui import INDEX_HTML

                body = INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path == "/api/health":
                return self._json(200, service.health())
            if url.path == "/api/search":
                qs = parse_qs(url.query)
                q = (qs.get("q") or [""])[0]
                limit = parse_search_limit((qs.get("limit") or [None])[0])
                try:
                    return self._json(200, service.search(q, limit))
                except Exception as e:  # surfaced as the reference's 500
                    return self._json(500, {"error": str(e)})
            return self._json(404, {"error": "not found"})

        def do_POST(self) -> None:
            m = _FILE_ACTION.match(urlparse(self.path).path)
            if not m or m.group(2) != "delete":
                return self._json(404, {"error": "unknown file action"})
            if not service.delete_enabled:
                return self._json(403, {"error": service.delete_disabled_reason})
            try:
                resp = service.delete(int(m.group(1)))
            except Exception as e:
                return self._json(500, {"error": str(e)})
            if resp is None:
                return self._json(404, {"error": "file not found"})
            return self._json(200, resp)

    return Handler


def start_server(service: SearchService, addr: str = "127.0.0.1", port: int = 0):
    """Bind and serve on a daemon thread; returns the live server (its
    .server_address carries the bound port). Caller shuts down with
    server.shutdown()."""
    server = ThreadingHTTPServer((addr, port), _make_handler(service))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


def serve(service: SearchService, addr: str = "0.0.0.0", port: int = 19111) -> None:
    """Blocking variant for the CLI (default port = reference's :19111)."""
    server = ThreadingHTTPServer((addr, port), _make_handler(service))
    print(f"search service listening on {addr}:{port} table={service.table}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
