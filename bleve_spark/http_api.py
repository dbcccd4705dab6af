"""HTTP handlers over the Index facade.

Mirrors the reference's REST surface (/root/reference/http/*.go —
registry of named indexes + per-index doc/search/fields handlers) on
the stdlib http.server. The Spark driver hosts the endpoint; every
request plans/executes through the same Searcher the Python API uses.

Routes (reference handler in parens):
  PUT    /api/{index}                       create (index_create.go)
  GET    /api/{index}                       mapping/meta (index_get.go)
  DELETE /api/{index}                       delete (index_delete.go)
  GET    /api                               list (index_list.go)
  PUT    /api/{index}/{docID}               doc_index.go
  GET    /api/{index}/{docID}               doc_get.go
  DELETE /api/{index}/{docID}               doc_delete.go
  POST   /api/{index}/_search               search.go (bleve JSON query)
  GET    /api/{index}/_count                doc_count.go
  GET    /api/{index}/_fields               fields.go

Search request JSON: {"query": <bleve query dict>, "size", "from",
"sort", "fields", "similarity"} -> {"total_hits", "hits": [{"id",
"score", "fields"}]}; errors return {"error": ...} with 4xx/5xx.
"""

from __future__ import annotations

import json
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

from .api import Index
from .mapping import IndexMapping
from .query import parse_query, validate_query_filters
from .search import SearchRequest


class IndexRegistry:
    """ref: http/registry.go — named index handles."""

    def __init__(self, spark, base_path: str):
        self.spark = spark
        self.base_path = base_path
        self._indexes: Dict[str, Index] = {}
        self._lock = threading.Lock()

    def create(self, name: str, mapping: Optional[IndexMapping] = None) -> Index:
        with self._lock:
            if name in self._indexes:
                raise ValueError(f"index {name!r} already exists")
            idx = Index(
                self.spark, f"{self.base_path}/{name}", mapping
            )
            self._indexes[name] = idx
            return idx

    def get(self, name: str) -> Index:
        with self._lock:
            if name not in self._indexes:
                raise KeyError(f"no such index {name!r}")
            return self._indexes[name]

    def delete(self, name: str) -> None:
        with self._lock:
            idx = self._indexes.pop(name, None)
        if idx is None:
            raise KeyError(f"no such index {name!r}")
        idx.close()
        shutil.rmtree(idx.index_path, ignore_errors=True)

    def names(self):
        with self._lock:
            return sorted(self._indexes)


def _search_payload(idx: Index, body: dict) -> dict:
    parsed = parse_query(body["query"])
    # HTTP bodies are untrusted: FilterQuery predicates go through
    # F.expr() at search time, so restrict them to plain column
    # comparisons here (no java_method()/reflect()/UDF invocation).
    validate_query_filters(parsed)
    req = SearchRequest(
        query=parsed,
        size=int(body.get("size", 10)),
        from_=int(body.get("from", 0)),
        sort=body.get("sort", ("-_score", "_id")),
        fields=body.get("fields", ()),
        similarity=body.get("similarity", "tfidf"),
        with_total=True,
    )
    res = idx.search(req)
    hits = []
    for r in res.hits.collect():
        d = r.asDict(recursive=True)
        hits.append(
            {
                "id": d.pop("_id"),
                "score": d.pop("score"),
                "fields": {
                    k: v for k, v in d.items() if k != "docid"
                },
            }
        )
    return {"total_hits": res.total, "hits": hits}


def make_handler(registry: IndexRegistry):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if not n:
                return {}
            return json.loads(self.rfile.read(n))

        def _route(self):
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            if not parts or parts[0] != "api":
                raise ValueError("unknown route")
            return parts[1:]

        def _dispatch(self):
            parts = self._route()
            method = self.command
            if not parts:
                if method == "GET":
                    return 200, {"indexes": registry.names()}
                raise ValueError("unknown route")
            name = parts[0]
            if len(parts) == 1:
                if method == "PUT":
                    registry.create(name)
                    return 201, {"status": "created"}
                if method == "GET":
                    idx = registry.get(name)
                    return 200, {
                        "name": name,
                        "doc_count": idx.doc_count(),
                    }
                if method == "DELETE":
                    registry.delete(name)
                    return 200, {"status": "deleted"}
                raise ValueError("unknown route")
            idx = registry.get(name)
            tail = parts[1]
            if tail == "_search" and method == "POST":
                return 200, _search_payload(idx, self._body())
            if tail == "_count" and method == "GET":
                return 200, {"count": idx.doc_count()}
            if tail == "_fields" and method == "GET":
                return 200, {"fields": idx.fields()}
            doc_id = tail
            if method == "PUT":
                idx.index(doc_id, self._body())
                return 201, {"status": "ok"}
            if method == "GET":
                doc = idx.document(doc_id)
                if doc is None:
                    raise KeyError(f"no such document {doc_id!r}")
                return 200, {"id": doc_id, "fields": doc}
            if method == "DELETE":
                idx.delete(doc_id)
                return 200, {"status": "ok"}
            raise ValueError("unknown route")

        def _handle(self):
            try:
                code, payload = self._dispatch()
                self._send(code, payload)
            except KeyError as e:
                self._send(404, {"error": str(e)})
            except (ValueError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        do_GET = do_PUT = do_POST = do_DELETE = _handle

    return Handler


class HttpServer:
    """Threaded HTTP server hosting the registry; `with` or
    start()/stop()."""

    def __init__(self, spark, base_path: str, port: int = 0):
        self.registry = IndexRegistry(spark, base_path)
        self._httpd = ThreadingHTTPServer(
            ("127.0.0.1", port), make_handler(self.registry)
        )
        self.port = self._httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
