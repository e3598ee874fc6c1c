"""HTTP serving shim (A11): the reference's Drogon REST server
(`lintdb/server/main.cpp:40-48`, `controllers/v1/Index.h:36-41`)
re-expressed as a stdlib ThreadingHTTPServer over a long-lived
SparkSession + loaded Index — the "driver as query frontend" pattern a
Spark deployment would put behind Spark Connect or Livy in production.

Endpoints (parity with `lintdb/server/openapi.yaml` and
`server/api_tests.py:1-90`):

- ``POST /v1/Index/search/{tenant}`` — body
  ``{"query": <node>, "options": {<SearchOptions knobs, e.g. n_probe,
  num_second_pass>}, "k": N}`` ("search_options" is an accepted alias;
  unknown keys like the reference's colbert_field — here carried by
  the query node's name — are ignored) ->
  ``{"results": [{"id", "score", "metadata": {...}}]}``
- ``POST /v1/Index/add/{tenant}`` / ``update/{tenant}`` — body
  ``{"documents": [{"id", "fields": [{"name", "data_type", "value"}]}]}``
  -> ``{"ok": true}``
- ``POST /v1/Index/remove/{tenant}`` — ``{"ids": [...]}`` -> ``{"ok": true}``

Query-node JSON translation mirrors
`server/controllers/v1/query_node_translator.h:12-52` (TERM, TENSOR,
AND — plus OR and MATCH, which the JSON grammar reserves but the
reference never wired). Tensor values arrive as a flat float list plus
``num_tensors``, exactly like the reference's ``lintdb::Tensor``.

Concurrency: requests are handled on server threads; Spark job
submission from multiple threads is safe (each action is an
independent job). The reference uses 12 Drogon threads
(`server/main.cpp:44`); here the executor pool is the real concurrency
boundary.
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from lintdb_spark.index import SearchOptions
from lintdb_spark.index.query import (
    AndQuery,
    MatchQuery,
    OrQuery,
    TermQuery,
    VectorQuery,
)


def query_node_from_json(node: dict):
    """JSON -> query tree (query_node_translator.h:12-52 parity)."""
    ntype = node.get("type")
    if ntype == "TERM":
        return TermQuery(node["name"], node["value"])
    if ntype == "TENSOR":
        flat = np.asarray(node["value"], dtype=np.float32)
        n = int(node.get("num_tensors", 1))
        return VectorQuery(node["name"], flat.reshape(n, -1))
    if ntype == "MATCH":
        return MatchQuery(node["name"], node["value"], node.get("mode", "any"))
    if ntype in ("AND", "OR"):
        children = [query_node_from_json(c) for c in node.get("children", [])]
        return AndQuery(children) if ntype == "AND" else OrQuery(children)
    raise ValueError(f"unknown QueryNodeType: {ntype!r}")


class IndexServer:
    """Wraps a loaded Index in the reference's REST surface."""

    def __init__(self, index, host: str = "127.0.0.1", port: int = 0):
        self.index = index
        # Mutations (add/update/remove) are read-modify-write of the
        # index meta + a meta-file flip; serialize them. Searches stay
        # lock-free: Spark job submission is thread-safe, and commits
        # adopt their meta via ONE dict assignment (built on a copy),
        # so an in-process reader sees the whole pre- or post-commit
        # segment map, never a per-table partial. A search spanning
        # multiple _read calls can still straddle one commit — the
        # usual read-committed (not snapshot) isolation.
        self._write_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr logging
            def log_message(self, fmt, *args):  # noqa: D401
                pass

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    body, status = outer._route(self.path, payload)
                    # serialize INSIDE the try: a non-JSON-native stored
                    # field (DATETIME -> datetime.datetime) must produce
                    # a 500 error body, not an aborted connection.
                    # default=str covers datetime/date/Decimal.
                    data = json.dumps(body, default=str).encode()
                except Exception as exc:  # -> {"error": ...} like Index.h
                    body, status = {"error": str(exc)}, 500
                    data = json.dumps(body, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # ---- request routing ----

    def _route(self, path: str, payload: dict) -> tuple[dict, int]:
        parts = [p for p in path.split("/") if p]
        if len(parts) != 4 or parts[0] != "v1" or parts[1] != "Index":
            return {"ok": False}, 404
        op, tenant = parts[2], int(parts[3])
        if op == "search":
            return self._search(tenant, payload), 200
        if op in ("add", "update"):
            docs_df = self._documents_df(tenant, payload.get("documents", []))
            with self._write_lock:
                getattr(self.index, op)(docs_df)
            return {"ok": True}, 200
        if op == "remove":
            with self._write_lock:
                self.index.remove(tenant, [int(i) for i in payload.get("ids", [])])
            return {"ok": True}, 200
        return {"ok": False}, 404

    def _search(self, tenant: int, payload: dict) -> dict:
        query = query_node_from_json(payload["query"])
        k = int(payload.get("k", 10))
        # the reference's body key is "options" (openapi.yaml); accept
        # "search_options" as an alias. Unknown keys (e.g. the
        # reference's colbert_field, which here lives on the query
        # node's name) are ignored rather than 500ing.
        raw = {**(payload.get("options") or {}), **(payload.get("search_options") or {})}
        known = {f.name for f in dataclasses.fields(SearchOptions)}
        opts = SearchOptions(**{k_: v for k_, v in raw.items() if k_ in known})
        # materialize, then free any operator-persisted intermediates
        # (XTR's retrieval set, the cascade's token assignment) — a
        # long-lived server would otherwise accumulate one CacheManager
        # entry per request (see lintdb_spark/cache.py).
        from lintdb_spark.cache import release

        df = self.index.search(tenant, query, k=k, opts=opts)
        try:
            rows = df.collect()
        finally:
            # release even when collect fails — a long-lived server
            # must not leak one persisted intermediate per failed query
            release(df)
        stored = {"doc_id", "score"}
        return {
            "results": [
                {
                    "id": r["doc_id"],
                    "score": r["score"],
                    "metadata": {
                        c: r[c] for c in r.asDict() if c not in stored
                    },
                }
                for r in rows
            ]
        }

    def _documents_df(self, tenant: int, documents: list[dict]):
        """Document JSON -> one ingest DataFrame (Document::fromJson
        analogue): tensor fields arrive flat and are reshaped by the
        schema's declared dimensions."""
        schema = self.index.schema
        dims = {f.name: f.parameters.dimensions for f in schema.colbert_fields()}
        rows = []
        for d in documents:
            row = {"tenant": tenant, "doc_id": int(d["id"])}
            for f in d.get("fields", []):
                name, value = f["name"], f["value"]
                if name in dims:
                    flat = np.asarray(value, dtype=np.float32)
                    row[name] = [
                        [float(x) for x in tok] for tok in flat.reshape(-1, dims[name])
                    ]
                else:
                    row[name] = value
            rows.append(row)
        return self.index.spark.createDataFrame(
            rows, schema=schema.ingest_spark_schema()
        )

    # ---- lifecycle ----

    def start(self, prewarm: bool = True, tenant: int = 0) -> "IndexServer":
        """Start serving. ``prewarm`` (default on) runs Index.prewarm
        first — one tiny batch through the real serve path so postings
        persist, the doc-blob broadcast, centroid matrices, and codegen
        are resident BEFORE the port accepts traffic (measured at the
        sf10 probe: first 1000-q batch 17-20 s cold vs ~4 s prewarmed).
        Pass prewarm=False to trade first-request latency for startup
        time."""
        if prewarm:
            self.index.prewarm(tenant)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="lintdb-spark-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def serve(
    index, host: str = "127.0.0.1", port: int = 8080, prewarm: bool = True
) -> IndexServer:
    """Blocking entry point: `python -c "...serve(Index.load(...))"`."""
    srv = IndexServer(index, host, port)
    if prewarm:
        index.prewarm()
    print(f"lintdb-spark serving on http://{host}:{srv.port}/v1/Index/...")
    try:
        srv._httpd.serve_forever()
    except KeyboardInterrupt:
        srv.stop()
    return srv
