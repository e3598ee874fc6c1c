"""HTTP serving shim tests — the Spark twin of the reference's
`lintdb/server/api_tests.py:1-90` smoke protocol (search / add /
update / remove over JSON), run against an in-process IndexServer."""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pytest

from lintdb_spark.index import Index
from lintdb_spark.server import IndexServer, query_node_from_json
from lintdb_spark.index.query import AndQuery, TermQuery, VectorQuery
from tests.test_index_lifecycle import (
    DIM,
    NUM_TOKENS,
    doc_tokens,
    make_docs,
    make_schema,
)


def _post(port: int, path: str, body: dict) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    idx = Index.create(
        spark, str(tmp_path_factory.mktemp("srv") / "idx"), make_schema("none")
    )
    docs = make_docs(spark, range(10))
    idx.train(docs)
    idx.add(docs)
    srv = IndexServer(idx).start()
    yield srv
    srv.stop()


def _search_body(doc_id: int, k: int = 5) -> dict:
    return {
        "query": {
            "type": "TENSOR",
            "name": "colbert",
            "value": [float(x) for x in doc_tokens(doc_id).ravel()],
            "num_tensors": NUM_TOKENS,
        },
        "options": {"colbert_field": "colbert"},
        "k": k,
        "search_options": {"n_probe": 8, "num_second_pass": 50},
    }


def test_search_endpoint(server):
    data = _post(server.port, "/v1/Index/search/0", _search_body(3))
    assert "results" in data and len(data["results"]) == 5
    top = data["results"][0]
    assert top["id"] == 3  # self-query ranks itself first
    assert top["score"] > 0
    assert top["metadata"]["title"] == "doc-3"


def test_add_update_remove_roundtrip(server):
    tensor = [float(x) for x in doc_tokens(50001).ravel()]
    doc = {
        "id": 50001,
        "fields": [
            {"name": "colbert", "data_type": "TENSOR", "value": tensor},
            {"name": "category", "data_type": "TEXT", "value": "served"},
            {"name": "rank_i", "data_type": "INTEGER", "value": 7},
            {"name": "title", "data_type": "TEXT", "value": "title-50001"},
        ],
    }
    assert _post(server.port, "/v1/Index/add/0", {"documents": [doc]})["ok"]
    res = _post(server.port, "/v1/Index/search/0", _search_body(50001))
    assert res["results"][0]["id"] == 50001

    doc["fields"][3]["value"] = "title-updated"
    assert _post(server.port, "/v1/Index/update/0", {"documents": [doc]})["ok"]
    res = _post(server.port, "/v1/Index/search/0", _search_body(50001))
    assert res["results"][0]["metadata"]["title"] == "title-updated"

    assert _post(server.port, "/v1/Index/remove/0", {"ids": [50001]})["ok"]
    res = _post(server.port, "/v1/Index/search/0", _search_body(50001))
    assert all(r["id"] != 50001 for r in res["results"])


def test_search_error_shape(server):
    body = _search_body(0)
    body["query"]["type"] = "BOGUS"
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/Index/search/0",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 500
    assert "error" in json.loads(e.value.read())


def test_query_node_translation():
    node = query_node_from_json(
        {
            "type": "AND",
            "children": [
                {"type": "TERM", "name": "category", "value": "served"},
                {
                    "type": "TENSOR",
                    "name": "colbert",
                    "value": [0.0] * (NUM_TOKENS * DIM),
                    "num_tensors": NUM_TOKENS,
                },
            ],
        }
    )
    assert isinstance(node, AndQuery)
    assert isinstance(node.children[0], TermQuery)
    assert isinstance(node.children[1], VectorQuery)
    assert node.children[1].query_tokens.shape == (NUM_TOKENS, DIM)


def test_start_prewarms_by_default(spark, tmp_path):
    """Round-10: IndexServer.start() runs Index.prewarm() BEFORE the
    port accepts traffic (the r09 verdict's missing wiring), so the
    first request lands on the warm serve path — the postings-slice
    cache is already resident. prewarm=False opts out."""
    idx = Index.create(spark, str(tmp_path / "idx_warm"), make_schema("none"))
    docs = make_docs(spark, range(10))
    idx.train(docs)
    idx.add(docs)
    assert not getattr(idx, "_postings_serve_cache", None)
    srv = IndexServer(idx).start()
    try:
        # serve state resident before any request
        assert getattr(idx, "_postings_serve_cache", None)
        r = _post(srv.port, "/v1/Index/search/0", _search_body(3))
        assert r["results"] and r["results"][0]["id"] == 3
    finally:
        srv.stop()

    idx2 = Index.create(spark, str(tmp_path / "idx_cold"), make_schema("none"))
    idx2.train(docs)
    idx2.add(docs)
    srv2 = IndexServer(idx2).start(prewarm=False)
    try:
        assert not getattr(idx2, "_postings_serve_cache", None)
    finally:
        srv2.stop()
