"""Index.search_batch must agree with per-query Index.search."""

from __future__ import annotations

import pytest

from lintdb_spark.index import Index, VectorQuery
from tests.test_index_lifecycle import OPTS, doc_tokens, make_docs, make_schema


@pytest.mark.parametrize("quant", ["none", "binarizer"])
def test_batch_matches_single(quant, spark, tmp_path):
    idx = Index.create(spark, str(tmp_path / f"bidx_{quant}"), make_schema(quant))
    docs = make_docs(spark, range(15))
    idx.train(docs)
    idx.add(docs)

    queries = {100: doc_tokens(2), 200: doc_tokens(9), 300: doc_tokens(14)}
    batch = idx.search_batch(0, "colbert", queries, k=5, opts=OPTS).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["qid"], []).append(r)

    assert set(by_qid) == {100, 200, 300}
    for qid, q in queries.items():
        single = idx.search(0, VectorQuery("colbert", q), k=5, opts=OPTS).collect()
        got = sorted(by_qid[qid], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single]
        for g, s in zip(got, single):
            assert abs(g["score"] - s["score"]) < 1e-9
            assert g["title"] == s["title"]
    # self-queries rank their own doc first
    assert sorted(by_qid[100], key=lambda r: r["rank"])[0]["doc_id"] == 2
    assert sorted(by_qid[200], key=lambda r: r["rank"])[0]["doc_id"] == 9


def test_batch_filtered(spark, tmp_path):
    """Batch filtered search: shared term predicate restricts every
    query's candidates (BENCH-3 in batch form)."""
    from lintdb_spark.index import TermQuery

    idx = Index.create(spark, str(tmp_path / "bf"), make_schema("none"))
    docs = make_docs(spark, range(15))
    idx.train(docs)
    idx.add(docs)
    res = idx.search_batch(
        0,
        "colbert",
        {1: doc_tokens(4), 2: doc_tokens(7)},
        k=5,
        opts=OPTS,
        doc_filter=TermQuery("category", "odd"),
    ).collect()
    assert len(res) > 0
    assert all(r["doc_id"] % 2 == 1 for r in res)  # predicate holds everywhere
    by_qid = {}
    for r in res:
        by_qid.setdefault(r["qid"], []).append(r)
    # query 2's target (doc 7) is odd -> still top; query 1's target (4) is even -> excluded
    assert sorted(by_qid[2], key=lambda r: r["rank"])[0]["doc_id"] == 7
    assert all(r["doc_id"] != 4 for r in by_qid[1])
