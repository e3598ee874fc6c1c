"""General query-tree composition: Or with vector children, nested
And/Or, SUM score combination — the full DocIterator-tree semantics."""

from __future__ import annotations

import pytest

from lintdb_spark.index import AndQuery, Index, OrQuery, TermQuery, VectorQuery
from tests.test_index_lifecycle import NUM_DOCS, OPTS, doc_tokens, make_docs, make_schema


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("trees") / "index")
    i = Index.create(spark, path, make_schema("none"))
    docs = make_docs(spark, range(NUM_DOCS))
    i.train(docs)
    i.add(docs)
    return i


def test_or_vector_term_unions_candidates(idx):
    """Or(vector, term): docs matching only the term (outside probed
    lists for the vector) still appear; vector hits rerank on top."""
    q = OrQuery([VectorQuery("colbert", doc_tokens(7)), TermQuery("rank_i", 1)])
    res = idx.search(0, q, k=50, opts=OPTS).collect()
    ids = {r["doc_id"] for r in res}
    assert 7 in ids  # vector self-hit
    for d in range(NUM_DOCS):
        if d % 3 == 1:
            assert d in ids  # every term match present
    assert res[0]["doc_id"] == 7  # exact MaxSim reranks the self-hit first


def test_and_sum_scoring(idx):
    """And of two terms scores 2.0 (SUM of per-term presence scores,
    scoring_methods.cpp:60-97)."""
    q = AndQuery([TermQuery("category", "even"), TermQuery("rank_i", 0)])
    res = idx.search(0, q, k=50, opts=OPTS).collect()
    assert len(res) > 0
    assert all(r["score"] == 2.0 for r in res)


def test_nested_tree(idx):
    """And(Or(term, term), vector): nested boolean restricting ANN."""
    q = AndQuery(
        [
            OrQuery([TermQuery("rank_i", 0), TermQuery("rank_i", 1)]),
            VectorQuery("colbert", doc_tokens(9)),
        ]
    )
    res = idx.search(0, q, k=10, opts=OPTS).collect()
    assert all(r["doc_id"] % 3 in (0, 1) for r in res)
    assert res[0]["doc_id"] == 9  # 9 % 3 == 0 passes the filter


def test_or_of_terms_dedup_and_sum(idx):
    """Or(even, rank0): docs matching both children score 2.0, others 1.0."""
    q = OrQuery([TermQuery("category", "even"), TermQuery("rank_i", 0)])
    res = {r["doc_id"]: r["score"] for r in idx.search(0, q, k=50, opts=OPTS).collect()}
    for d in range(NUM_DOCS):
        expect = (1.0 if d % 2 == 0 else 0.0) + (1.0 if d % 3 == 0 else 0.0)
        if expect == 0:
            assert d not in res
        else:
            assert res[d] == expect


def test_or_two_vectors_sums_exact_maxsim(idx):
    """Or(vec7, vec9): stage-2 sums exact MaxSim over BOTH vector
    nodes (the tree's SUM combination carried through the rerank), so
    each self-hit tops the ranking on its own node's contribution."""
    q = OrQuery(
        [
            VectorQuery("colbert", doc_tokens(7)),
            VectorQuery("colbert", doc_tokens(9)),
        ]
    )
    res = idx.search(0, q, k=10, opts=OPTS).collect()
    assert {res[0]["doc_id"], res[1]["doc_id"]} == {7, 9}
    # summed rerank: every returned score reflects both nodes — the
    # self-hits' totals strictly beat the rest
    third = res[2]["score"] if len(res) > 2 else float("-inf")
    assert min(res[0]["score"], res[1]["score"]) > third
