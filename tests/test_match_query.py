"""MatchQuery (analyzed TEXT field) against a real index."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from lintdb_spark.index import Index, MatchQuery, AndQuery, VectorQuery
from lintdb_spark.index.schema import (
    DataType,
    FieldType,
    IndexedField,
    Schema,
    StoredField,
    TensorField,
)
from tests.test_index_lifecycle import DIM, OPTS, doc_tokens

TEXTS = {
    0: "Spark engines process Data fast!",
    1: "the quick brown fox",
    2: "data pipelines stream DATA all day",
    3: "vector search with spark",
    4: "nothing relevant here",
}


@pytest.fixture(scope="module")
def text_index(spark, tmp_path_factory):
    schema = Schema(
        [
            TensorField(
                "colbert", dimensions=DIM, roles=[FieldType.COLBERT],
                quantization="none", num_centroids=4,
            ),
            IndexedField("body", DataType.TEXT, analyzer="standard"),
            StoredField("title", DataType.TEXT),
        ]
    )
    path = str(tmp_path_factory.mktemp("tidx") / "index")
    idx = Index.create(spark, path, schema)
    rows = [
        (0, d, [[float(x) for x in tok] for tok in doc_tokens(d)], TEXTS[d], f"doc-{d}")
        for d in TEXTS
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("tenant", T.LongType()),
                T.StructField("doc_id", T.LongType()),
                T.StructField("colbert", T.ArrayType(T.ArrayType(T.FloatType()))),
                T.StructField("body", T.StringType()),
                T.StructField("title", T.StringType()),
            ]
        ),
    )
    idx.train(df)
    idx.add(df)
    return idx


def test_match_any_scores_by_token_count(text_index):
    res = text_index.search(0, MatchQuery("body", "data spark"), k=10, opts=OPTS).collect()
    scores = {r["doc_id"]: r["score"] for r in res}
    # doc 0 has both (case/punct-insensitive), 2 has data, 3 has spark
    assert scores[0] == 2.0
    assert scores[2] == 1.0 and scores[3] == 1.0
    assert 1 not in scores and 4 not in scores
    assert res[0]["doc_id"] == 0  # highest match count first


def test_match_all_mode(text_index):
    res = text_index.search(0, MatchQuery("body", "data spark", mode="all"), k=10, opts=OPTS).collect()
    assert [r["doc_id"] for r in res] == [0]


def test_match_with_vector_restricts_candidates(text_index):
    q = AndQuery([MatchQuery("body", "data"), VectorQuery("colbert", doc_tokens(3))])
    res = text_index.search(0, q, k=10, opts=OPTS).collect()
    ids = [r["doc_id"] for r in res]
    assert set(ids) <= {0, 2}  # only docs matching 'data'
    assert len(ids) > 0


def test_match_tf_mode_scores_term_frequency(text_index):
    # doc 2 contains 'data' twice (case-insensitive), doc 0 once —
    # tf mode ranks 2 above 0; any mode ties them at 1
    res = text_index.search(0, MatchQuery("body", "data", mode="tf"), k=10, opts=OPTS).collect()
    scores = {r["doc_id"]: r["score"] for r in res}
    assert scores[2] == 2.0 and scores[0] == 1.0
    assert res[0]["doc_id"] == 2


def test_match_survives_remove(text_index):
    text_index.remove(0, [2])
    res = text_index.search(0, MatchQuery("body", "data"), k=10, opts=OPTS).collect()
    assert {r["doc_id"] for r in res} == {0}
