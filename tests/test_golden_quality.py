"""Golden clustered-fixture quality gate: the cascade at DEFAULT knobs
(params.N_PROBE / K_TOP_CENTROIDS / NUM_SECOND_PASS) must reach
Success@10 >= 0.9 against exact MaxSim on a topically-coherent corpus —
the role the reference's tests/colbert_test.cpp golden ranking plays.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lintdb_spark.golden import golden_fixture
from lintdb_spark.operators import ann, scoring


def _exact_topk(queries, dt, k=10):
    exact = (
        queries.join(dt)
        .select(
            "qid",
            "doc_id",
            "q_id",
            F.aggregate(
                F.zip_with("vec", "qvec", lambda x, y: x * y),
                F.lit(0.0),
                lambda a, v: a + v,
            ).alias("ip"),
        )
        .groupBy("qid", "doc_id", "q_id")
        .agg(F.max("ip").alias("best"))
        .groupBy("qid", "doc_id")
        .agg(F.sum("best").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "doc_id")
    )


def test_golden_default_knobs_success(spark):
    n_queries = 16
    dt, cents, queries = golden_fixture(spark, n_docs=600, n_queries=n_queries)
    ta = ann.assign_tokens(dt.repartition(8, "doc_id"), cents)
    approx = scoring.batch_two_phase_topk(dt, ta, queries, cents)  # default knobs
    hits = approx.join(_exact_topk(queries, dt), ["qid", "doc_id"]).count()
    success = hits / (n_queries * 10)
    assert success >= 0.9, f"golden Success@10 {success} < 0.9 at default knobs"


def test_golden_fixture_deterministic(spark):
    dt1, _, q1 = golden_fixture(spark, n_docs=50, n_queries=4)
    dt2, _, q2 = golden_fixture(spark, n_docs=50, n_queries=4)
    assert dt1.collect() == dt2.collect()
    assert q1.collect() == q2.collect()


def test_golden_xtr_success(spark):
    """XTR at default nearest_tokens_to_fetch must rank the golden
    corpus nearly as well as exact MaxSim — gauges the token-retrieval
    + missing-similarity imputation, not just oracle hash parity."""
    n_queries = 16
    dt, _, queries = golden_fixture(spark, n_docs=600, n_queries=n_queries)
    qids = queries.select("qid").distinct()
    xtr = scoring.batch_xtr_topk(
        dt.crossJoin(qids).select("qid", "doc_id", "token_idx", "vec"),
        queries,
        k=10,
    )
    hits = xtr.join(_exact_topk(queries, dt), ["qid", "doc_id"]).count()
    success = hits / (n_queries * 10)
    from lintdb_spark.cache import release

    release(xtr)
    # gate raised 0.8 -> 0.9 in round 13: the k' sweep showed the old
    # default (64) undersized token retrieval (Success 0.90 on the
    # bench fixture); at k'=256 the bench fixture scores 0.9688 and
    # this smaller fixture must clear 0.9 with margin
    assert success >= 0.9, f"golden XTR Success@10 {success} < 0.9"
