"""Deterministic multi-vector document model over the driver's
``embeddings`` table.

The reference's data model is Document{id, multi-token tensor field}
(lintdb/schema/Document.h:12-18; FieldValue num_tensors makes a flat
vector a (num_tokens x dim) matrix, DataTypes.h:175-216). The driver's
synthetic data has no token-matrix column, so we derive one
deterministically: a *document* is TOKENS_PER_DOC consecutive vectors
of ``embeddings``; *centroids* are every CENTROID_STRIDE-th vector
(standing in for trained IVF centroids in oracle-checked queries —
real KMeans training lives in lintdb_spark.index); the *query* is a
fixed set of token vectors, mirroring the reference's padded 32-token
ColBERT query (tests/colbert_test.cpp:44).

Every builder here has an exactly matching DuckDB CTE in
lintdb_spark/oracle.py generated from the same params.py constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lintdb_spark import params
from lintdb_spark.tables import load_table


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, token_idx, vec double[], label) — one row per token.

    Repartitioned on read: the source is single-file parquet (one
    input split), and every scoring operator downstream does dense
    per-row vector math — without the spread it all lands in one task."""
    # column-only repartition: AQE right-sizes the partition count (the
    # downstream cascade is many small aggregation stages — forcing a
    # fixed count here costs more in task scheduling than it buys;
    # measured 2.5x slower with an explicit 32 at sf0.1)
    emb = load_table(spark, sf_dir, "embeddings").repartition(F.col("vec_id"))
    return emb.select(
        F.floor(F.col("vec_id") / params.TOKENS_PER_DOC).cast("bigint").alias("doc_id"),
        (F.col("vec_id") % params.TOKENS_PER_DOC).cast("bigint").alias("token_idx"),
        F.col("embedding").cast("array<double>").alias("vec"),
        F.col("label"),
    )


def centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(centroid_id, cvec double[]) — small; always broadcast it."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") % params.CENTROID_STRIDE == 0).select(
        F.floor(F.col("vec_id") / params.CENTROID_STRIDE).cast("bigint").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )


def query_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_id, qvec double[]) — the fixed multi-token query."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id").isin(params.QUERY_VEC_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )


BATCH_TOKENS_PER_QUERY = 8


def batch_queries(spark: SparkSession, sf_dir: str, nq: int) -> DataFrame:
    """(qid, q_id, qvec) — nq deterministic synthetic queries of
    BATCH_TOKENS_PER_QUERY tokens each; token j of query q is corpus
    vector (q*31 + j*7) mod n. q_id is the token POSITION (queries may
    repeat a vector, like ColBERT's padded queries)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    t = BATCH_TOKENS_PER_QUERY
    idx = spark.range(nq * t).select(
        F.expr(f"id div {t}").cast("bigint").alias("qid"),
        (F.col("id") % t).cast("bigint").alias("q_id"),
        F.expr(f"(id div {t}) * 31 + (id % {t}) * 7").alias("_raw"),
    )
    return (
        idx.withColumn("vec_id", F.col("_raw") % n)
        .join(emb, "vec_id")
        .select("qid", "q_id", F.col("embedding").cast("array<double>").alias("qvec"))
    )
