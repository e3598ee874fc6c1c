"""Clustered golden fixture for cascade-quality checks.

The driver's synthetic embeddings are near-orthogonal random vectors,
so codes-only PLAID correlates weakly with exact MaxSim and the
reference's shallow default knobs look artificially bad (BENCH-4
default-knob Success@10 = 0.2 in round 1). Real ColBERT embeddings
cluster — that structure is what makes k_top_centroids=2 + a shallow
second pass work. This module generates a seeded mixture-of-Gaussians
corpus that reproduces that regime, mirroring the role of the
reference's golden test (tests/colbert_test.cpp:17-100 +
tests/data/colbert.ranking.tsv: a fixed corpus where default knobs must
rank correctly).

Deterministic: all draws from numpy RandomState(seed); the fixture is
fully reproducible from (seed, sizes) — the committed generator IS the
fixture.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def _unit(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def golden_fixture(
    spark: SparkSession,
    n_docs: int = 1000,
    n_clusters: int = 64,
    dim: int = 64,
    tokens_per_doc: int = 4,
    clusters_per_doc: int = 1,
    n_queries: int = 32,
    query_tokens: int = 8,
    noise: float = 0.2,
    query_noise: float = 0.08,
    seed: int = 7,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(doc_tokens, centroids, queries) in the shapes the cascade
    operators expect:

    - doc_tokens: (doc_id, token_idx, vec double[], label)
    - centroids:  (centroid_id, cvec double[]) — the TRUE mixture
      centers, standing in for a converged trained quantizer
    - queries:    (qid, q_id, qvec double[]) — query qid is a noised
      copy of doc qid's tokens (plus extra random tokens up to
      query_tokens), so doc qid is its own ground-truth top-1

    ``clusters_per_doc`` models topical coherence: a document's tokens
    draw from a small set of clusters (real passages cluster this way —
    it is WHY codes-only PLAID works as a first pass: for a coherent
    doc, sum-of-max centroid scores tracks exact MaxSim up to token
    noise). Incoherent docs (clusters_per_doc = tokens_per_doc, each
    token its own random cluster) reproduce the driver-data regime
    where stage-1 is weakly informative and only a deep second pass
    recovers quality."""
    rng = np.random.RandomState(seed)
    centers = _unit(rng.randn(n_clusters, dim).astype(np.float64))

    doc_clusters = rng.randint(
        0, n_clusters, size=(n_docs, max(1, clusters_per_doc))
    )
    pick = rng.randint(0, max(1, clusters_per_doc), size=(n_docs, tokens_per_doc))
    assign = np.take_along_axis(doc_clusters, pick, axis=1)
    toks = _unit(centers[assign] + noise * rng.randn(n_docs, tokens_per_doc, dim))

    doc_rows = pd.DataFrame(
        {
            "doc_id": np.repeat(np.arange(n_docs, dtype=np.int64), tokens_per_doc),
            "token_idx": np.tile(
                np.arange(tokens_per_doc, dtype=np.int64), n_docs
            ),
            "vec": list(toks.reshape(n_docs * tokens_per_doc, dim)),
            "label": np.repeat(
                np.arange(n_docs, dtype=np.int64) % 7, tokens_per_doc
            ),
        }
    )
    cent_rows = pd.DataFrame(
        {
            "centroid_id": np.arange(n_clusters, dtype=np.int64),
            "cvec": list(centers),
        }
    )
    qids = rng.choice(n_docs, size=n_queries, replace=False).astype(np.int64)
    q_rows = []
    for qid in qids:
        base = toks[qid]  # (tokens_per_doc, dim)
        reps = -(-query_tokens // tokens_per_doc)
        qmat = np.tile(base, (reps, 1))[:query_tokens]
        qmat = _unit(qmat + query_noise * rng.randn(*qmat.shape))
        for j in range(query_tokens):
            q_rows.append((int(qid), j, qmat[j]))
    query_rows = pd.DataFrame(q_rows, columns=["qid", "q_id", "qvec"])

    dt = spark.createDataFrame(
        doc_rows, "doc_id long, token_idx long, vec array<double>, label long"
    )
    cents = spark.createDataFrame(cent_rows, "centroid_id long, cvec array<double>")
    queries = spark.createDataFrame(
        query_rows, "qid long, q_id long, qvec array<double>"
    )
    return dt, cents, queries
