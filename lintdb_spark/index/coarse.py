"""Coarse quantizer: IVF centroid training and token->centroid
assignment.

Reference behavior (SURVEY.md §2.E E2/E3/E7): Faiss k-means over all
token embeddings (lintdb/quantizers/impl/kmeans.cpp:11-35), assignment
by max inner product (CoarseQuantizer.cpp:243-258).

Spark rebuild:
- train: MLlib KMeans on the exploded token DataFrame. MLlib is
  Euclidean; the reference clusters by inner product — for the
  L2-normalized embeddings ColBERT produces, argmax-IP == argmin-L2,
  so we (optionally) normalize before training and document the
  difference (SURVEY.md §7 risk register).
- assign: Arrow-batched pandas UDF computing argmax(tokens @ C.T)
  against a BROADCAST centroid matrix — one numpy matmul per batch,
  no shuffle, no per-row Python. This is the scale path: the centroid
  matrix is ~MBs (num_centroids ~ sqrt(total tokens)) while tokens
  stream through executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def train_centroids(
    token_vecs: DataFrame,
    num_centroids: int,
    max_iter: int = 10,
    seed: int = 42,
    normalize: bool = True,
) -> np.ndarray:
    """token_vecs: DataFrame with a ``vec array<float>`` column.
    Returns (num_centroids, dim) float32 centroid matrix."""
    col = F.col("vec").cast("array<double>")
    if normalize:
        from lintdb_spark.functions.vector import l2_normalize

        col = l2_normalize(col)
    feats = token_vecs.select(array_to_vector(col).alias("features"))
    model = KMeans(k=num_centroids, maxIter=max_iter, seed=seed).fit(feats)
    return np.asarray(model.clusterCenters(), dtype=np.float32)


def assign_udf(spark: SparkSession, centroids: np.ndarray):
    """Returns a pandas UDF mapping array<array<float>> token matrices
    to array<bigint> centroid codes (argmax inner product per token).

    Vectorized across the whole Arrow batch: every document's tokens
    are stacked into ONE (sum_tokens x dim) matrix for a single matmul
    instead of one tiny matmul per document — cuts the Python-loop
    overhead on the ingest hot path several-fold."""
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(centroids.T, dtype=np.float32))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def assign(tokens: pd.Series) -> pd.Series:
        if not len(tokens):
            return pd.Series([], dtype=object)
        ct = bc.value
        # B2 validateField, value half: a NULL/empty tensor would
        # otherwise die in np.vstack with an opaque concatenate error;
        # every downstream scorer (reduceat segments) relies on >= 1
        # token per doc, so reject it here with the rule's name
        for tok in tokens:
            if tok is None or len(tok) == 0:
                raise ValueError(
                    "tensor field must contain >= 1 token vector "
                    "(B2 validateField)"
                )
        mats = [np.vstack(tok).astype(np.float32, copy=False) for tok in tokens]
        counts = np.fromiter((m.shape[0] for m in mats), dtype=np.int64, count=len(mats))
        codes = (np.vstack(mats) @ ct).argmax(axis=1).astype(np.int64)
        return pd.Series(np.split(codes, np.cumsum(counts)[:-1]))

    # expose the broadcast so the (synchronous) ingest call that built
    # this UDF can unpersist it once its writes commit — a long-lived
    # server otherwise accumulates one centroid blob per add()
    assign._lintdb_bc = bc
    return assign


def residual_encode_udf(spark: SparkSession, centroids: np.ndarray, quantizer):
    """pandas UDF: (tokens array<array<float>>, codes array<bigint>) ->
    packed residual codes (binary). residual = token - centroid[code]
    (CoarseQuantizer.cpp:57-84), then quantizer.encode.

    Batch-vectorized like assign_udf: one stacked residual subtraction
    and ONE quantizer.encode over all the batch's tokens; per-document
    blobs are byte-slices of the result (valid because every quantizer
    encodes tokens independently at fixed code_size bytes/token)."""
    bc_c = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float32))

    @F.pandas_udf(T.BinaryType())
    def enc(tokens: pd.Series, codes: pd.Series) -> pd.Series:
        if not len(tokens):
            return pd.Series([], dtype=object)
        C = bc_c.value
        mats = [np.vstack(tok).astype(np.float32, copy=False) for tok in tokens]
        counts = np.fromiter((m.shape[0] for m in mats), dtype=np.int64, count=len(mats))
        all_codes = np.concatenate([np.asarray(c, dtype=np.int64) for c in codes])
        res = np.vstack(mats) - C[all_codes]
        blob = quantizer.encode(res)
        cs = quantizer.code_size
        bounds = np.concatenate(([0], np.cumsum(counts))) * cs
        return pd.Series(
            [blob[bounds[i] : bounds[i + 1]] for i in range(len(mats))]
        )

    enc._lintdb_bc = bc_c
    return enc
