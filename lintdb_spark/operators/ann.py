"""IVF-style candidate generation, Spark-first.

Reference behavior being matched (SURVEY.md §2.C):
- assignIVFCentroids: nearest centroid per token by inner product
  (lintdb/schema/DocProcessor.cpp:183-198,
  lintdb/quantizers/CoarseQuantizer.cpp:243-258).
- KnnNearestCentroids::calculate + get_top_centroids: per-centroid max
  query-token score -> top n_probe probe list
  (lintdb/query/KnnNearestCentroids.cpp:6-110).
- VectorQueryNode: OR over probed posting lists, dedup by doc_id
  (lintdb/query/QueryNode.cpp:29-101).

Scale notes: the centroid table is small by construction
(num_centroids ~ sqrt(total tokens); 65536 x 128 floats = 32 MB at the
reference's largest config) so every join against it is explicitly
``broadcast()``. The tokens side streams — no shuffle is needed until
the per-token argmax, which is a window over (doc_id, token_idx); at
100 TB the same plan holds because the window key is the natural data
key. Probe selection (a few-row aggregate) intentionally stays a tiny
Spark job rather than driver-side numpy so the whole query remains one
lazy plan; the candidate filter is ``centroid_id IN (probes)`` which a
partitioned/bucketed postings layout turns into partition pruning —
the Spark analogue of opening only n_probe posting lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lintdb_spark import params
from lintdb_spark.functions.vector import dot_product


def assign_tokens(doc_tokens: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per token by inner product.

    Returns (doc_id, token_idx, label, centroid_id, ip). The argmax is
    a struct-max AGGREGATE, not a window: max of (rounded score,
    -centroid_id, ...) is lexicographic, so ties on the 6-decimal
    score break toward the smallest centroid_id — identical semantics
    to the oracle's row_number ordering, but with map-side partial
    aggregation and no per-partition sort. At 100 TB this is the
    difference between one combine-enabled shuffle of |tokens| rows
    and sorting |tokens| x |centroids| rows.
    """
    scored = doc_tokens.join(F.broadcast(centroids)).withColumn(
        "ip", dot_product("vec", "cvec")
    )
    best = scored.groupBy("doc_id", "token_idx", "label").agg(
        F.max(
            F.struct(
                F.round(F.col("ip"), 6).alias("r"),
                (-F.col("centroid_id")).alias("nc"),
                F.col("ip").alias("ip"),
            )
        ).alias("b")
    )
    return best.select(
        "doc_id",
        "token_idx",
        "label",
        (-F.col("b.nc")).alias("centroid_id"),
        F.col("b.ip").alias("ip"),
    )


def top_centroids(
    query_tokens: DataFrame,
    centroids: DataFrame,
    n_probe: int | None = None,
    k_top: int | None = None,
) -> DataFrame:
    """Probe selection (KnnNearestCentroids.cpp:38-110): each query
    token nominates its top ``k_top_centroids`` centroids; a centroid's
    score is the max over ONLY those per-token nominations (scores
    outside a token's top-k never contribute); non-positive scores are
    dropped; the top ``n_probe`` by score survive.

    Scale: the window sort is over |q_tokens| x |centroids| rows — a
    few MB even at the reference's largest config (32 tokens x 65536
    centroids), nowhere near the doc-token path."""
    n_probe = n_probe or params.N_PROBE
    k_top = k_top or params.K_TOP_CENTROIDS
    scored = query_tokens.join(F.broadcast(centroids)).withColumn(
        "score", dot_product("qvec", "cvec")
    )
    w_tok = Window.partitionBy("q_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("centroid_id").asc()
    )
    nominated = (
        scored.withColumn("kt", F.row_number().over(w_tok))
        .filter(F.col("kt") <= k_top)
    )
    return (
        nominated.groupBy("centroid_id")
        .agg(F.max("score").alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.round(F.col("score"), 6).desc(), F.col("centroid_id").asc())
        .limit(n_probe)
    )


def candidates(token_assign: DataFrame, probes, distinct: bool = True) -> DataFrame:
    """Distinct doc_ids with >=1 token in a probed list — the OR-
    across-posting-lists semantics of VectorQueryNode
    (lintdb/query/QueryNode.h:59-64). ``probes`` is either a
    (centroid_id, ...) DataFrame (tiny -> broadcast join) or a
    driver-side list of centroid ids — the list form becomes a
    ``centroid_id IN (...)`` literal predicate, which a
    partitioned/bucketed postings layout turns into partition pruning
    (the Spark analogue of opening only n_probe posting lists).

    ``distinct=False`` skips the dedup shuffle — correct whenever the
    result only feeds a left-semi join or broadcast hash-set build
    (both dedup inherently), which is every cascade consumer."""
    if isinstance(probes, (list, tuple)):
        matched = token_assign.filter(F.col("centroid_id").isin(list(probes)))
    else:
        matched = token_assign.join(
            F.broadcast(probes.select("centroid_id")), "centroid_id"
        )
    out = matched.select("doc_id")
    return out.distinct() if distinct else out
