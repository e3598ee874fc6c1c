"""Similarity search over an embedding column.

- brute_force_knn: exact top-k cosine for a (small) query set —
  broadcast the queries, stream the corpus, TakeOrderedAndProject per
  query. The baseline and the oracle.
- ivf_knn: the scale path — restrict each query to its n_probe nearest
  coarse-centroid buckets before scoring (same IVF idea as the
  reference's VectorQueryNode, lintdb/query/QueryNode.cpp:29-101,
  applied to single-vector similarity search). With a corpus
  pre-partitioned by centroid_id this prunes (n_probe / n_centroids)
  of the scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lintdb_spark import params
from lintdb_spark.functions.vector import dot_product, l2_norm


def _cosine_pre(a: str, b: str, an: str, bn: str):
    """Cosine from a dot product and PRE-computed side norms (each norm
    evaluated once per input row, not once per candidate pair — the
    same arithmetic as dot/(|a||b|), so oracle values are unchanged).
    Zero-norm vectors score 0.0 instead of NaN — Spark sorts NaN above
    every real double, so an unguarded zero embedding would rank as the
    top neighbor of every query (the oracle applies the same guard)."""
    denom = F.col(an) * F.col(bn)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)


def brute_force_knn(
    embeddings: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """(q_id, neighbor_id, rank, cosine) — exact top-k per query,
    self-match excluded. Ordering on round(cos, 6) with vec_id
    tie-break for cross-engine determinism."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ).withColumn("qn", l2_norm("qv"))
    c = embeddings.repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism, F.col("vec_id")
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ).withColumn("cn", l2_norm("cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", _cosine_pre("qv", "cv", "qn", "cn").alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round(F.col("cos"), params.ROUND).alias("cosine"),
        )
    )


def ivf_bucket(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Bucket assignment (neighbor_id, cv, centroid_id): nearest
    centroid per corpus vector. This is the INDEX-BUILD half of IVF —
    materialize it once (persist, or at scale write parquet partitioned
    by centroid_id so probe filters become partition pruning) and serve
    every query from it; recomputing per query re-scans the corpus.

    Plan: struct-max argmax (same pattern as ann.assign_tokens) with
    map-side partial aggregation; the grouping key is neighbor_id alone
    — cv rides inside the max struct (never compared: centroid_id
    breaks ties first), not in the hash key. Explicit repartition
    spreads the single-file corpus across cores before the
    |corpus| x |centroids| scoring join."""
    cvecs = centroids.select("centroid_id", F.col("cvec"))
    corpus = embeddings.repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism, F.col("vec_id")
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    return (
        corpus.join(F.broadcast(cvecs))
        .withColumn("ip", dot_product("cv", "cvec"))
        .groupBy("neighbor_id")
        .agg(
            F.max(
                F.struct(
                    F.round(F.col("ip"), 6).alias("r"),
                    (-F.col("centroid_id")).alias("nc"),
                    F.col("cv").alias("cv"),
                )
            ).alias("b")
        )
        .select("neighbor_id", F.col("b.cv").alias("cv"), (-F.col("b.nc")).alias("centroid_id"))
    )


def ivf_knn(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_probe: int | None = None,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """IVF-pruned ANN: corpus vectors are bucketed by nearest centroid;
    each query scans only its n_probe best buckets. Recall < 1 by
    design (approximate). Pass ``bucketed`` (a materialized
    ivf_bucket() result) to make query cost probe-bounded — at 100 TB
    the bucket assignment is a stored partition column and the probe
    join below becomes partition pruning."""
    n_probe = n_probe or params.N_PROBE
    cvecs = centroids.select("centroid_id", F.col("cvec"))
    if bucketed is None:
        bucketed = ivf_bucket(embeddings, centroids)

    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ).withColumn("qn", l2_norm("qv"))
    w_probe = Window.partitionBy("q_id").orderBy(
        F.round(F.col("qip"), 6).desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.join(F.broadcast(cvecs))
        .withColumn("qip", dot_product("qv", "cvec"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("q_id", "qv", "qn", "centroid_id")
    )

    scored = (
        bucketed.withColumn("cn", l2_norm("cv"))
        .join(F.broadcast(probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", _cosine_pre("qv", "cv", "qn", "cn").alias("cos"))
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round(F.col("cos"), params.ROUND).alias("cosine"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame,
    bucketed: DataFrame | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Cluster-scoped SEMANTIC dedup (SemDeDup, Abbas et al. 2023) —
    the one dedup family surface fingerprints cannot see: documents
    that share meaning but no n-grams are invisible to MinHash /
    SimHash / substring windows, yet land in the same embedding-space
    cluster. Returns a corpus-complete verdict per vector:
    (vec_id, centroid_id, c2c, n_dups, keep) — c2c = cosine to the
    assigned centroid, n_dups = within-cluster neighbors above
    ``threshold``, keep = False when any such neighbor wins the
    keeper election. Keep rule is the paper's: the member with the
    LOWEST cosine-to-centroid survives (atypical examples carry more
    training signal); rounded-c2c ties break on smaller vec_id, so
    the verdict is deterministic and oracle-checkable.

    Scale shape — pairs are CLUSTER-SCOPED, never corpus-scoped: the
    candidate join is an equi-join on centroid_id (plan-pinned: no
    cartesian/BNLJ node exists), so fan-out is sum over clusters of
    c_i^2, bounded by (max cluster size) x corpus — never corpus^2.
    Cross-cluster near-duplicates are out of contract (SemDeDup's own
    approximation; k-means puts paraphrases in one cell). The
    per-vector verdict aggregate is dup-proportional and broadcasts
    back onto the corpus frame. At 100 TB: serve off the stored
    bucket table partitioned by centroid_id (the same artifact
    ivf_knn probes), and bound the pair stage by cluster size — pick
    n_centroids ~ n/target_cluster_size at train time and split
    over-cap cells by re-clustering within the cell (SCALE.md §15).

    The reference has no dedup of any kind (SURVEY.md §2.I); this is
    a beyond-parity pipeline operator like the rest of the dedup
    roster."""
    thr = params.SEMANTIC_DUP_COS if threshold is None else float(threshold)
    if bucketed is None:
        bucketed = ivf_bucket(embeddings, centroids)
    cvecs = centroids.select("centroid_id", "cvec")
    m = (
        bucketed.select(
            F.col("neighbor_id").alias("vec_id"), "cv", "centroid_id"
        )
        .join(F.broadcast(cvecs), "centroid_id")
        .withColumn("nrm", l2_norm("cv"))
        .withColumn("cnrm", l2_norm("cvec"))
        .withColumn("c2c", _cosine_pre("cv", "cvec", "nrm", "cnrm"))
        .select("vec_id", "centroid_id", "cv", "nrm", "c2c")
    )
    cols = ("vec_id", "cv", "nrm", "c2c")
    a = m.select("centroid_id", *[F.col(c).alias(f"a_{c}") for c in cols])
    b = m.select("centroid_id", *[F.col(c).alias(f"b_{c}") for c in cols])
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("a_vec_id") < F.col("b_vec_id"))
        .filter(
            F.round(
                _cosine_pre("a_cv", "b_cv", "a_nrm", "b_nrm"), 6
            )
            >= thr
        )
        .select(
            "a_vec_id",
            F.round("a_c2c", 6).alias("a_r"),
            "b_vec_id",
            F.round("b_c2c", 6).alias("b_r"),
        )
    )
    # both directions of each pair -> one dup-proportional aggregate
    # (n_dups + keeper election), no second corpus pass
    edges = pairs.select(
        F.col("a_vec_id").alias("vec_id"),
        F.col("a_r").alias("my_r"),
        F.col("b_vec_id").alias("o_id"),
        F.col("b_r").alias("o_r"),
    ).unionByName(
        pairs.select(
            F.col("b_vec_id").alias("vec_id"),
            F.col("b_r").alias("my_r"),
            F.col("a_vec_id").alias("o_id"),
            F.col("a_r").alias("o_r"),
        )
    )
    dominated = (F.col("o_r") < F.col("my_r")) | (
        (F.col("o_r") == F.col("my_r")) & (F.col("o_id") < F.col("vec_id"))
    )
    per_v = edges.groupBy("vec_id").agg(
        F.count("*").cast("bigint").alias("n_dups"),
        F.max(dominated.cast("int")).alias("dropped"),
    )
    return m.join(F.broadcast(per_v), "vec_id", "left").select(
        "vec_id",
        "centroid_id",
        F.round("c2c", params.ROUND).alias("c2c"),
        F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
        (F.coalesce("dropped", F.lit(0)) == 0).alias("keep"),
    )


def cluster_stats(
    embeddings: DataFrame, centroids: DataFrame, bucketed: DataFrame | None = None
) -> DataFrame:
    """Corpus map: per-IVF-cell statistics over the embedding corpus —
    (centroid_id, n_vecs, avg_norm, min_norm, max_norm). This is the
    cluster-occupancy report every ANN deployment monitors (skewed
    cells mean probe-cost skew; empty cells mean wasted centroids) and
    the embedding-space density summary a training-data pipeline uses
    as a cheap topic histogram.

    ``bucketed``: a materialized ivf_bucket() frame; per-cell stats
    are then ONE doc-partition-friendly aggregate off the stored
    bucket table (at 100 TB: a groupBy on the partition column —
    map-side partial aggregation, minimal shuffle of |centroids|
    partial rows). Norms are per-row deterministic (same left-to-right
    dot fold both engines); only avg's accumulation order differs,
    absorbed by round(.., params.ROUND)."""
    if bucketed is None:
        bucketed = ivf_bucket(embeddings, centroids)
    nrm = F.sqrt(dot_product("cv", "cv"))
    return (
        bucketed.select("centroid_id", nrm.alias("nrm"))
        .groupBy("centroid_id")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.round(F.avg("nrm"), params.ROUND).alias("avg_norm"),
            F.round(F.min("nrm"), params.ROUND).alias("min_norm"),
            F.round(F.max("nrm"), params.ROUND).alias("max_norm"),
        )
    )
