"""Late-interaction scoring: PLAID stage-1 and exact MaxSim stage-2,
plus the two-phase cascade.

Reference math being matched (SURVEY.md §2.D):
- colbert_centroid_score (lintdb/scoring/plaid.cpp:65-95): per query
  token take the max centroid score over the doc's *distinct* codes,
  sum over query tokens — a codes-only approximation of MaxSim.
- score_document_by_residuals (plaid.cpp:119-185): exact MaxSim =
  sum over query tokens of max over doc tokens of dot(q, d).
- QueryExecutor two-phase cascade (lintdb/query/QueryExecutor.cpp:14-71):
  stage-1 score all candidates, keep top num_second_pass, stage-2
  exact-rerank, keep top k.

Spark shape: both stages are groupBy max->sum aggregations; the
reference's OMP-parallel scoring loop becomes shuffle-partitioned
aggregation, and its std::sort + truncate becomes
``orderBy().limit()`` which Spark executes as TakeOrderedAndProject
(no full sort at scale). The q_tokens side is a handful of rows and is
always broadcast — so the big side (candidate tokens/codes) shuffles
exactly once per stage, on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lintdb_spark import params
from lintdb_spark.cache import tag_cached
from lintdb_spark.functions.vector import dot_product


def plaid_scores(token_assign: DataFrame, query_tokens: DataFrame, centroids: DataFrame) -> DataFrame:
    """Stage-1 codes-only score per doc (plaid.cpp:65-95).

    score(doc) = sum_q max_{c in distinct codes(doc)} <q, centroid_c>
    Returns (doc_id, score). Scores are NOT rounded here — callers
    round at the output boundary.

    No distinct on (doc_id, centroid_id): max is idempotent under
    duplicates, so the max-per-(doc, q) aggregate below yields the
    distinct-codes semantics without paying a dedup shuffle of the
    assignment frame first (one exchange + one AQE job saved per
    cascade query).
    """
    doc_codes = token_assign.select("doc_id", "centroid_id")
    qc = (
        query_tokens.join(F.broadcast(centroids))
        .select("q_id", "centroid_id", dot_product("qvec", "cvec").alias("qc_score"))
    )
    return (
        doc_codes.join(F.broadcast(qc), "centroid_id")
        .groupBy("doc_id", "q_id")
        .agg(F.max("qc_score").alias("best"))
        .groupBy("doc_id")
        .agg(F.sum("best").alias("score"))
    )


def maxsim_scores(doc_tokens: DataFrame, query_tokens: DataFrame) -> DataFrame:
    """Exact MaxSim per doc over raw token vectors (plaid.cpp:119-185,
    minus the residual decompression — quantizer round-trips live in
    lintdb_spark.index.quantizers). Returns (doc_id, score)."""
    return (
        doc_tokens.join(F.broadcast(query_tokens))
        .select("doc_id", "q_id", dot_product("vec", "qvec").alias("ip"))
        .groupBy("doc_id", "q_id")
        .agg(F.max("ip").alias("best"))
        .groupBy("doc_id")
        .agg(F.sum("best").alias("score"))
    )


def two_phase_topk(
    doc_tokens: DataFrame,
    token_assign: DataFrame,
    query_tokens: DataFrame,
    centroids: DataFrame,
    probes,
    k: int | None = None,
    num_second_pass: int | None = None,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Full reference cascade (QueryExecutor.cpp:14-71): candidates from
    probed posting lists -> stage-1 PLAID over the candidates' full
    code sets -> top num_second_pass -> stage-2 exact MaxSim -> top k.

    ``doc_filter`` (a doc_id DataFrame) reproduces the reference's
    *approximate* AND-with-VECTOR semantics (tests/index_test.cpp:197-321;
    SURVEY.md §2.C note 2): the term predicate restricts the candidate
    set generated from probed lists — it does not re-run exact search
    over the full filtered corpus.

    ``probes`` is a (centroid_id, ...) DataFrame or a driver-side list
    of centroid ids (see ann.candidates — the list form is the
    partition-pruning shape).

    Deterministic: ordering on rounded score with doc_id tie-break at
    both cuts. Returns (doc_id, score) with score rounded for
    cross-engine comparison.
    """
    from lintdb_spark.operators import ann as _ann

    k = k or params.K
    num_second_pass = num_second_pass or params.NUM_SECOND_PASS

    # the assignment subtree feeds candidate generation AND stage-1
    # codes; without persisting, Catalyst plans it twice (no
    # ReusedExchange across the broadcast boundary) — measured 20
    # parquet scans for one cascade at sf0.1. If the caller already
    # cached it, it owns the entry (don't re-persist or release it).
    lvl = token_assign.storageLevel
    owns_ta = not (lvl.useMemory or lvl.useDisk)
    if owns_ta:
        token_assign = token_assign.persist()

    # non-distinct candidates: the broadcast left-semi join below
    # dedups in its hash-set build, so the distinct shuffle is waste
    cand = _ann.candidates(token_assign, probes, distinct=False)
    if doc_filter is not None:
        cand = cand.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    cand_assign = token_assign.join(F.broadcast(cand), "doc_id", "left_semi")
    stage1 = plaid_scores(cand_assign, query_tokens, centroids)
    survivors = (
        stage1.orderBy(F.round(F.col("score"), 6).desc(), F.col("doc_id").asc())
        .limit(num_second_pass)
        .select("doc_id")
    )
    stage2 = maxsim_scores(doc_tokens.join(F.broadcast(survivors), "doc_id"), query_tokens)
    out = (
        stage2.orderBy(F.round(F.col("score"), 6).desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.round(F.col("score"), params.ROUND).alias("score"))
    )
    return tag_cached(out, token_assign) if owns_ta else out


def batch_two_phase_topk(
    doc_tokens: DataFrame,
    token_assign: DataFrame,
    queries_df: DataFrame,
    centroids: DataFrame,
    k: int | None = None,
    num_second_pass: int | None = None,
    n_probe: int | None = None,
    k_top: int | None = None,
) -> DataFrame:
    """Batch form of the cascade — N queries through ONE lazy plan.

    ``queries_df``: (qid, q_id, qvec) — one row per query token.
    Returns (qid, doc_id, rank, score).

    This is where Spark beats the reference's one-query-at-a-time
    embedded engine: probe selection, candidate generation, and both
    scoring stages are shared joins/aggregations keyed by qid, so 1000
    queries cost one pass over the postings instead of 1000 point
    lookups. All per-query top-k cuts are windows over qid. The
    centroid/query side stays broadcast; the postings side shuffles
    once per stage on (qid, doc_id).
    """
    from pyspark.sql import Window

    k = k or params.K
    num_second_pass = num_second_pass or params.NUM_SECOND_PASS
    n_probe = n_probe or params.N_PROBE
    k_top = k_top or params.K_TOP_CENTROIDS

    # shared by candidates and stage-1 codes — persist unless the
    # caller already cached it (see two_phase_topk)
    lvl = token_assign.storageLevel
    owns_ta = not (lvl.useMemory or lvl.useDisk)
    if owns_ta:
        token_assign = token_assign.persist()

    # per-(query, centroid) score matrix — small, broadcast everywhere
    qc = (
        queries_df.join(F.broadcast(centroids))
        .select("qid", "q_id", "centroid_id", dot_product("qvec", "cvec").alias("qc_score"))
    )

    # probes (KnnNearestCentroids.cpp:38-110): each token nominates its
    # top k_top centroids; only nominated scores rank; <=0 dropped; top
    # n_probe per query survive. Stage-1 scoring below still uses the
    # FULL qc matrix — the k_top mask governs probe selection only.
    w_tok = Window.partitionBy("qid", "q_id").orderBy(
        F.round(F.col("qc_score"), 6).desc(), F.col("centroid_id").asc()
    )
    nominated = (
        qc.withColumn("kt", F.row_number().over(w_tok))
        .filter(F.col("kt") <= k_top)
    )
    w_probe = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("centroid_id").asc()
    )
    probes = (
        nominated.groupBy("qid", "centroid_id")
        .agg(F.max("qc_score").alias("score"))
        .filter(F.col("score") > 0)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("qid", "centroid_id")
    )

    # candidates per query from probed lists
    cand = (
        token_assign.join(F.broadcast(probes), "centroid_id")
        .select("qid", "doc_id")
        .distinct()
    )

    # stage-1 PLAID on candidates' full code sets
    doc_codes = token_assign.select("doc_id", "centroid_id").distinct()
    stage1 = (
        cand.join(doc_codes, "doc_id")
        .join(F.broadcast(qc), ["qid", "centroid_id"])
        .groupBy("qid", "doc_id", "q_id")
        .agg(F.max("qc_score").alias("best"))
        .groupBy("qid", "doc_id")
        .agg(F.sum("best").alias("score"))
    )
    w_cut = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    survivors = (
        stage1.withColumn("rn", F.row_number().over(w_cut))
        .filter(F.col("rn") <= num_second_pass)
        .select("qid", "doc_id")
    )

    # stage-2 exact MaxSim rerank
    stage2 = (
        survivors.join(doc_tokens, "doc_id")
        .join(F.broadcast(queries_df), "qid")
        .select("qid", "doc_id", "q_id", dot_product("vec", "qvec").alias("ip"))
        .groupBy("qid", "doc_id", "q_id")
        .agg(F.max("ip").alias("best"))
        .groupBy("qid", "doc_id")
        .agg(F.sum("best").alias("score"))
    )
    out = (
        stage2.withColumn("rank", F.row_number().over(w_cut))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "doc_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round(F.col("score"), params.ROUND).alias("score"),
        )
    )
    return tag_cached(out, token_assign) if owns_ta else out


def xtr_topk(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int | None = None,
    nearest_tokens_to_fetch: int | None = None,
) -> DataFrame:
    """XTR scoring (Lee et al. 2023, "Rethinking the Role of Token
    Retrieval in Multi-Vector Retrieval"). The reference DECLARES this
    path but never implements it — `SearchOptions.h:34-35` ships the
    `nearest_tokens_to_fetch` knob and `scoring/Scorer.h:59` a
    commented-out XTRScorer — so this is the working version of its
    dead enum, beyond-parity.

    Semantics: per query token, retrieve the global top
    ``nearest_tokens_to_fetch`` doc tokens by similarity; a candidate
    doc's per-query-token score is the max sim among ITS retrieved
    tokens, and query tokens with no retrieved token from that doc are
    imputed with that token's lowest retrieved similarity (the paper's
    missing-similarity bound); doc score = sum over query tokens.
    Unlike MaxSim, scoring touches only retrieved tokens — no forward
    lookup of full documents.

    Scale shape: the per-q-token global top-k' is a
    TakeOrderedAndProject per query token (the corpus side never
    sorts globally); candidates are bounded by k' x |q_tokens| docs
    regardless of corpus size, and at 100 TB the exact top-k' retrieval
    is served by the IVF probe path (`Index._top_centroids` ->
    postings) instead of the dense cross join used in this
    oracle-checkable twin.
    """
    from pyspark.sql import Window

    k = k or params.K
    kp = nearest_tokens_to_fetch or params.XTR_NEAREST_TOKENS
    sims = doc_tokens.join(F.broadcast(query_tokens)).select(
        "doc_id", "token_idx", "q_id", dot_product("vec", "qvec").alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.round(F.col("sim"), 6).desc(), F.col("doc_id").asc(), F.col("token_idx").asc()
    )
    retr = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= kp)
        .persist()  # feeds bounds, per-doc max, and the candidate set
    )
    bounds = retr.groupBy("q_id").agg(F.min("sim").alias("m"))
    per_doc_q = retr.groupBy("doc_id", "q_id").agg(F.max("sim").alias("best"))
    cand = retr.select("doc_id").distinct()
    out = (
        cand.crossJoin(F.broadcast(bounds))
        .join(per_doc_q, ["doc_id", "q_id"], "left")
        .select("doc_id", F.coalesce("best", "m").alias("s"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), params.ROUND).alias("score"))
        .orderBy(F.round(F.col("score"), 6).desc(), F.col("doc_id").asc())
        .limit(k)
    )
    return tag_cached(out, retr)


def batch_xtr_topk(
    cand_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int | None = None,
    nearest_tokens_to_fetch: int | None = None,
) -> DataFrame:
    """Batched XTR: ``xtr_topk`` with qid joined into every key — N
    queries' token retrieval, imputation, and top-k run as ONE plan.

    ``cand_tokens`` is (qid, doc_id, token_idx, vec) — each query's
    retrieval pool, already restricted per qid (the caller decodes a
    doc's tokens ONCE and fans them out to the qids probing it);
    ``query_tokens`` is (qid, q_id, qvec). Returns (qid, doc_id, rank,
    score), the same contract as the batched PLAID cascade.

    Scale shape: identical to xtr_topk per qid — the per-(qid,q_token)
    top-k' window bounds candidates at k' x |q_tokens| per query;
    the only batch-wide structures are the broadcast query matrix and
    one persisted retrieval set of |qids| x |q_tokens| x k' rows.
    """
    from pyspark.sql import Window

    k = k or params.K
    kp = nearest_tokens_to_fetch or params.XTR_NEAREST_TOKENS
    sims = cand_tokens.join(F.broadcast(query_tokens), "qid").select(
        "qid", "doc_id", "token_idx", "q_id", dot_product("vec", "qvec").alias("sim")
    )
    w = Window.partitionBy("qid", "q_id").orderBy(
        F.round(F.col("sim"), 6).desc(), F.col("doc_id").asc(), F.col("token_idx").asc()
    )
    retr = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= kp)
        .persist()
    )
    bounds = retr.groupBy("qid", "q_id").agg(F.min("sim").alias("m"))
    per_doc_q = retr.groupBy("qid", "doc_id", "q_id").agg(F.max("sim").alias("best"))
    cand = retr.select("qid", "doc_id").distinct()
    scored = (
        cand.join(F.broadcast(bounds), "qid")
        .join(per_doc_q, ["qid", "doc_id", "q_id"], "left")
        .select("qid", "doc_id", F.coalesce("best", "m").alias("s"))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum("s"), params.ROUND).alias("score"))
    )
    w_rank = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "rank", "score")
    )
    return tag_cached(out, retr)
