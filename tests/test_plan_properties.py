"""Plan-quality regression tests: the properties that make these
queries scale (predicate pushdown, column pruning, broadcast-only
joins, TakeOrderedAndProject top-k) must survive refactors. A failure
here means a plan silently degraded to a full scan or a sort-merge
shuffle — invisible at sf0.01, catastrophic at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from lintdb_spark.queries import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    """The registry query serves off the cached multi-split fact
    layout (InMemoryTableScan); the PARQUET pushdown/pruning property
    belongs to the raw-table path the operator runs on a real
    cluster — assert both layers."""
    import contextlib as _ctx
    import io as _io

    from lintdb_spark.operators import relational
    from lintdb_spark.tables import load_table

    raw = relational.pricing_summary(load_table(spark, sf_dir, "lineitem"))
    buf = _io.StringIO()
    with _ctx.redirect_stdout(buf):
        raw.explain("formatted")
    p = buf.getvalue()
    assert "LessThanOrEqual(l_shipdate" in p  # filter reached the scan
    # column pruning: untouched wide columns absent from ReadSchema
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "partial" in p.lower() or "HashAggregate" in p  # map-side combine

    pc = plan_of(spark, sf_dir, "q_pricing_summary")
    assert "InMemoryTableScan" in pc  # registry path reads the cache
    assert "HashAggregate" in pc


def test_term_date_range_pushdown(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_term_date")
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_shipdate" in p


def test_top_orders_broadcast_only(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_top_orders")
    assert "SortMergeJoin" not in p  # dims must broadcast
    assert p.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in p  # top-k, not full sort


def test_topk_cascade_no_sortmerge(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_topk")
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_revenue_by_nation_broadcast_only(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q_revenue_by_nation")
    assert "SortMergeJoin" not in p


@pytest.mark.parametrize("name", ["q_maxsim", "q_plaid", "q_assign"])
def test_vector_ops_no_python_udf(spark, sf_dir, name):
    """The oracle-checked vector math must stay JVM-side (no
    BatchEvalPython / ArrowEvalPython nodes = no Python in the plan)."""
    p = plan_of(spark, sf_dir, name)
    assert "EvalPython" not in p


@pytest.mark.parametrize(
    "name",
    ["q_bm25", "q_fingerprints", "q_token_counts", "q_xtr"],
)
def test_round2_ops_no_python_udf(spark, sf_dir, name):
    """Every round-2 operator is declarative: no Python in the plan."""
    p = plan_of(spark, sf_dir, name)
    assert "EvalPython" not in p


def test_embedding_lsh_is_vectorized_map(spark, sf_dir):
    """Sign-LSH bucketing runs as ONE Arrow-batched pandas_udf matmul
    (vectorized ArrowEvalPython is the intended shape; row-at-a-time
    BatchEvalPython never) with no plane crossJoin in the plan."""
    p = plan_of(spark, sf_dir, "q_embedding_neardup_lsh")
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_token_counts_is_narrow_projection(spark, sf_dir):
    """token_counts must run at scan speed — no shuffle (Exchange) at
    all, a single projection over the parquet scan."""
    p = plan_of(spark, sf_dir, "q_token_counts")
    assert "Exchange" not in p


def test_asof_join_is_single_shuffle_window(spark, sf_dir):
    """asof_join must be union + ONE window shuffle — never a join of
    the two streams (no join operator of any kind in the plan)."""
    p = plan_of(spark, sf_dir, "q_asof")
    body = p.split("== Physical Plan ==")[-1]
    # the final zero-fill lookup joins counts back; the asof core itself
    # must contain a Window and no nested-loop join
    assert "Window" in body
    assert "BroadcastNestedLoopJoin" not in body
    assert "CartesianProduct" not in body


def test_range_join_is_bucketed_equi_join(spark, sf_dir):
    """range_join must plan as an EQUI-join on (key, bucket) — the
    nested-loop/cartesian shape a raw inequality join produces is the
    exact thing the bucketing exists to avoid."""
    p = plan_of(spark, sf_dir, "q_range_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_events_rollup_single_pass(spark, sf_dir):
    """ROLLUP must run as one Expand + aggregate pass, not one
    aggregate per grouping level."""
    p = plan_of(spark, sf_dir, "q_events_rollup")
    assert _nodes(p, "Expand") == 1


def test_repetition_is_narrow_projection(spark, sf_dir):
    """repetition_stats is in-row array math — no shuffle, no explode
    (Generate), no Python; pure scan-speed projection."""
    p = plan_of(spark, sf_dir, "q_repetition")
    assert "Exchange" not in p
    assert "Generate" not in p
    assert "EvalPython" not in p


def _nodes(plan: str, kind: str) -> int:
    """Count physical nodes of a kind in explain('formatted') output
    (each node appears once in the tree and once in the detail list —
    count the numbered detail lines only)."""
    import re

    return len(re.findall(rf"^\(\d+\) {kind}", plan, flags=re.M))


def test_fingerprints_no_pre_filter_explode_of_arrays(spark, sf_dir):
    """The fingerprint explode happens AFTER the in-row window+sample
    filter — exactly one Generate node, fed by the projected struct
    array, never the raw token-hash array per window (the 16x
    regression shape)."""
    p = plan_of(spark, sf_dir, "q_fingerprints")
    assert _nodes(p, "Generate") == 1
    assert "Exchange" not in p  # scan -> project -> explode, no shuffle


def test_bm25_joins_stay_sane(spark, sf_dir):
    """Exactly one cross join (the 1-row stats frame); dl is joined by
    key with no broadcast HINT, so Catalyst/AQE stays free to shuffle
    it at scale (forcing broadcast of the corpus-sized dl was the
    reviewed bug). No Python anywhere."""
    p = plan_of(spark, sf_dir, "q_bm25")
    assert _nodes(p, "BroadcastNestedLoopJoin") == 1
    assert "EvalPython" not in p


def test_hash_split_is_pure_map(spark, sf_dir):
    """Split assignment must be a pure map over the scan: no shuffle,
    no broadcast, no Python — one hash + one CASE per row."""
    p = plan_of(spark, sf_dir, "q_hash_split")
    assert _nodes(p, "Exchange") == 0
    assert "BroadcastExchange" not in p
    assert "EvalPython" not in p


def test_stratified_sample_is_pure_map(spark, sf_dir):
    """The rates dim folds into the plan as a literal map: no join of
    any kind, no Exchange, no Python — scan + project + filter only."""
    p = plan_of(spark, sf_dir, "q_stratified_sample")
    assert _nodes(p, "Exchange") == 0
    assert "Join" not in p
    assert "EvalPython" not in p


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The (tiny) eval-shingle set is the broadcast side — the
    corpus-side scan joins map-side, no shuffled join of the corpus."""
    import re

    p = plan_of(spark, sf_dir, "q_decontaminate")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p
    # the corpus branch must stay narrow all the way to the broadcast
    # join: the only shuffles are the eval side's repartition+distinct
    # and the post-join count_distinct pair (whose input is
    # contaminated rows only). A corpus-side repartition or distinct
    # would add exchanges here.
    nodes = re.findall(r"^\(\d+\) (\S+)", p, re.M)
    assert sum(1 for n in nodes if n == "Exchange") <= 4


def _plan_of_df(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_minhash_wide_aggregate_shape(spark, sf_dir):
    """Minhash computes all perms as parallel aggregate columns with an
    in-row posexplode unpivot afterwards — never the old
    explode(sequence(perms)) row blowup before aggregation."""
    p = plan_of(spark, sf_dir, "q_minhash_sig")
    assert "posexplode" in p
    assert "explode(sequence(" not in p
    assert "EvalPython" not in p


def test_jaccard_stop_set_broadcasts(spark, sf_dir):
    """The df-cap stop set joins as a BROADCAST anti-join — a pure map
    over the shingle stream, never a shuffled exclusion of the corpus."""
    from lintdb_spark.operators import dedup
    from lintdb_spark.tables import load_table

    p = _plan_of_df(
        dedup.jaccard_pairs(
            dedup.doc_shingles(load_table(spark, sf_dir, "documents"))
        )
    )
    assert "BroadcastHashJoin LeftAnti" in p


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """orders |x| lineitem co-bucketed on orderkey must join with NO
    Exchange on either side — the bucketed layout IS the shuffle,
    paid once at write time. This is the 100 TB claim in
    relational.top_orders' docstring, made checkable."""
    from pyspark.sql import functions as F

    from lintdb_spark.operators.relational import write_bucketed
    from lintdb_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(o, "t_orders_b", "o_orderkey", 4, path=str(tmp_path / "o"))
    write_bucketed(li, "t_lineitem_b", "l_orderkey", 4, path=str(tmp_path / "li"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the test exercises the sort-merge path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        p = buf.getvalue()
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # bucket layout satisfies distribution
        assert "SelectedBucketsCount" in p
        # and the join is still correct
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_quality_filter_is_narrow_projection(spark, sf_dir):
    """The Gopher-rule verdict is pure column math — no shuffle, no
    Python, no explode; scan-speed on any corpus."""
    p = plan_of(spark, sf_dir, "q_quality_filter")
    assert "Exchange" not in p
    assert "EvalPython" not in p
    assert "Generate" not in p


def test_pii_scrub_is_narrow_projection(spark, sf_dir):
    """PII scan + redaction is pure JVM column math (regexp_count /
    regexp_replace inside whole-stage codegen) — no shuffle, no
    Python, no explode; scan-speed on any corpus."""
    p = plan_of(spark, sf_dir, "q_pii_scrub")
    assert "Exchange" not in p
    assert "EvalPython" not in p
    assert "Generate" not in p
    assert "codegen id" in p  # the projection compiles into codegen


def test_domain_mix_no_corpus_shuffle(spark, sf_dir):
    """domain_mix shuffles only the per-source aggregate (a handful of
    rows), never corpus rows: exactly one pre-aggregate exchange plus
    the single-partition window over it; no Python."""
    p = plan_of(spark, sf_dir, "q_domain_mix")
    assert "EvalPython" not in p
    assert _nodes(p, "Exchange") <= 2  # partial-agg exchange + window
    assert "HashAggregate" in p  # map-side partial aggregation


def test_dedup_keep_serves_from_cache(spark, sf_dir):
    """Survivorship is a filter+projection off the session-cached
    cluster map — no join, no aggregate, no Python in the serve plan."""
    p = plan_of(spark, sf_dir, "q_dedup_keep")
    assert "InMemoryTableScan" in p
    assert "Join" not in p
    assert "EvalPython" not in p


def test_unigram_loglik_serves_from_cached_tokens(spark, sf_dir):
    """The LM score reads the session-cached token table (no
    re-tokenization Generate over parquet), keeps the scalar total on
    a broadcast, and stays JVM-side."""
    p = plan_of(spark, sf_dir, "q_unigram_loglik")
    assert "InMemoryTableScan" in p
    assert "EvalPython" not in p
    assert "BroadcastNestedLoopJoin" in p  # single-row total rides broadcast
    assert "CartesianProduct" not in p


def test_tfidf_keywords_broadcast_count_and_single_rank_window(spark, sf_dir):
    """TF-IDF ranking: corpus count broadcast (never a cross join),
    exactly one ranking window, no Python."""
    p = plan_of(spark, sf_dir, "q_tfidf_keywords")
    assert "InMemoryTableScan" in p
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    # exactly one ranking Window (WindowGroupLimit pre-prune nodes are
    # the rank<=k pushdown — desirable, not extra windows)
    assert _nodes(p, r"Window\b") == 1


def test_fuzzy_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """Fuzzy decontamination mirrors the exact path's shape: eval
    buckets broadcast, corpus side scan+filter+aggregate only — the
    corpus never shuffles through the join."""
    p = plan_of(spark, sf_dir, "q_decontaminate_fuzzy")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p


def test_embedding_clusters_single_aggregate_off_bucket_table(spark, sf_dir):
    """The corpus map is ONE aggregate off the cached bucket table:
    no join in the SERVE plan (the assignment join lives in the cached
    build, printed under InMemoryRelation — slice it off), map-side
    partials, no Python."""
    p = plan_of(spark, sf_dir, "q_embedding_clusters")
    assert "InMemoryTableScan" in p
    serve = p.split("InMemoryRelation")[0]  # tree above the cache boundary
    assert "Join" not in serve
    assert "HashAggregate" in serve
    assert "EvalPython" not in serve


def test_pack_plan_single_shuffle_window(spark, sf_dir):
    """Sequence packing is one window per shard: a single exchange on
    the shard key, one Window node, pure integer arithmetic (no
    Python, no join)."""
    p = plan_of(spark, sf_dir, "q_pack_plan")
    assert _nodes(p, "Exchange") == 1
    assert _nodes(p, "Window") == 1
    assert "Join" not in p
    assert "EvalPython" not in p


def test_doc_chunks_is_narrow_projection(spark, sf_dir):
    """Chunking is in-row slicing + one posexplode: no shuffle, no
    Python, no join — parquet-scan speed at any corpus size."""
    p = plan_of(spark, sf_dir, "q_doc_chunks")
    assert "Exchange" not in p
    assert "EvalPython" not in p
    assert "Join" not in p


def test_media_frames_plan_has_no_python(spark, sf_dir):
    """q_media_frames serves from the declarative frame plan: no
    mapInPandas / Python in the plan — the metadata fan-out must not
    pay per-frame decode."""
    p = plan_of(spark, sf_dir, "q_media_frames")
    assert "EvalPython" not in p
    assert "MapInPandas" not in p


def test_len_histogram_is_single_aggregate(spark, sf_dir):
    """The length histogram is one pure-map projection + one bounded
    aggregate (<=63 buckets): no join, no Python, exactly one
    exchange for the final bucket aggregate."""
    p = plan_of(spark, sf_dir, "q_len_histogram")
    assert "Join" not in p
    assert "EvalPython" not in p
    assert _nodes(p, "Exchange") == 1


def test_events_props_json_stays_jvm_side(spark, sf_dir):
    """JSON props extraction runs JVM-side (get_json_object): no
    Python in the plan, one aggregate exchange on event_type."""
    p = plan_of(spark, sf_dir, "q_events_props")
    assert "EvalPython" not in p
    assert "Join" not in p
    assert _nodes(p, "Exchange") <= 2  # agg exchange (+ cached layout)


def test_jaccard_verified_has_no_shingle_self_join(spark, sf_dir):
    """The LSH-verified jaccard path must never contain the
    inverted-index shingle self-join (the sum(df^2) shape): its joins
    are candidate-bounded (band-bucket collisions) and doc-keyed. A
    SortMergeJoin or shuffle on `shingle` ALONE would mean the
    exhaustive join leaked back in."""
    p = plan_of(spark, sf_dir, "q_jaccard_verified")
    assert "EvalPython" not in p
    # shingle-alone keys are fine for the stop-list ANTI join and the
    # df aggregate; the quadratic signature is specifically an INNER
    # join whose sole key is the shingle (two doc streams fanning out
    # df^2 rows per shingle)
    bad = [
        blk
        for blk in p.split("\n\n")
        if "keys [1]: [shingle#" in blk and "Join type: Inner" in blk
    ]
    assert not bad, bad[:1]


@pytest.mark.slow
# Slow lane (round 16 suite budget): a perf-SHAPE pin; the covered
# inverted-sliver road itself is oracle-checked in-lane by
# q_artifact_covered (driver window this round).
def test_covered_drift_lookup_pushes_spart_filter(spark, sf_dir):
    """Round 12: the flip-commit lookup's inverted road must push the
    crossing sparts into the shingle_docs scan — partition pruning on
    fine (hive spart=) segments, row-group min/max skipping on the
    coarse slivers (which sort by (spart, shingle) precisely for
    this). A regression to a post-scan filter re-reads the whole
    inverted table per drift commit."""
    import contextlib
    import io

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from lintdb_spark.queries import artifact_covered_store_cached

    st = artifact_covered_store_cached(spark, sf_dir)
    crossing = F.broadcast(
        spark.createDataFrame(
            [("lambda mu nu", -1)],
            T.StructType(
                [
                    T.StructField("shingle", T.StringType()),
                    T.StructField("delta", T.IntegerType()),
                ]
            ),
        )
    )
    sparts = [
        r["spart"]
        for r in spark.createDataFrame([("lambda mu nu",)], "shingle string")
        .select(st._spart_col(F.col("shingle")).alias("spart"))
        .collect()
    ]
    # force the INVERTED road: this test pins its plan shape, and on a
    # 24-doc store the r13 byte router correctly prefers flat (one
    # matched spart is a large byte fraction of a tiny table)
    st._road_override = "inverted"
    try:
        df = st._crossing_doc_rows(0, crossing, None, sparts)
    finally:
        st._road_override = None
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the spart predicate reaches the parquet source (pushed or
    # partition filter), not only a post-scan Filter node
    assert "spart" in plan
    pushed = [
        ln
        for ln in plan.splitlines()
        if ("PushedFilters" in ln or "PartitionFilters" in ln)
        and "spart" in ln
    ]
    assert pushed, plan
    # and no row-at-a-time python UDF anywhere in the lookup
    assert "BatchEvalPython" not in plan


def test_substring_dedup_plan_has_no_self_join(spark, sf_dir):
    """Substring dedup's scale contract (VERDICT r13 #1): duplicated
    windows come from ONE fp-count aggregate plus a LEFT-SEMI join of
    the posting table against that small set — never an inverted-index
    SELF-join of postings with postings (whose fan-out is sum(df^2)).
    The span merge is a doc_id window over only the duplicated rows,
    and the final groupBy reuses its partitioning. So the whole plan
    carries exactly one join, and it is the semi-join; Python never
    appears."""
    import re as _re

    p = plan_of(spark, sf_dir, "q_substring_dedup")
    # tree section lines only ('+- SomeJoin LeftSemi ... (id)'): the
    # formatted detail section repeats each node, so count there once
    joins = [
        l for l in p.splitlines()
        if _re.search(r"\)\s*$", l) and "Join" in l and "Reused" not in l
    ]
    assert len(joins) == 1, joins
    assert "LeftSemi" in joins[0]
    assert "Window" in p  # gaps-and-islands, not a pairwise compare
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # one partial+final aggregate pair for the fp count, one for the
    # span merge — no third aggregation (no distinct over a pair
    # blowup); tree-section nodes only, the detail section repeats them
    aggs = [
        l for l in p.splitlines()
        if _re.search(r"\)\s*$", l)
        and ("HashAggregate" in l or "SortAggregate" in l)
    ]
    assert len(aggs) <= 4, aggs


def test_substring_scrub_plan_stays_jvm_side(spark, sf_dir):
    """The scrub's interval cut stays JVM-side with no pairwise
    blowup: no Python nodes, no cartesian product, and the word x
    interval arithmetic is an in-row lambda, not a join."""
    p = plan_of(spark, sf_dir, "q_substring_scrub")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_substring_scrub_cut_is_in_row(spark, sf_dir):
    """VERDICT r14 #1: the scrub cut must be span-proportional
    machinery only — the r14 shape shuffled corpus-WORD rows through
    four wide stages (posexplode -> interval join -> distinct ->
    anti-join -> collect_list). The in-row shape has NO explode at
    all (zero Generate nodes — the span artifact serves from cache),
    exactly ONE join (documents LEFT-joined to the per-doc interval
    arrays; the only exchange that may carry corpus rows, whole docs
    not words), no anti-join, and no Exchange whose rows carry the
    tokenized word array (the cut happens inside the row AFTER the
    join). Planned over a MATERIALIZED span table (tmp parquet) so the
    assertion scopes the scrub stage alone — the registry query's
    cached span artifact would print its own build (explode +
    semi-join) inside the InMemoryRelation fragment."""
    import contextlib
    import io
    import re as _re
    import tempfile

    from lintdb_spark.operators import dedup
    from lintdb_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        sp = tmp + "/spans"
        dedup.substring_spans(dedup.substring_window_postings(docs)).write.parquet(sp)
        df = dedup.substring_scrub(docs, spark.read.parquet(sp))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
    assert "Generate" not in p, "word/posting explode reappeared"
    joins = [
        l for l in p.splitlines()
        if _re.search(r"\)\s*$", l) and "Join" in l and "Reused" not in l
    ]
    assert len(joins) == 1, joins
    assert "LeftAnti" not in p
    # the word array (split(text)) must never cross an Exchange: walk
    # each Exchange node's detail block and assert its Input columns
    # are span/cut/interval-side only (no array<string> w column).
    blocks = _re.split(r"\n\(\d+\) ", p)
    for b in blocks:
        head = b.split("\n", 1)[0]
        if not head.startswith("Exchange") and not head.startswith(
            "BroadcastExchange"
        ):
            continue
        m = _re.search(r"Input \[\d+\]: \[([^\]]*)\]", b)
        if m:
            assert not _re.search(r"\bw#\d+", m.group(1)), b.splitlines()[:3]


def test_semantic_dedup_pairs_are_cluster_scoped(spark, sf_dir):
    """VERDICT r14 #2: semantic dedup's candidate stage must be
    bounded per cluster — the pair join is an EQUI-join on
    centroid_id (hash/sort-merge), so fan-out is sum(c_i^2) over
    clusters, never corpus^2. A cartesian or broadcast-nested-loop
    node would mean the cluster key fell out of the join condition
    (cross-cluster fan-out); Python never appears. Planned over a
    MATERIALIZED bucket table (tmp parquet — the 100 TB serve shape)
    so the assertion scopes the semantic stage alone: the cached
    bucket ARTIFACT's build legitimately contains the
    corpus x broadcast-centroids scoring join (a BNLJ by design),
    which would otherwise appear inside the InMemoryRelation
    fragment."""
    import contextlib
    import io
    import tempfile

    from lintdb_spark import model
    from lintdb_spark.operators import knn
    from lintdb_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = model.centroids(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        bp = tmp + "/buckets"
        knn.ivf_bucket(emb, cents).write.parquet(bp)
        df = knn.semantic_dedup(
            emb, cents, bucketed=spark.read.parquet(bp)
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the pair stage's equi-join keys on centroid_id: every non-
    # broadcast join in the plan must list centroid_id among its keys
    # (the final verdict join on vec_id rides the broadcast side)
    import re as _re

    blocks = _re.split(r"\n\(\d+\) ", p)
    for b in blocks:
        head = b.split("\n", 1)[0]
        if "Join" in head and "Broadcast" not in head and "Reused" not in head:
            keys = _re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", b)
            if keys:
                assert "centroid_id" in keys.group(1), b.splitlines()[:4]


def test_substring_decontam_single_semi_join_no_python(spark, sf_dir):
    """Decontamination's only join is the training-postings semi-join
    against the (tiny, broadcastable) eval fingerprint set — same
    no-pairwise contract as substring dedup, no Python anywhere."""
    import re as _re

    p = plan_of(spark, sf_dir, "q_substring_decontam")
    joins = [
        l for l in p.splitlines()
        if _re.search(r"\)\s*$", l) and "Join" in l and "Reused" not in l
    ]
    assert len(joins) == 1, joins
    assert "LeftSemi" in joins[0]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
