"""Deduplication operators for large-scale training-data pipelines.

These go beyond the reference's operator set (LintDB has no dedup;
SURVEY.md §2.I) — they are the data-pipeline extensions a 100 TB corpus
engine needs. All are shuffle-conscious:

- exact dedup: one hash-aggregate, the minimal possible plan.
- minhash: shingle explode -> per-(doc, perm) min — map-side partial
  aggregation keeps the shuffle at |docs| x |perms| rows regardless of
  document length.
- LSH banding: signatures -> band hash -> bucket join; candidate pairs
  are generated per-bucket, never all-pairs.
- jaccard: inverted-index self-join on shingle (each shingle's posting
  list is bounded by its document frequency, so the join fans out as
  sum(df^2), not |docs|^2).
- simhash: 32-bit fingerprint via per-bit majority vote, all in one
  explode + two aggregations.
- embedding near-dup: all-pairs cosine at test scale; the scale path is
  LSH-bucketed (lintdb_spark.operators.knn).

Everything is JVM-expression-only and oracle-checkable (md5-based
hashing matches DuckDB bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lintdb_spark import params
from lintdb_spark.cache import tag_cached
from lintdb_spark.functions.text import hash32, hash60, word_trigrams, words
from lintdb_spark.functions.vector import dot_product


def exact_dup_groups(documents: DataFrame) -> DataFrame:
    """Content-hash groups: (text_hash, n_docs, keep_doc_id). Exact
    dedup keeps min(doc_id) per group — one hash aggregate."""
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def doc_shingles(documents: DataFrame) -> DataFrame:
    """Distinct (doc_id, shingle) where shingle = word trigram.

    Perf: tokenize ONCE into a materialized array column before the
    trigram transform — referencing `split(text)` inside the lambda
    would re-split the full text per element (O(len^2)). The
    repartition spreads the explode across cores: the source tables
    are single-file parquet (one input split), and without it every
    downstream text operator runs in one task."""
    w = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
    ).select("doc_id", words("text").alias("w"))
    return w.select(
        "doc_id", F.explode(word_trigrams(F.col("w"))).alias("shingle")
    ).distinct()


def minhash_wide(shingles: DataFrame, num_perms: int | None = None) -> DataFrame:
    """(doc_id, m0..m{p-1}) — one row per doc, column m_p = min over
    the doc's shingles of permutation p's universal hash.

    Perf: each shingle is md5-hashed ONCE to a 31-bit base value; the
    permutations are universal hashes (a_i*h+b_i mod p) — pure integer
    arithmetic, so the cost is |shingles| md5s + |shingles|*|perms|
    multiplies instead of |shingles|*|perms| md5s (16x fewer digest
    computations at the default 16 perms). The |perms| mins are
    computed as PARALLEL AGGREGATE COLUMNS over the shingle stream —
    no |shingles| x |perms| row explode ever materializes; the shuffle
    carries |docs| wide rows instead of |docs| x |perms|.

    This wide frame is the STORED signature artifact of a dedup
    pipeline (one row per doc, recomputed per corpus snapshot): both
    the (doc_id, perm, minhash) contract and LSH banding are pure
    in-row projections of it — see minhash_signatures / lsh_buckets_wide."""
    num_perms = num_perms or params.MINHASH_PERMS
    from lintdb_spark.functions.text import (
        MINHASH_A_MULT,
        MINHASH_B_MULT,
        MINHASH_PRIME,
        base_hash31,
    )

    based = shingles.select("doc_id", base_hash31(F.col("shingle")).alias("h31"))
    # permutation constants folded in PYTHON (exact int math, the same
    # values Catalyst's constant folding produced from the perm_hash
    # expression tree) and each aggregate parsed as ONE SQL string:
    # the per-Column construction of num_perms perm_hash trees cost
    # ~2,000 py4j round trips per call on the artifact-update hot
    # path (round-15 profile) — one F.expr parse per permutation is
    # ~16. Identical plan after folding, identical values
    # (parity-pinned by test_pipeline_ops and the minhash oracles).
    aggs = []
    for p in range(num_perms):
        a = (MINHASH_A_MULT * (p + 1)) % MINHASH_PRIME
        b = (MINHASH_B_MULT * (p + 1)) % MINHASH_PRIME
        aggs.append(
            F.expr(
                f"min(({a}L * cast(h31 as bigint) + {b}L) % "
                f"{MINHASH_PRIME}L) as m{p}"
            )
        )
    return based.groupBy("doc_id").agg(*aggs)


def signatures_from_wide(wide: DataFrame, num_perms: int | None = None) -> DataFrame:
    """Unpivot a minhash_wide frame to the (doc_id, perm, minhash)
    contract — one in-row posexplode, no shuffle."""
    num_perms = num_perms or params.MINHASH_PERMS
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"m{p}") for p in range(num_perms)])).alias(
            "perm", "minhash"
        ),
    ).select("doc_id", F.col("perm").cast("bigint").alias("perm"), "minhash")


def inrow_minhash(text_col, num_perms: int | None = None):
    """MinHash signature as a pure IN-ROW column expression (array of
    num_perms minhashes) — no explode, no aggregate, no shuffle: the
    trigram array is hashed to 31-bit base values once, then each
    permutation is an array_min over a cheap integer transform.
    Identical values to minhash_wide's aggregate (min is duplicate-
    insensitive, so the explode+distinct path and this in-row path
    agree exactly; parity-tested in test_pipeline_ops).

    This is the form a STREAMING gate needs — signatures computed at
    scan speed on rows as they land, no stateful aggregation — and
    works anywhere a per-row signature column is wanted."""
    from lintdb_spark.functions.text import base_hash31, perm_hash

    num_perms = num_perms or params.MINHASH_PERMS
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    h31 = F.transform(word_trigrams(words(c)), base_hash31)

    # factory, NOT `lambda v, p=p`: pyspark counts lambda parameters,
    # and a two-parameter lambda is called as (element, index) — the
    # default arg would silently become the index column
    def perm_min(h, p: int):
        return F.array_min(
            F.transform(h, lambda v: perm_hash(F.lit(p).cast("bigint"), v))
        )

    # LET-BINDING via a 1-element-array transform: referencing `h31`
    # in all num_perms mins would paste the whole tokenize + regexp +
    # trigram + hash subtree 16x into the expression tree. Codegen'd
    # plans mostly absorb that through subexpression elimination, but
    # stateful STREAMING plans evaluate projections interpreted — the
    # round-7 streaming probe measured the 16x-duplicated form ~70x
    # slower per row (jstack: all tasks inside interpreted
    # RegExpReplace). transform evaluates its input array ONCE and the
    # lambda variable is a true binding, so the heavy subtree runs
    # once per row on every execution path.
    return F.element_at(
        F.transform(
            F.array(h31),
            lambda h: F.array(*[perm_min(h, p) for p in range(num_perms)]),
        ),
        1,
    )


def signature_digest(text_col, num_perms: int | None = None):
    """md5 digest of the full in-row minhash signature — equal digests
    mean all num_perms minhashes agree, i.e. the two documents'
    shingle sets are (near-)identical after analysis. The key the
    streaming near-dup gate dedups on."""
    return F.md5(F.array_join(inrow_minhash(text_col, num_perms), ","))


def signature_digest_arrow(text_col, num_perms: int | None = None):
    """Arrow-batched twin of ``signature_digest`` over RAW text
    (analysis included) — the HOT-PATH form. Spark never compiles
    higher-order lambdas (ArrayTransform always runs interpreted
    eval), and the pure-expression signature measured ~10 ms/doc at
    the round-7 streaming probe — ~100 docs/s/core is not an ingest
    gate. This twin runs the identical pipeline (analyze_standard_py
    tokens -> word trigrams -> md5-derived 31-bit base hashes -> 16
    universal-hash mins -> md5 digest) in numpy/hashlib per Arrow
    batch; hashlib md5 and JVM md5 agree byte-for-byte, so digests
    are value-identical to the expression form (parity-tested). The
    expression form remains the oracle-parity reference for the
    aggregate minhash family."""
    import hashlib

    from lintdb_spark.functions.text import (
        MINHASH_A_MULT,
        MINHASH_B_MULT,
        MINHASH_PRIME,
        analyze_standard_py,
    )

    num_perms = num_perms or params.MINHASH_PERMS
    pr = np.arange(1, num_perms + 1, dtype=np.int64)
    a = (MINHASH_A_MULT * pr) % MINHASH_PRIME
    b = (MINHASH_B_MULT * pr) % MINHASH_PRIME

    @F.pandas_udf("string")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            # JVM parity for NULL text: greatest(size(null)-2, 1)
            # ignores the null operand and concat_ws of all-null
            # elements is "", so the expression form signs a null doc
            # exactly like an empty one — mirror that
            toks = analyze_standard_py(t or "")
            # JVM edge parity: split("", " ") = [""], so an all-punct
            # doc shingles to the single empty gram
            w = toks if toks else [""]
            grams = [" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))]
            h = np.fromiter(
                (
                    int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                    % MINHASH_PRIME
                    for g in grams
                ),
                dtype=np.int64,
                count=len(grams),
            )
            mins = ((a[:, None] * h[None, :] + b[:, None]) % MINHASH_PRIME).min(axis=1)
            out.append(
                hashlib.md5(",".join(str(int(x)) for x in mins).encode()).hexdigest()
            )
        return pd.Series(out)

    return sig(F.col(text_col) if isinstance(text_col, str) else text_col)


def minhash_signatures(shingles: DataFrame, num_perms: int | None = None) -> DataFrame:
    """(doc_id, perm, minhash) — signature = min over the doc's
    shingles under num_perms hash 'permutations'. Composition of
    minhash_wide (the aggregate) + signatures_from_wide (the in-row
    unpivot); callers that serve repeatedly should cache the wide
    frame and unpivot off it."""
    return signatures_from_wide(
        minhash_wide(shingles, num_perms), num_perms
    )


def lsh_buckets_wide(
    wide: DataFrame, bands: int | None = None, num_perms: int | None = None
) -> DataFrame:
    """(doc_id, band, bucket) computed directly from a minhash_wide
    frame: band b's bucket = md5 of the comma-joined signature slice
    [b*r, (b+1)*r) — a PURE in-row projection (no shuffle at all),
    byte-identical to lsh_buckets on the unpivoted signatures."""
    bands = bands or params.LSH_BANDS
    num_perms = num_perms or params.MINHASH_PERMS
    if num_perms % bands:
        raise ValueError(
            f"num_perms ({num_perms}) must divide evenly into bands "
            f"({bands}) — a remainder would silently drop signature "
            "columns here while the unpivoted path emits a ragged "
            "extra band (divergent buckets)"
        )
    r = num_perms // bands
    # ONE selectExpr parse instead of bands*r Column constructions —
    # the same py4j round-trip cut as minhash_wide above (this runs on
    # the artifact-update hot path once per commit); the parsed tree
    # (md5 over concat_ws of casted signature slices, posexplode of
    # the band array) is node-identical to the old Column form.
    band_md5s = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"cast(m{b * r + j} as string)" for j in range(r))
        + "))"
        for b in range(bands)
    )
    return wide.selectExpr(
        "doc_id",
        f"posexplode(array({band_md5s})) as (band, bucket)",
    ).select("doc_id", F.col("band").cast("int").alias("band"), "bucket")


def lsh_buckets(signatures: DataFrame, bands: int | None = None, num_perms: int | None = None) -> DataFrame:
    """(doc_id, band, bucket) — band b covers perms [b*r, (b+1)*r),
    bucket = md5 of the comma-joined signature slice in perm order."""
    bands = bands or params.LSH_BANDS
    num_perms = num_perms or params.MINHASH_PERMS
    if num_perms % bands:
        raise ValueError(
            f"num_perms ({num_perms}) must divide evenly into bands ({bands})"
        )
    r = num_perms // bands
    sig_str = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
            lambda s: s["minhash"].cast("string"),
        ),
        ",",
    )
    return (
        signatures.withColumn("band", (F.col("perm") / r).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(sig_str).alias("bucket"))
    )


def lsh_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) sharing any band bucket, doc_a < doc_b.
    The join key is (band, bucket) so fan-out is per-bucket — this is
    the 100 TB-safe path (no all-pairs)."""
    a = buckets.select(F.col("band"), F.col("bucket"), F.col("doc_id").alias("doc_a"))
    b = buckets.select(F.col("band"), F.col("bucket"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def substring_window_postings(
    documents: DataFrame, window: int | None = None
) -> DataFrame:
    """(doc_id, pos, fp) — one row per W-word window start: pos is the
    1-based word position, fp = md5 of the window's space-joined words.
    Docs shorter than W words emit nothing (they cannot contain a
    W-word duplicated substring).

    The substrate of substring-level exact dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): unlike
    doc_shingles' DISTINCT set semantics, postings keep POSITIONS —
    span merging needs them — and every window, including within-doc
    repeats (self-repetition is duplicated text too).

    Perf: the fingerprint array is built IN-ROW (one transform over a
    sequence, tokenized once) then exploded — no joins, no shuffle.
    Hashing cost is O(W x words) bytes md5'd per doc; a Karp-Rabin
    rolling hash would make it O(words) but md5 is what DuckDB computes
    bit-identically, keeping the operator oracle-checkable — and at W=8
    the constant is scan-dominated anyway. The repartition spreads the
    explode across cores (source tables are single-file parquet)."""
    W = int(window or params.SUBSTRING_WINDOW)
    w = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
    ).select("doc_id", words("text").alias("w"))
    return (
        w.filter(F.size("w") >= W)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - W + 1),
                    lambda i: F.struct(
                        i.cast("bigint").alias("pos"),
                        F.md5(
                            F.concat_ws(" ", F.slice(F.col("w"), i, W))
                        ).alias("fp"),
                    ),
                )
            ).alias("pf"),
        )
        .select("doc_id", "pf.pos", "pf.fp")
    )


def substring_spans(
    postings: DataFrame,
    window: int | None = None,
    min_count: int | None = None,
) -> DataFrame:
    """Substring-level exact dedup: (doc_id, span_start, span_len,
    cluster_key) — the maximal word spans of each document covered by
    W-word windows that occur >= min_count times in the corpus
    (across documents OR repeated within one). span_start/span_len are
    1-based word units; cluster_key is the span's FIRST window
    fingerprint, so documents sharing the same maximal duplicated
    region get the same key (regions that only partially overlap, or
    whose maximal extents differ across docs, may key differently —
    the span set itself is exact either way, and exactness of the
    SPANS is what a scrubbing pipeline consumes).

    Doc-level MinHash/SimHash cannot see a duplicated paragraph inside
    otherwise-distinct documents — this operator exists for exactly
    that case (duplicated boilerplate, licence blocks, templated
    intros). The reference has no dedup at all (SURVEY.md §2.I).

    Scale shape — NO pairwise anything: duplicated fingerprints come
    from one groupBy(fp) count (shuffle 1, map-side partial agg), the
    posting table is left-semi-joined back on fp (shuffle 2, fan-out
    1:1 — never the sum(df^2) of an inverted-index self-join; a
    boilerplate window in a billion docs is one grouped row and a
    semi-join hit, not 10^18 pairs). Span merging is gaps-and-islands:
    a window function partitioned by doc_id over ONLY the duplicated
    rows (shuffle 3, output-proportional), and the final
    groupBy(doc_id, island) reuses that partitioning — Catalyst plans
    no fourth exchange. Cost is ~3 bounded shuffles of |postings|,
    |dup windows|, |dup windows| rows; plan-pinned by
    test_substring_dedup_plan_has_no_self_join."""
    from pyspark.sql.window import Window as _W

    W = int(window or params.SUBSTRING_WINDOW)
    mc = int(min_count or params.SUBSTRING_MIN_COUNT)
    dup = (
        postings.groupBy("fp")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= mc)
        .select("fp")
    )
    d = postings.join(dup, "fp", "left_semi")
    isl = d.withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(_W.partitionBy("doc_id").orderBy("pos")),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") - F.min("pos") + W).cast("bigint").alias("span_len"),
            F.min_by("fp", "pos").alias("cluster_key"),
        )
        .drop("island")
    )


def substring_decontaminate(
    documents: DataFrame,
    eval_mod: int = 50,
    window: int | None = None,
) -> DataFrame:
    """Substring-level benchmark decontamination (the GPT-3 appendix-C
    style exact n-gram overlap check, here W-word windows): maximal
    spans of TRAINING documents whose windows appear anywhere in the
    held-out eval slice (``doc_id % eval_mod == 0``) — returns
    (doc_id, span_start, span_len, n_eval_windows), training docs
    only. Unlike ``decontaminate`` (trigram-overlap COUNTS per doc),
    this yields the positions, so the output composes directly with
    the span-cutting machinery (cut EVERY span — there is no keeper
    for eval contamination) instead of forcing whole-doc drops.

    Scale shape mirrors substring_spans with an even smaller build
    side: the eval fingerprint set derives from the eval docs alone
    (the ``doc_id % eval_mod`` filter pushes to the scan, so only the
    tiny eval slice is tokenized twice), is distinct-aggregated, and
    joins the training postings left-semi — benchmarks are tiny next
    to a 100 TB corpus, so this side broadcasts; past the threshold
    it degrades to the same 1:1 shuffle semi-join. Span merge is the
    identical output-proportional gaps-and-islands window.

    Cache-vs-recompute (deliberate, VERDICT r14 nit): the training
    postings are re-derived here even when a dedup pass already built
    them in the same session — persisting the postings table
    (corpus-words-proportional, 23.5M rows at the 500k-doc probe)
    costs more memory than the second scan-dominated build costs time
    (sf10 probe: the full decontam detect re-runs in seconds-class;
    see .scale_probe/results_substring.json `decontam_s`). Do not
    "fix" this by blindly persisting postings."""
    from pyspark.sql.window import Window as _W

    W = int(window or params.SUBSTRING_WINDOW)
    ev = F.col("doc_id") % int(eval_mod) == 0
    eval_fp = (
        substring_window_postings(documents.filter(ev), W)
        .select("fp")
        .distinct()
    )
    train = substring_window_postings(documents.filter(~ev), W)
    d = train.join(eval_fp, "fp", "left_semi")
    isl = d.withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(_W.partitionBy("doc_id").orderBy("pos")),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") - F.min("pos") + W).cast("bigint").alias("span_len"),
            F.count("*").cast("bigint").alias("n_eval_windows"),
        )
        .drop("island")
    )


def substring_scrub(documents: DataFrame, spans: DataFrame) -> DataFrame:
    """The scrub stage substring dedup exists to feed (Lee et al.
    2022 §4: remove all but ONE occurrence of each duplicated
    substring): (doc_id, clean_text, n_words_removed) for EVERY input
    doc — non-keeper duplicated spans cut from the text, the keeper
    occurrence and all non-duplicated docs untouched.

    Keeper = the span with the smallest (doc_id, span_start) per
    cluster_key (deterministic; within-doc self-repetition keeps the
    first occurrence). Removal intervals within a doc may overlap
    (maximal spans from different clusters can share words); a word is
    dropped when ANY removing interval covers it, so overlap needs no
    explicit merge. RECONSTRUCTION CONTRACT (VERDICT r14 #6): texts
    are rebuilt by single-space join of the surviving tokens of
    words() (split on ' ', empty tokens included) — so UNTOUCHED
    regions round-trip byte-exactly even through multi-space runs
    (each extra space is an empty token that survives the split →
    rejoin), while whitespace INSIDE a removed interval leaves with
    the removed words. A corpus whose whitespace must survive
    arbitrary cuts (tabs/newlines, significant indentation) needs an
    offset-carrying tokenizer, not this one; pinned by
    test_substring_scrub_two_space_roundtrip_and_cut.

    Scale shape (VERDICT r14 #1 — span-proportional machinery only,
    NO word-level exchange anywhere): keeper election is one window
    over the SPAN table; the removing intervals aggregate per doc
    into an array (one shuffle of the span-proportional cut table);
    documents LEFT-join that interval table ONCE on doc_id (the only
    exchange that can carry corpus rows — whole docs, not words; at
    bench scale the interval side broadcasts and even that exchange
    disappears); the cut itself is a single IN-ROW ``filter`` with a
    positional lambda over the tokenized word array — word x
    interval work happens inside the row (per-doc bounded: words x
    removing-intervals-in-that-doc), never as join fan-out. The r14
    shape shuffled corpus-WORD rows through four wide stages
    (posexplode -> interval join -> distinct -> anti-join ->
    collect_list, measured 11.1 s / 500k docs at sf10); this shape
    moved the same arithmetic into the row and cut it to one
    span-side aggregate plus one doc-side join. Plan-pinned by
    test_substring_scrub_cut_is_in_row (no Generate, no word-level
    Exchange, one doc-side join)."""
    from pyspark.sql.window import Window as _W

    rn = F.row_number().over(
        _W.partitionBy("cluster_key").orderBy("doc_id", "span_start")
    )
    cuts = (
        spans.withColumn("rn", rn)
        .filter(F.col("rn") > 1)
        .select(
            "doc_id",
            F.col("span_start").cast("bigint").alias("cut_s"),
            (F.col("span_start") + F.col("span_len") - 1)
            .cast("bigint")
            .alias("cut_e"),
        )
    )
    # span-proportional: one interval-array row per doc that loses text
    ivs = cuts.groupBy("doc_id").agg(
        F.collect_list(F.struct("cut_s", "cut_e")).alias("ivs")
    )
    base = documents.select("doc_id", words("text").alias("w"))
    j = base.join(ivs, "doc_id", "left")
    # in-row positional cut: a word survives unless ANY removing
    # interval covers its 1-based position (overlapping intervals need
    # no merge — coverage is coverage). Docs with no intervals skip
    # the per-word work entirely.
    kept = F.when(F.col("ivs").isNull(), F.col("w")).otherwise(
        F.filter(
            F.col("w"),
            lambda x, i: ~F.exists(
                F.col("ivs"),
                lambda iv: ((i + 1) >= iv["cut_s"])
                & ((i + 1) <= iv["cut_e"]),
            ),
        )
    )
    # a fully-duplicated non-keeper doc loses every word and must
    # still come out (clean_text = '', everything removed) — the
    # downstream filter that drops empties is the caller's policy
    # decision, not this operator's. Two-step select: `kept` feeds
    # both outputs, and the filter lambda is not a cheap expression
    # Catalyst would inline twice.
    k = j.select("doc_id", F.size("w").alias("n_words"), kept.alias("kept"))
    return k.select(
        "doc_id",
        F.concat_ws(" ", "kept").alias("clean_text"),
        (F.col("n_words") - F.size("kept"))
        .cast("bigint")
        .alias("n_words_removed"),
    )


def df_capped_shingles(
    shingles: DataFrame, max_df_frac: float | None = None
) -> DataFrame:
    """The df-cap applied to a shingle table: drops shingles with df
    above clamp(nd * max_df_frac, params.JACCARD_DF_FLOOR,
    params.JACCARD_DF_CEIL) — the build-side artifact every similarity
    pipeline maintains at ingest (the stop list is corpus statistics,
    recomputed per snapshot, not per query). See jaccard_pairs for the
    rationale and scale shape."""
    max_df_frac = (
        params.JACCARD_MAX_DF_FRAC if max_df_frac is None else max_df_frac
    )
    # doc_shingles emits DISTINCT (doc_id, shingle), so count(*) = df
    ndocs = shingles.agg(F.count_distinct("doc_id").alias("nd"))
    stop = (
        shingles.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .crossJoin(ndocs)  # 1-row frame: broadcast-nested-loop, free
        .filter(
            F.col("df")
            > F.least(
                F.greatest(
                    F.col("nd") * max_df_frac, F.lit(float(params.JACCARD_DF_FLOOR))
                ),
                F.lit(float(params.JACCARD_DF_CEIL)),
            )
        )
        .select("shingle")
    )
    # NO forced broadcast: on natural text the stop list is tiny
    # (heavy tail) and Catalyst broadcasts it anyway under the
    # threshold, but nothing BOUNDS it — a low-entropy corpus at scale
    # can push millions of shingles over the cap, and a forced
    # broadcast then dies building the blob on the driver (measured at
    # the sf10 probe). The fallback shuffle anti-join lands on the
    # same shingle key the df aggregate already shuffled on.
    return shingles.join(stop, "shingle", "left_anti")


def exhaustive_pair_bound(capped: DataFrame) -> int:
    """Candidate-pair count of the inverted-index self-join over a
    (df-capped) shingle table: sum over shingles of C(df, 2). One
    integer-exact aggregate over the frame — cheap relative to the join
    it sizes (the frame is persisted on every caller path)."""
    row = (
        capped.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(F.sum(F.expr("df * (df - 1) div 2")).alias("pairs"))
        .first()
    )
    return int(row["pairs"] or 0)


def jaccard_pairs(
    shingles: DataFrame,
    min_overlap: int = 2,
    max_df_frac: float | None = None,
    capped: DataFrame | None = None,
    max_pairs: int | None = None,
    on_overflow: str = "auto",
) -> DataFrame:
    """n-gram Jaccard via inverted-index self-join on shingle.
    Returns (doc_a, doc_b, n_common, jaccard) for pairs sharing >=
    min_overlap shingles.

    Document-frequency cap: shingles with df above
    ``clamp(nd * max_df_frac, params.JACCARD_DF_FLOOR,
    params.JACCARD_DF_CEIL)`` are dropped from the computation
    entirely — sizes AND intersections — before the self-join. They
    carry no near-dup signal (every doc shares them), and without the
    cap a single boilerplate shingle in 50% of docs makes the join
    emit ~|corpus|^2/8 rows. The FLOOR keeps small corpora working (a
    purely fractional cap drops every df>=2 shingle when nd < 10); the
    CEILING bounds the self-join fan-out at sum(df^2) <=
    |shingles| * DF_CEIL even when nd*frac is huge — the 100 TB
    guarantee (see params.py for the recall trade). Scale shape: the
    stop set is tiny by definition (heavy tail = few ultra-common
    shingles), so the exclusion is a broadcast anti-join — a pure map
    over the shingle stream; the df aggregate shuffles on the same key
    the self-join already shuffles on.

    ``capped``: optional prebuilt ``df_capped_shingles`` frame
    (persisted by the caller, e.g. a session cache) — the serve path
    then runs just sizes + the inverted-index self-join.

    ``max_pairs``: guard ceiling on the candidate-pair bound (default
    params.EXHAUSTIVE_PAIR_CAP); fires BEFORE launching the self-join
    when sum(C(df, 2)) exceeds it — the sf10 probe proved the over-cap
    regime spills unboundedly (>70 GB at 10e9 pairs) and the bounded
    production path is jaccard_verify_pairs.

    ``on_overflow``: what the guard does past the cap. "auto" (the
    default) ROUTES to the production tier — minhash the shingles,
    band into LSH buckets, and return jaccard_verify_pairs(min_jaccard
    =0.0) so a `dup_clusters(jaccard_pairs(...))` pipeline survives
    corpus growth without code changes (with a RuntimeWarning, since
    the result becomes the candidate-restricted LSH subset — standard
    MinHash-LSH recall instead of exhaustive). "raise" keeps the
    round-7 loud ValueError for callers that must not silently change
    semantics. Under-cap behavior is identical in both modes."""
    if on_overflow not in ("auto", "raise"):
        raise ValueError(f"on_overflow must be 'auto' or 'raise', got {on_overflow!r}")
    orig = shingles
    if capped is None:
        # persist the capped frame: sizes and both self-join sides read
        # it (3 references), and each un-persisted reference re-runs
        # the df aggregate + anti-join over the full shingle stream
        capped = df_capped_shingles(shingles, max_df_frac).persist()
    shingles = capped
    cap = params.EXHAUSTIVE_PAIR_CAP if max_pairs is None else max_pairs
    bound = exhaustive_pair_bound(shingles)
    if bound > cap:
        if on_overflow == "auto":
            import warnings

            warnings.warn(
                f"exhaustive jaccard_pairs would emit ~{bound:,} candidate "
                f"pairs (> cap {cap:,}); auto-routing to the bounded "
                "production tier (jaccard_verify_pairs: LSH candidates + "
                "exact verify) — pairs are now the LSH candidate subset, "
                "not exhaustive. Pass on_overflow='raise' to forbid, or a "
                "larger max_pairs to force the exhaustive join.",
                RuntimeWarning,
                stacklevel=2,
            )
            buckets = lsh_buckets_wide(minhash_wide(orig))
            # tag the persisted capped frame on the routed result too —
            # without it the auto path's persist outlives the call
            # (release() frees it on the normal path)
            return tag_cached(
                jaccard_verify_pairs(
                    capped, buckets, min_jaccard=0.0, min_overlap=min_overlap
                ),
                capped,
            )
        raise ValueError(
            f"exhaustive jaccard_pairs would emit ~{bound:,} candidate "
            f"pairs (> cap {cap:,}); this tier is for correctness-scale "
            "corpora only — use jaccard_verify_pairs (LSH candidates + "
            "exact verify, the bounded production path), or pass an "
            "explicit max_pairs to override"
        )
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
        .filter(F.col("n_common") >= min_overlap)
    )
    return tag_cached(
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                params.ROUND,
            ).alias("jaccard"),
        ),
        shingles,
    )


def jaccard_verify_pairs(
    shingles: DataFrame,
    buckets: DataFrame | None,
    min_jaccard: float | None = None,
    min_overlap: int | None = None,
    candidates: DataFrame | None = None,
    with_sizes: bool = False,
    all_candidates: bool = False,
) -> DataFrame:
    """Production near-dup pair path: LSH candidate generation + exact
    Jaccard VERIFICATION — the shape a 100 TB dedup pipeline actually
    runs. Candidates are band-bucket collisions (lsh_candidate_pairs,
    bounded per bucket, never all-pairs); each candidate is then
    verified on the two docs' exact capped shingle sets. No shingle
    inverted-index self-join anywhere, so jaccard_pairs' sum(df^2)
    bound — linear in the corpus but with a DF_CEIL-sized constant —
    never appears. Measured motivation (SCALE.md §6): at the sf10
    probe (500k docs) the exhaustive join spilled >70 GB of local
    shuffle while every LSH path stayed flat.

    Recall contract: standard MinHash-LSH semantics — a pair is
    emitted only if it collides in >= 1 band AND its exact Jaccard
    over the df-capped shingle sets >= min_jaccard (collision
    probability 1-(1-s^r)^b; with the repo's 16 perms / 4 bands,
    s=0.5 pairs collide w.p. ~0.23, s=0.9 w.p. ~0.93). This is a
    candidate-restricted SUBSET of jaccard_pairs' exhaustive output —
    the deliberate recall-for-boundedness trade every production
    near-dup system makes.

    ``shingles`` must be the df-CAPPED shingle table (sizes and
    intersections then use the same sets as jaccard_pairs, so shared
    pairs carry identical jaccard values). Returns
    (doc_a, doc_b, n_common, jaccard).

    Scale shape: one bucket-bounded join for candidates; the verify is
    cand |x| shingles(doc_a) (fan-out = candidate count x avg doc
    shingle count) hash-joined to shingles on (doc_b, shingle); sizes
    is a doc-keyed aggregate. Everything is linear in
    |candidates| x |doc shingles|.

    ``candidates``: optional prebuilt (doc_a, doc_b) candidate frame —
    the incrementally-maintained artifact path (DedupArtifacts stores
    band collisions as they are discovered per ingest batch); when
    given, ``buckets`` is unused and may be None. Band collision is a
    pure function of two signatures, so a stored candidate set is
    exactly the set this function would derive from the full bucket
    table.

    ``with_sizes``: append the two docs' capped-set sizes (na, nb) —
    the incremental pair-stats artifact stores them so later df-flip
    deltas can adjust jaccard without re-reading shingle sets.

    ``all_candidates``: emit a row for EVERY candidate pair, even ones
    with zero common capped shingles (n_common=0, jaccard=0.0, sizes
    coalesced to 0 for docs whose capped set is empty), ignoring
    min_overlap/min_jaccard — the caller filters. The incremental
    pair-stats artifact needs this: a pair whose shared shingles are
    ALL over-cap at verify time must still get a stored row carrying
    (0, na, nb), otherwise a later up-flip (the df cap re-admitting a
    shared shingle — a moving cap, or remove() shrinking df) has no
    row to adjust and the pair is permanently lost to the flip
    algebra. Requires ``candidates``. ``min_jaccard``/``min_overlap``
    default (None) to 0.5/2 in normal mode and to no-filtering under
    ``all_candidates``; explicitly passing a filtering threshold
    together with ``all_candidates`` raises rather than being
    silently ignored."""
    cand = candidates if candidates is not None else lsh_candidate_pairs(buckets)
    if all_candidates and candidates is None:
        raise ValueError("all_candidates requires an explicit candidates frame")
    if all_candidates:
        # all_candidates deliberately emits EVERY pair (the incremental
        # artifact store filters at read time). Thresholds default to
        # None sentinels so the DOCUMENTED unfiltered contract holds
        # when the caller leaves them alone — but an EXPLICIT filtering
        # threshold alongside all_candidates would be silently ignored,
        # so it raises instead.
        if (min_jaccard is not None and min_jaccard > 0.0) or (
            min_overlap is not None and min_overlap > 1
        ):
            raise ValueError(
                "all_candidates=True returns every candidate pair "
                "unfiltered; pass min_jaccard=0.0 and min_overlap=1 "
                "(filter the result yourself) or drop all_candidates"
            )
        min_jaccard, min_overlap = 0.0, 1
    else:
        min_jaccard = 0.5 if min_jaccard is None else min_jaccard
        min_overlap = 2 if min_overlap is None else min_overlap
    sizes = shingles.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n")
    )
    a_sh = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    z = F.lit(0).cast("bigint")
    if all_candidates:
        inter = cand.select("doc_a", "doc_b").join(
            inter, ["doc_a", "doc_b"], "left"
        ).select(
            "doc_a", "doc_b", F.coalesce("n_common", z).alias("n_common")
        )
        size_join = "left"
    else:
        inter = inter.filter(F.col("n_common") >= min_overlap)
        size_join = "inner"
    cols = ["doc_a", "doc_b", "n_common"] + (
        ["na", "nb"] if with_sizes else []
    )
    out = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"),
            "doc_a",
            size_join,
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"),
            "doc_b",
            size_join,
        )
    )
    if all_candidates:
        # a doc with an EMPTY capped set has no sizes row — its size
        # is genuinely 0, and jaccard over empty sets is defined 0.0
        out = out.select(
            "doc_a",
            "doc_b",
            "n_common",
            F.coalesce("na", z).alias("na"),
            F.coalesce("nb", z).alias("nb"),
        )
        return out.select(
            *cols,
            F.when(
                F.col("n_common") > z,
                F.round(
                    F.col("n_common")
                    / (F.col("na") + F.col("nb") - F.col("n_common")),
                    params.ROUND,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    return (
        out.select(
            *cols,
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                params.ROUND,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def simhash(documents: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash fingerprint per doc: per-bit majority vote over
    md5-hashed tokens (with multiplicity). (doc_id, simhash).

    ``bits`` <= 32 draws per-token bits from the 32-bit md5 prefix
    (hash32); 33-60 from the 60-bit prefix (hash60) — without the
    wider base, bits above 31 would be the constant 0 for every doc
    and wide-band configurations would degenerate to a cross join.
    bits > 60 is rejected: the fingerprint accumulates in a signed
    BIGINT and the hash base is 60-bit."""
    if not 1 <= bits <= 60:
        raise ValueError(f"simhash bits must be in [1, 60], got {bits}")
    base = hash32 if bits <= 32 else hash60
    toks = (
        documents.repartition(
            documents.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
        )
        .select("doc_id", F.explode(words("text")).alias("tok"))
        .withColumn("h", base(F.col("tok")))
    )
    # per-bit test as (h div 2^b) % 2 — integer ops only, stays exact
    bit = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        F.col("h"),
    ).withColumn(
        "v",
        F.when(F.expr("pmod(h div CAST(power(2, b) AS BIGINT), 2)") == 1, F.lit(1)).otherwise(
            F.lit(-1)
        ),
    )
    return (
        bit.groupBy("doc_id", "b")
        .agg(F.sum("v").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("b")).cast("bigint")).otherwise(0)
            )
            .cast("bigint")
            .alias("simhash")
        )
    )


def simhash_neardup_pairs(
    documents: DataFrame | None = None,
    max_hamming: int = 3,
    bits: int = 32,
    bands: int = 4,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup PAIR generation — the fingerprint-side
    production path that makes the stored simhash column actionable
    (the fingerprint alone identifies nothing; pairs do). Banded
    candidate join + exact Hamming verify:

    1. split each ``bits``-bit fingerprint into ``bands`` contiguous
       chunks (in-row projection, no shuffle);
    2. candidates = docs colliding on >= 1 (band, chunk) key — by
       PIGEONHOLE this recall is EXACT, not probabilistic: a pair
       within ``max_hamming <= bands - 1`` differing bits cannot
       differ in every band (contrast MinHash-LSH's 1-(1-s^r)^b
       collision probability);
    3. verify = popcount of XOR on the two fingerprints (pure integer
       JVM expression), keep pairs with hamming <= max_hamming.

    Returns (doc_a, doc_b, hamming).

    Scale shape: banding is a projection; the join is bucket-bounded
    by (band, chunk). Bucket population = n / 2^(bits/bands) per
    band, so 32/4 (8-bit chunks, the oracle-parity default here) is a
    CORRECTNESS-tier configuration — at 100 TB run bits=60, bands=4
    (15-bit chunks) so buckets stay ~n/32768 and the verify join
    stays linear; the operator is parameterized for exactly that
    (bits caps at 60, the hash-base/BIGINT width — see simhash()).

    ``fingerprints``: optional prebuilt/persisted ``simhash`` frame
    (doc_id, simhash) — the stored-artifact serve form."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"pigeonhole recall guarantee requires max_hamming <= bands - 1 "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    if not 1 <= bits <= 60:
        raise ValueError(f"simhash bits must be in [1, 60], got {bits}")
    if bits % bands != 0:
        raise ValueError(
            f"bits ({bits}) must divide evenly into bands ({bands}) — "
            "a remainder would silently drop the top bits from banding "
            "and void the pigeonhole recall guarantee"
        )
    fp = fingerprints if fingerprints is not None else simhash(documents, bits)
    width = bits // bands
    bk = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"),
    ).withColumn(
        "key",
        F.expr(f"pmod(simhash div CAST(power(2, b * {width}) AS BIGINT), {1 << width})"),
    )
    a = bk.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"), "b", "key")
    b2 = bk.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"), "b", "key")
    cand = (
        a.join(b2, ["b", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("bigint")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    max_pairs: int | None = None,
    on_overflow: str = "auto",
) -> DataFrame:
    """All-pairs cosine >= threshold (vec_a < vec_b). Quadratic — fine
    for correctness tier; the scale path is LSH-bucketed (knn.ivf_knn
    pattern). Returns (vec_a, vec_b, cosine).

    ``max_pairs``: guard ceiling on the n*(n-1)/2 pair count (default
    params.EXHAUSTIVE_PAIR_CAP); fires before launching the nested-loop
    join — the bounded production path is embedding_lsh_neardup
    (sign-LSH buckets, sf10-measured linear).

    ``on_overflow``: "auto" (default) routes an over-cap corpus to
    embedding_lsh_neardup with a RuntimeWarning (same output schema;
    sign-LSH recall instead of exhaustive), so pipelines survive
    corpus growth without code changes; "raise" keeps the loud
    ValueError. Under-cap behavior is identical in both modes.

    Perf: vectors are L2-normalized once per ROW (projection before the
    join), so each pair evaluates a single dot product — not dot plus
    two norms. cosine(a,b) == dot(a/|a|, b/|b|) up to ~1e-15, absorbed
    by params.ROUND before the threshold filter on both engines."""
    from lintdb_spark.functions.vector import l2_normalize

    if on_overflow not in ("auto", "raise"):
        raise ValueError(f"on_overflow must be 'auto' or 'raise', got {on_overflow!r}")
    cap = params.EXHAUSTIVE_PAIR_CAP if max_pairs is None else max_pairs
    n = embeddings.count()  # parquet metadata count — no scan
    if n * (n - 1) // 2 > cap:
        if on_overflow == "auto":
            import warnings

            warnings.warn(
                f"exhaustive embedding_neardup_pairs over {n:,} vectors is "
                f"~{n * (n - 1) // 2:,} pairs (> cap {cap:,}); auto-routing "
                "to embedding_lsh_neardup (sign-LSH bucketed + exact "
                "verify) — pairs are now the LSH candidate subset, not "
                "exhaustive. Pass on_overflow='raise' to forbid, or a "
                "larger max_pairs to force the exhaustive join.",
                RuntimeWarning,
                stacklevel=2,
            )
            return embedding_lsh_neardup(embeddings, threshold=threshold)
        raise ValueError(
            f"exhaustive embedding_neardup_pairs over {n:,} vectors is "
            f"~{n * (n - 1) // 2:,} pairs (> cap {cap:,}); use "
            "embedding_lsh_neardup (sign-LSH bucketed, the bounded "
            "production path), or pass an explicit max_pairs to override"
        )

    # explicit partition COUNT on the streaming side: the source is
    # single-file parquet, and AQE would coalesce a column-only
    # repartition of 2k tiny rows back to one partition — it can't see
    # that the nested-loop join multiplies the work by |b|. A
    # user-specified count is exempt from AQE coalescing.
    n_parts = embeddings.sparkSession.sparkContext.defaultParallelism
    a = embeddings.repartition(n_parts, F.col("vec_id")).select(
        F.col("vec_id").alias("vec_a"), l2_normalize(F.col("embedding")).alias("va")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), l2_normalize(F.col("embedding")).alias("vb")
    )
    return (
        # broadcast the RIGHT side explicitly: otherwise Spark may pick
        # the repartitioned side for broadcast and stream the single-
        # partition one -> the whole quadratic loop in one task
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(dot_product("va", "vb"), params.ROUND).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# Embedding components are snapped to the grid 2^-20 before the
# hyperplane dot product: with BOTH factors integral (scaled component
# x integer plane component), every product and partial sum is an
# integer far below 2^53, so double addition is EXACT and the sign is
# independent of summation order — numpy's pairwise sum, a SQL engine's
# sequential sum, and any future vectorized layout all agree
# bit-for-bit, even when the dot product lands exactly on zero.
LSH_QUANT_SCALE = 1 << 20


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random-hyperplane family for sign-LSH: component
    (p, d) is an LCG hash of the flat index mapped to an integer in
    [-1000, 1000]. Integer components are exactly representable as
    doubles; combined with the LSH_QUANT_SCALE embedding quantization
    the bucket sign bits are exact integer arithmetic on every
    engine (see LSH_QUANT_SCALE note)."""
    return [
        [
            float((1103515245 * (p * dim + d) + 12345) % 2147483647 % 2001 - 1000)
            for d in range(dim)
        ]
        for p in range(num_planes)
    ]


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    num_planes: int = 18,
    bands: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Sign-LSH bucketing for embeddings (Charikar 2002): each vector
    gets one bucket key per band, where a band's key packs
    ``num_planes // bands`` hyperplane sign bits. Returns
    (vec_id, band, key).

    Scale shape: a PURE MAP — one Arrow-batched pandas_udf computes
    all num_planes dot products per vector as a single |batch| x dim
    @ dim x planes matmul and packs the band keys in-row, so there is
    no plane crossJoin, no |vectors| x planes intermediate, and no
    shuffle at all (the earlier JVM higher-order-function version
    hash-aggregated |vectors| x planes rows; the matmul is ~30x
    cheaper at sf0.1). Banding structure matches minhash-LSH: recall
    tunes with (bands, rows-per-band) while candidate fan-out stays
    bucket-bounded."""
    if num_planes % bands != 0:
        raise ValueError(
            f"num_planes ({num_planes}) must be divisible by bands ({bands}) — "
            "a remainder would create an undersized extra band"
        )
    r = num_planes // bands
    from pyspark.sql.functions import pandas_udf

    # integer plane components x grid-snapped embedding components:
    # every product/partial sum is an integer << 2^53, so the float64
    # matmul is exact and the sign bits are order-independent (see
    # LSH_QUANT_SCALE note above)
    P = np.asarray(hyperplanes(num_planes, dim), dtype=np.float64)
    W = (1 << np.arange(r, dtype=np.int64)).astype(np.int64)

    @pandas_udf("array<bigint>")
    def band_keys(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in emb])
        # half-up rounding via floor(x+0.5): identical on every engine
        # (np.rint's half-to-even differs from SQL round's half-away)
        Mq = np.floor(M * LSH_QUANT_SCALE + 0.5)  # integral doubles, exact
        bits = (Mq @ P.T >= 0).astype(np.int64)  # |batch| x planes
        keys = bits.reshape(len(emb), bands, r) @ W  # |batch| x bands
        return pd.Series(list(keys))

    return embeddings.select(
        "vec_id", F.posexplode(band_keys("embedding")).alias("band", "key")
    )


def lsh_bucket_frame(
    embeddings: DataFrame,
    num_planes: int = 18,
    bands: int = 3,
    dim: int = 64,
) -> DataFrame:
    """The BUILD half of sign-LSH near-dup: (vec_id, band, key, nv) —
    banded bucket assignment carrying the L2-normalized vector, so the
    downstream self-join emits both pair vectors directly (no post-join
    lookups of the embeddings table). At 100 TB this is a materialized
    table maintained at ingest, partitioned by (band, key) — the same
    build/serve split as ivf_bucket."""
    from lintdb_spark.functions.vector import l2_normalize

    return hyperplane_lsh_buckets(embeddings, num_planes, bands, dim).join(
        embeddings.select("vec_id", l2_normalize(F.col("embedding")).alias("nv")),
        "vec_id",
    )


def embedding_lsh_neardup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    num_planes: int = 18,
    bands: int = 3,
    dim: int = 64,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """The scale path for embedding near-dup: sign-LSH candidate
    generation + exact cosine verification on candidates only. Returns
    (vec_a, vec_b, cosine) for pairs colliding in >=1 band with
    cosine >= threshold — a recall-tunable subset of
    ``embedding_neardup_pairs`` whose cost is bucket-bounded
    (sum over buckets of |bucket|^2) instead of |corpus|^2.

    At 18 planes / 3 bands of 6 bits, a cos=0.95 pair collides with
    p ~= 0.90 and a cos=0.4 pair with p ~= 0.49 — the knob trades
    recall at the threshold boundary for candidate volume, exactly
    like minhash-LSH's (bands, rows) knob.

    ``buckets``: optional prebuilt ``lsh_bucket_frame`` (persisted by
    the caller, e.g. a session cache) — the serve path then runs just
    the bucket-bounded self-join + verify."""
    # persist across the multi-band union: without it the pandas_udf
    # bucketing subtree re-plans per reference.
    if buckets is None:
        buckets = lsh_bucket_frame(embeddings, num_planes, bands, dim).persist()

    # BUCKET-LOCAL verification: group by (band, key) and compute the
    # whole bucket's pair cosines as ONE |bucket| x |bucket| matmul in
    # an Arrow-batched applyInPandas — Arrow moves |vectors| x bands
    # rows once, instead of materializing every candidate PAIR as a
    # JVM row with two 64-d arrays and folding the dot per pair
    # (measured ~3x at sf0.1: near-orthogonal data makes sign buckets
    # dense, so candidate pairs >> vectors). This is also the scale
    # shape: each bucket's work is local to its shuffle partition.
    # MEMORY CONTRACT: the applyInPandas group (one bucket) must fit
    # an executor — E[|bucket|] = n / 2^(planes/bands), so planes
    # per band is the knob that bounds it; size rows-per-band so a
    # bucket stays in the low millions of vectors at the target
    # corpus (e.g. 20 bits -> ~1e6 per bucket at 1e12 vectors).
    thr = float(threshold)
    scale = float(10**params.ROUND)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["nv"].to_numpy()[order]])
        S = V @ V.T
        iu, ju = np.triu_indices(n, 1)
        c = S[iu, ju]
        # round half-away-from-zero at params.ROUND, matching F.round /
        # SQL round semantics before the threshold filter
        c = np.copysign(np.floor(np.abs(c) * scale + 0.5) / scale, c)
        keep = c >= thr
        return pd.DataFrame(
            {"vec_a": ids[iu[keep]], "vec_b": ids[ju[keep]], "cosine": c[keep]}
        )

    collided = buckets.groupBy("band", "key").applyInPandas(
        per_bucket, "vec_a bigint, vec_b bigint, cosine double"
    )
    # multi-band collisions produce duplicate pairs with identical
    # cosine — one aggregate dedups
    return tag_cached(
        collided.groupBy("vec_a", "vec_b").agg(F.first("cosine").alias("cosine")),
        buckets,
    )


def dup_clusters(
    pairs: DataFrame, max_iters: int = 25, local_max_edges: int | None = None
) -> DataFrame:
    """Near-dup CLUSTER FORMATION — the step after pair generation in
    every real dedup pipeline (pairs alone don't tell you which docs
    to drop; transitive groups do). Connected components over the
    pair graph via hash-min label propagation: every doc starts
    labeled with its own id; each round a doc takes the min label
    among itself and its neighbors; at convergence a component's label
    is its min doc_id. Returns (doc_id, cluster_id) for every doc
    that appears in >=1 pair.

    Physical strategy selection (like search_batch's broadcast-vs-
    shuffle choice): the thresholded near-dup edge set is usually
    ORDERS of magnitude smaller than the corpus (it lists actual
    near-duplicates, not candidates), so when a bounded limit+collect
    shows it fits ``local_max_edges`` (params.CLUSTER_LOCAL_MAX_EDGES;
    see the driver-memory note there) the components are solved EXACTLY with
    driver-side union-find in one Spark job — no iteration, no
    variance. Larger graphs take the distributed propagation below.
    Pass ``local_max_edges=0`` to force the distributed path.

    Scale shape: each round is one join + one partial-aggregated
    groupBy over |edges| rows — no global sort, no all-pairs.
    Rounds = graph diameter; near-dup clusters are shallow (dozens of
    docs, diameter ~2-4), so this converges in a handful of rounds
    even at 100 TB. For adversarial long-chain graphs the known
    fix is large-star/small-star (Kiveris et al. 2014), which bounds
    rounds at O(log^2 n) — same per-round plan shape, not needed for
    near-dup workloads. Round structure: self-loops fold the "keep own
    label" term into the neighbor aggregate, so one round is ONE join
    + ONE partial-agg groupBy referencing the evolving frame once (a
    least/coalesce merge would reference it twice and double the
    composed plan per un-checkpointed round). Convergence is checked
    singly for the first two rounds, then every 3 composed rounds
    (near-dup components
    are near-cliques that finish in 1-2 rounds — measured: batching
    from the start wastes two rounds on the common case, while
    per-round checks tax adversarial chains; checking singly for two
    rounds lets the common case stop after exactly its 1 productive
    round + 1 confirming round). The check compares the
    label SUM as DECIMAL(38,0) between checks — labels only decrease,
    so an unchanged sum IS the fixed point; the 38-digit accumulator
    cannot overflow for 2^63-bounded ids below ~10^12 rows, unlike a
    BIGINT sum (ANSI ArithmeticException, or a silent false fixed
    point with ANSI off). One scalar aggregate per check over the
    just-checkpointed frame, no join against the previous labels, no
    data collected. If max_iters total rounds are exhausted before the
    fixed point (adversarially long chains), a warning is raised
    rather than silently returning split components.
    """
    import warnings

    local_max = (
        params.CLUSTER_LOCAL_MAX_EDGES if local_max_edges is None else local_max_edges
    )
    if local_max > 0:
        # bounded probe: ONE job that both fetches the edges and
        # proves the bound (limit stops the scan at local_max+1 rows,
        # so an over-sized graph costs one truncated pass, not a
        # count + a collect)
        rows = (
            pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
            .limit(local_max + 1)
            .collect()
        )
        if len(rows) <= local_max:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for r0 in rows:
                ra, rb = find(int(r0["a"])), find(int(r0["b"]))
                if ra != rb:
                    # union by MIN root so the final root IS the
                    # component's min doc_id (the output contract)
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            verts = {v for r0 in rows for v in (int(r0["a"]), int(r0["b"]))}
            out = pd.DataFrame(
                {
                    "doc_id": list(verts),
                    "cluster_id": [find(v) for v in verts],
                }
            ).astype("int64")
            # same tag propagation as the distributed path's return:
            # the PAIRS frame may carry persisted intermediates (capped
            # shingles, bucket frames) that callers release through the
            # result — dropping them here would leak executor memory
            return tag_cached(
                pairs.sparkSession.createDataFrame(
                    out, "doc_id long, cluster_id long"
                ),
                pairs,
            )

    # persist the pair list FIRST: fwd is referenced four times through
    # the symmetrize + self-loop unions, and each un-persisted
    # reference re-plans the whole (potentially expensive) pair
    # subtree — measured 4x the pair-generation cost at sf0.1
    fwd = pairs.select(F.col("doc_a").alias("v"), F.col("doc_b").alias("u")).persist()
    sym = fwd.unionByName(fwd.select(F.col("u").alias("v"), F.col("v").alias("u")))
    edges = sym.unionByName(
        sym.select("v").distinct().withColumn("u", F.col("v"))
    ).persist()
    labels = edges.select("v").distinct().withColumn("lbl", F.col("v"))
    converged = False
    prev_sum = None
    rounds_done = 0
    while rounds_done < max_iters:
        batch = 1 if rounds_done < 2 else min(3, max_iters - rounds_done)
        cur = labels
        for _ in range(batch):
            cur = (
                edges.join(cur, "v")
                .groupBy("u")
                .agg(F.min("lbl").alias("lbl"))
                .withColumnRenamed("u", "v")
            )
        # lazy checkpoint: the convergence-check aggregate below is the
        # action that materializes it — one job per window instead of
        # an eager-checkpoint job PLUS an aggregate job
        labels = cur.localCheckpoint(eager=False)
        rounds_done += batch
        lbl_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if lbl_sum == prev_sum:  # labels only decrease -> fixed point
            converged = True
            break
        prev_sum = lbl_sum
    if not converged:
        # the last check window may have ENDED at the fixed point (its
        # sum still differs from the window before), so one extra
        # confirming round distinguishes "converged on the boundary"
        # from genuine non-convergence before warning. Either way the
        # confirm frame's labels are returned: when genuinely
        # non-converged they are one productive round closer to the
        # fixed point than the pre-confirm frame (labels only
        # decrease), so discarding them would waste the round.
        confirm = (
            edges.join(labels, "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("lbl"))
            .withColumnRenamed("u", "v")
            .localCheckpoint()
        )
        confirm_sum = confirm.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        converged = confirm_sum == prev_sum
        labels = confirm
    edges.unpersist()
    fwd.unpersist()
    if not converged:
        warnings.warn(
            f"dup_clusters: label propagation did not converge within "
            f"max_iters={max_iters}; some connected components may be "
            f"split across cluster_ids. Raise max_iters (rounds needed "
            f"= graph diameter).",
            RuntimeWarning,
            stacklevel=2,
        )
    return tag_cached(
        labels.select(
            F.col("v").alias("doc_id"), F.col("lbl").cast("bigint").alias("cluster_id")
        ),
        pairs,
    )


def decontaminate(
    documents: DataFrame, eval_mod: int = 50, shingles: DataFrame | None = None
) -> DataFrame:
    """Benchmark DECONTAMINATION: flag training documents sharing >=1
    word-trigram shingle with a held-out eval set (the standard n-gram
    overlap check run before LLM training). The eval set here is the
    deterministic slice ``doc_id % eval_mod == 0``; in production it
    is the benchmark suite. Returns (doc_id, n_shared) — distinct
    shared shingles per contaminated training doc.

    Scale shape: eval benchmarks are tiny next to a 100 TB corpus, so
    eval docs are FILTERED FIRST and only they pass through
    doc_shingles' repartition + distinct; their shingle set is
    BROADCAST. The corpus side is a pure narrow
    scan -> explode -> broadcast-join -> partial aggregate — no
    corpus-wide shuffle at all (it skips doc_shingles' distinct
    because count_distinct in the final aggregate dedups per doc, and
    only contaminated rows ever reach that aggregate). If the eval
    side ever outgrew broadcast, the same plan degrades gracefully to
    a shuffled semi-join.

    ``shingles``: optional prebuilt (doc_id, shingle) table (e.g. the
    session-cached doc_shingles) — both sides then derive from it with
    pure filters, no re-tokenization. count_distinct keeps the result
    identical whether or not the input is already distinct."""
    if shingles is not None:
        eval_sh = (
            shingles.filter(F.col("doc_id") % eval_mod == 0)
            .select("shingle")
            .distinct()
        )
        train_sh = shingles.filter(F.col("doc_id") % eval_mod != 0)
    else:
        eval_sh = (
            doc_shingles(documents.filter(F.col("doc_id") % eval_mod == 0))
            .select("shingle")
            .distinct()
        )
        train_sh = (
            documents.filter(F.col("doc_id") % eval_mod != 0)
            .select("doc_id", words("text").alias("w"))
            .select("doc_id", F.explode(word_trigrams(F.col("w"))).alias("shingle"))
        )
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").cast("bigint").alias("n_shared"))
    )


def fuzzy_decontaminate(buckets: DataFrame, eval_mod: int = 50) -> DataFrame:
    """FUZZY decontamination via MinHash-LSH bucket collision: flag
    training documents whose signature lands in the same (band,
    bucket) as any held-out eval document — catching paraphrased /
    lightly-edited eval leakage the exact-trigram check misses
    (an LSH bucket hit means estimated Jaccard >= ~(1/bands)^(1/r)).
    The eval set is the same deterministic slice as ``decontaminate``
    (doc_id % eval_mod == 0). Returns (doc_id, n_eval_matches) —
    distinct eval documents each training doc collides with.

    ``buckets``: a (doc_id, band, bucket) LSH frame (lsh_buckets_wide
    over the stored wide-signature table — the serve path reads the
    same artifact the dedup family maintains at ingest).

    Scale shape: eval-side buckets are benchmark-sized and BROADCAST;
    the corpus side is a narrow filter + broadcast-join + doc-keyed
    partial aggregate — the corpus never shuffles, exactly like exact
    decontamination. Signature/bucket strings are md5-exact across
    engines, so parity is bit-for-bit with no float involved."""
    ev = buckets.filter(F.col("doc_id") % eval_mod == 0).select(
        "band", "bucket", F.col("doc_id").alias("eval_doc_id")
    )
    corpus = buckets.filter(F.col("doc_id") % eval_mod != 0)
    return (
        corpus.join(F.broadcast(ev), ["band", "bucket"])
        .groupBy("doc_id")
        .agg(F.count_distinct("eval_doc_id").cast("bigint").alias("n_eval_matches"))
    )


def cross_corpus_dedup(new_buckets: DataFrame, base_buckets: DataFrame) -> DataFrame:
    """Incremental-crawl dedup: keep only the NEW documents whose LSH
    signature collides with NO existing-corpus document — the
    "dedupe this crawl against what we already have" stage every
    growing training corpus runs before appending. Returns the
    surviving new doc_ids (one column, distinct).

    Inputs are (doc_id, band, bucket) LSH frames (lsh_buckets_wide
    over each corpus's stored wide-signature table). A single band
    collision drops the new doc — for APPEND dedup, unlike an ingest
    gate, recall beats precision: a false collision only costs one
    near-duplicate document, while a miss permanently pollutes the
    corpus (tune bands/rows for the target Jaccard threshold).

    Scale shape: join on (band, bucket) — bucket-bounded like every
    LSH self-join here, never all-pairs; the base side at 100 TB is
    the maintained signature table read from its bucket-partitioned
    layout, and only (band, bucket) key pairs shuffle, never
    documents. The anti-join against collision hits is doc-keyed and
    broadcast-friendly (hits are dup-sized, tiny next to the crawl)."""
    hits = (
        new_buckets.join(
            base_buckets.select("band", "bucket").distinct(), ["band", "bucket"]
        )
        .select("doc_id")
        .distinct()
    )
    return (
        new_buckets.select("doc_id")
        .distinct()
        .join(hits, "doc_id", "left_anti")
    )
