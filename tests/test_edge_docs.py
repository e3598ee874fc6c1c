"""Edge-case documents (empty / 1-word / 2-word) through the text
operators. Spark 4 runs in ANSI mode: before the try_element_at /
zero-guard fixes these raised ARRAY_INDEX_OUT_OF_BOUNDS (word_trigrams
past the array end) and DIVIDE_BY_ZERO (punct_ratio on an empty doc).
"""

from __future__ import annotations

from lintdb_spark.operators import dedup, textstats


def _edge_docs(spark):
    rows = [
        (1, ""),
        (2, "one"),
        (3, "one two"),
        (4, "one two three four five"),
        (5, "..."),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_trigrams_short_docs_no_ansi_error(spark):
    docs = _edge_docs(spark)
    sh = dedup.doc_shingles(docs)
    rows = {(r.doc_id, r.shingle) for r in sh.collect()}
    # <3-word docs degrade to a single short-gram (concat_ws NULL-skip)
    assert (2, "one") in rows
    assert (3, "one two") in rows
    assert (4, "one two three") in rows and (4, "three four five") in rows


def test_minhash_lsh_jaccard_on_short_docs(spark):
    docs = _edge_docs(spark)
    sh = dedup.doc_shingles(docs)
    sig = dedup.minhash_signatures(sh, num_perms=4)
    assert sig.count() > 0
    buckets = dedup.lsh_buckets(sig, bands=2, num_perms=4)
    dedup.lsh_candidate_pairs(buckets).collect()  # must not raise
    dedup.jaccard_pairs(sh, min_overlap=1).collect()  # must not raise


def test_text_stats_empty_doc_zero_guard(spark):
    docs = _edge_docs(spark)
    out = {r.doc_id: r for r in textstats.text_stats(docs).collect()}
    assert out[1].punct_ratio == 0.0
    # split('') -> [''] so n_tokens=1 -> quality = min(1, 1/100) * 1
    assert out[1].quality_score == 0.01
    assert out[5].punct_ratio == 1.0


def test_lsh_buckets_wide_matches_long_path(spark):
    """lsh_buckets_wide (in-row banding off the wide signature table)
    must be byte-identical to lsh_buckets over the unpivoted
    signatures — the two serve paths of the same stored artifact."""
    import pandas as pd

    from lintdb_spark.operators import dedup

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(8),
                "text": [
                    f"alpha beta gamma delta {i} epsilon zeta eta theta" for i in range(8)
                ],
            }
        )
    )
    sh = dedup.doc_shingles(docs)
    wide = dedup.minhash_wide(sh, num_perms=8)
    long_sig = dedup.signatures_from_wide(wide, num_perms=8)
    a = {
        (r["doc_id"], r["band"]): r["bucket"]
        for r in dedup.lsh_buckets(long_sig, bands=4, num_perms=8).collect()
    }
    b = {
        (r["doc_id"], r["band"]): r["bucket"]
        for r in dedup.lsh_buckets_wide(wide, bands=4, num_perms=8).collect()
    }
    assert a == b and len(a) == 8 * 4
    # and the unpivot agrees with the one-shot signature builder
    c = {
        (r["doc_id"], r["perm"]): r["minhash"]
        for r in dedup.minhash_signatures(sh, num_perms=8).collect()
    }
    d = {(r["doc_id"], r["perm"]): r["minhash"] for r in long_sig.collect()}
    assert c == d
