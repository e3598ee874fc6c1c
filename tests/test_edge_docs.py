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
