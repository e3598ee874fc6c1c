"""Round-8: incrementally-maintained dedup artifact store.

The core claim under test is EXACTNESS: a store fed the corpus in
several batches must serve byte-identical artifacts to a from-scratch
build over the full corpus — signatures, df-capped shingles, candidate
pairs, verified pairs, and the cluster map. Plus the Index-grade
commit discipline: atomic flips, idempotent streaming replay, and the
cross-corpus dedup gate reading off the maintained tables."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lintdb_spark.operators import dedup
from lintdb_spark.operators.artifacts import DedupArtifacts
from lintdb_spark.tables import load_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").persist()
    )


@pytest.fixture(scope="module")
def store3(spark, corpus, tmp_path_factory):
    """A store fed the corpus in THREE batches (uneven split)."""
    path = str(tmp_path_factory.mktemp("artifacts") / "store")
    st = DedupArtifacts.create(spark, path)
    b1 = corpus.filter(F.col("doc_id") % 5 < 2)
    b2 = corpus.filter(F.col("doc_id") % 5 == 2)
    b3 = corpus.filter(F.col("doc_id") % 5 > 2)
    for b in (b1, b2, b3):
        st.update(b)
    return st


def test_incremental_equals_scratch_signatures(spark, corpus, store3):
    wide_all = dedup.minhash_wide(dedup.doc_shingles(corpus))
    cols = wide_all.columns
    assert _rows(store3.signatures(), cols) == _rows(wide_all, cols)


def test_incremental_equals_scratch_capped_shingles(spark, corpus, store3):
    scratch = dedup.df_capped_shingles(dedup.doc_shingles(corpus))
    assert _rows(store3.capped_shingles(), ["doc_id", "shingle"]) == _rows(
        scratch, ["doc_id", "shingle"]
    )


def test_incremental_equals_scratch_pairs_and_clusters(spark, corpus, store3):
    sh_all = dedup.doc_shingles(corpus).persist()
    wide_all = dedup.minhash_wide(sh_all).persist()
    try:
        scratch_cand = dedup.lsh_candidate_pairs(dedup.lsh_buckets_wide(wide_all))
        assert _rows(store3.candidate_pairs(), ["doc_a", "doc_b"]) == _rows(
            scratch_cand, ["doc_a", "doc_b"]
        )
        capped = dedup.df_capped_shingles(sh_all).persist()
        scratch_ver = dedup.jaccard_verify_pairs(
            capped, dedup.lsh_buckets_wide(wide_all), min_jaccard=0.2
        )
        got_ver = store3.verified_pairs(min_jaccard=0.2)
        cols = ["doc_a", "doc_b", "n_common", "jaccard"]
        assert _rows(got_ver, cols) == _rows(scratch_ver, cols)
        assert _rows(
            store3.cluster_map(min_jaccard=0.2), ["doc_id", "cluster_id"]
        ) == _rows(dedup.dup_clusters(scratch_ver), ["doc_id", "cluster_id"])
        capped.unpersist()
    finally:
        sh_all.unpersist()
        wide_all.unpersist()


def test_update_is_idempotent_and_skips_known_docs(spark, corpus, tmp_path):
    path = str(tmp_path / "store_idem")
    st = DedupArtifacts.create(spark, path)
    b1 = corpus.limit(40)
    r1 = st.update(b1, idempotency_token=("src", 0))
    assert r1["docs"] > 0
    # replayed token -> full no-op, no new segments
    segs_before = {t: list(st._segments(t)) for t in st.TABLES}
    r2 = st.update(b1, idempotency_token=("src", 0))
    assert r2 == {"docs": 0, "pairs": 0, "replayed": True}
    assert {t: list(st._segments(t)) for t in st.TABLES} == segs_before
    # same docs WITHOUT a token -> anti-join drops them all
    r3 = st.update(b1)
    assert r3["docs"] == 0
    assert st._meta["n_docs"] == r1["docs"]


def test_dedup_gate_reads_stored_corpus(spark, corpus, store3):
    # every stored doc collides with itself (identical signature in
    # all bands) -> the gate drops the whole replayed corpus
    survivors = store3.dedup_gate(corpus)
    assert survivors.count() == 0
    # genuinely novel docs survive
    novel = spark.createDataFrame(
        [
            (10_000_001, "zzqx unique alpha beta gamma delta epsilon zeta eta theta"),
            (10_000_002, "completely different words about submarine volcano physics"),
        ],
        "doc_id long, text string",
    )
    assert survivors.sparkSession is spark
    got = {r.doc_id for r in store3.dedup_gate(novel).collect()}
    assert got == {10_000_001, 10_000_002}


def test_cross_process_reader_follows_commits(spark, corpus, tmp_path):
    path = str(tmp_path / "store_xproc")
    w = DedupArtifacts.create(spark, path)
    w.update(corpus.limit(30))
    reader = DedupArtifacts.load(spark, path)
    n1 = reader.signatures().count()
    # a second writer process (simulated: separate object) commits more
    w2 = DedupArtifacts.load(spark, path)
    w2.update(corpus.filter(F.col("doc_id") >= 200).limit(20))
    # the reader's next read picks up the external commit via the
    # meta-stat staleness refresh — no reload needed
    assert reader.signatures().count() > n1
    assert reader._meta["n_docs"] == w2._meta["n_docs"]


def test_stream_artifacts_maintains_store(spark, corpus, tmp_path):
    """The verdict's done-criterion: a persisted signature/bucket table
    maintained across streaming micro-batches, with cross-dedup-style
    queries serving from it unchanged."""
    import os

    from lintdb_spark.streaming.ingest import stream_artifacts

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    ckpt = str(tmp_path / "ckpt")
    path = str(tmp_path / "store_stream")
    st = DedupArtifacts.create(spark, path)

    half1 = corpus.filter(F.col("doc_id") % 2 == 0).limit(50)
    half2 = corpus.filter(F.col("doc_id") % 2 == 1).limit(50)
    half1.write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src_dir)
    stream_artifacts(st, stream, ckpt).awaitTermination(120)
    n_after_1 = st.signatures().count()
    assert n_after_1 == half1.count()

    half2.write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src_dir)
    stream_artifacts(st, stream, ckpt).awaitTermination(120)
    assert st.signatures().count() == n_after_1 + half2.count()

    # artifacts serve identically to a from-scratch build of the union
    union = half1.unionByName(half2)
    wide_all = dedup.minhash_wide(dedup.doc_shingles(union))
    assert _rows(st.signatures(), wide_all.columns) == _rows(
        wide_all, wide_all.columns
    )


def test_compact_preserves_artifacts_and_prunes_segments(spark, corpus, tmp_path):
    """compact(): per-batch segments collapse to one v<N> per table
    (df pre-aggregated to vocab size, pairs deduped), reads unchanged,
    vacuum reclaims the superseded dirs, and further updates append to
    the compacted base correctly."""
    import os

    path = str(tmp_path / "store_compact")
    st = DedupArtifacts.create(spark, path)
    b1 = corpus.filter(F.col("doc_id") % 3 == 0)
    b2 = corpus.filter(F.col("doc_id") % 3 == 1)
    b3 = corpus.filter(F.col("doc_id") % 3 == 2)
    st.update(b1)
    st.update(b2)
    before = {
        "sig": _rows(st.signatures(), ["doc_id", "m0", "m15"]),
        "capped": _rows(st.capped_shingles(), ["doc_id", "shingle"]),
        "cand": _rows(st.candidate_pairs(), ["doc_a", "doc_b"]),
    }
    assert len(st._segments("signatures")) == 2
    st.compact()
    assert all(len(st._segments(t)) == 1 for t in st.TABLES)
    removed = st.vacuum(min_age_s=0)
    assert any(r.startswith("signatures/seg-") for r in removed)
    assert before == {
        "sig": _rows(st.signatures(), ["doc_id", "m0", "m15"]),
        "capped": _rows(st.capped_shingles(), ["doc_id", "shingle"]),
        "cand": _rows(st.candidate_pairs(), ["doc_a", "doc_b"]),
    }
    # df table is now vocab-sized (one row per shingle)
    df_tbl = st._read("df", None)
    assert df_tbl.count() == df_tbl.select("shingle").distinct().count()

    # post-compaction update still accumulates exactly
    st.update(b3)
    wide_all = dedup.minhash_wide(dedup.doc_shingles(corpus))
    assert _rows(st.signatures(), ["doc_id", "m0", "m15"]) == _rows(
        wide_all, ["doc_id", "m0", "m15"]
    )
    scratch_cand = dedup.lsh_candidate_pairs(
        dedup.lsh_buckets_wide(wide_all)
    )
    assert _rows(st.candidate_pairs(), ["doc_a", "doc_b"]) == _rows(
        scratch_cand, ["doc_a", "doc_b"]
    )
    assert os.path.exists(os.path.join(path, "signatures", "v1"))
