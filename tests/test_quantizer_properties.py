"""Hypothesis property tests for the quantizers (pure numpy — fast).

Mirrors the reference's oracle-test philosophy (tests/plaid_test.cpp:
independent reimplementation checked against the production path) with
randomized inputs instead of fixed fixtures.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from lintdb_spark.index.quantizers import Binarizer, IdentityQuantizer, ProductQuantizer

DIM = 16

finite_floats = st.floats(
    min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False, width=32
)


@settings(max_examples=25, deadline=None)
@given(
    train=arrays(np.float32, (64, DIM), elements=finite_floats),
    x=arrays(np.float32, (5, DIM), elements=finite_floats),
    nbits=st.sampled_from([1, 2]),
)
def test_binarizer_decode_is_bucket_weight(train, x, nbits):
    b = Binarizer.train(train, nbits)
    dec = b.decode(b.encode(x), x.shape[0])
    expected = np.asarray(b.p.bucket_weights, dtype=np.float32)[b.bucketize(x)]
    np.testing.assert_array_equal(dec, expected)
    # codes are within range and encoding is deterministic
    assert b.encode(x) == b.encode(x)
    assert len(b.encode(x)) == x.shape[0] * b.code_size


@settings(max_examples=25, deadline=None)
@given(
    train=arrays(np.float32, (64, DIM), elements=finite_floats),
    x=arrays(np.float32, (4, DIM), elements=finite_floats),
)
def test_binarizer_monotone_and_idempotent(train, x):
    b = Binarizer.train(train, 2)
    cuts = b.p.bucket_cutoffs
    assert all(cuts[i] <= cuts[i + 1] for i in range(len(cuts) - 1))
    # re-encoding a decoded vector is stable (decode lands inside buckets)
    once = b.decode(b.encode(x), x.shape[0])
    twice = b.decode(b.encode(once), x.shape[0])
    np.testing.assert_allclose(once, twice, atol=1e-6)


@settings(max_examples=15, deadline=None)
@given(
    train=arrays(np.float32, (64, DIM), elements=finite_floats),
    x=arrays(np.float32, (6, DIM), elements=finite_floats),
)
def test_pq_reconstruction_not_worse_than_farthest_codebook(train, x):
    pq = ProductQuantizer.train(train, m=4, iters=3)
    dec = pq.decode(pq.encode(x), x.shape[0])
    # per subspace, chosen codebook entry must be the argmin-L2 one
    ds = DIM // 4
    for i in range(4):
        sub = x[:, i * ds : (i + 1) * ds]
        rec = dec[:, i * ds : (i + 1) * ds]
        books = pq._books[i]
        d_chosen = ((sub - rec) ** 2).sum(-1)
        d_all = ((sub[:, None, :] - books[None, :, :]) ** 2).sum(-1)
        assert np.all(d_chosen <= d_all.min(1) + 1e-4)


@settings(max_examples=25, deadline=None)
@given(x=arrays(np.float32, (3, DIM), elements=finite_floats))
def test_identity_roundtrip_exact(x):
    q = IdentityQuantizer(DIM)
    np.testing.assert_array_equal(q.decode(q.encode(x), 3), x)


# ---- data-pipeline operator properties (non-oracle invariants) ----


def test_fingerprints_detect_shared_passage(spark):
    """Two docs sharing a k-token passage share the passage's sampled
    fingerprints (same fp value, different pos) — the property that
    makes groupBy(fp) find copied spans."""
    from pyspark.sql import functions as F

    from lintdb_spark.operators.textstats import rolling_fingerprints

    passage = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, "aa bb " + passage),
            (2, passage + " zz"),
            (3, "unrelated words only here none shared at all"),
        ],
        "doc_id long, text string",
    )
    fps = rolling_fingerprints(docs)
    shared = (
        fps.filter(F.col("doc_id") == 1)
        .select("fp")
        .join(fps.filter(F.col("doc_id") == 2).select("fp"), "fp")
        .count()
    )
    assert shared > 0  # 40-token passage yields ~37/8 sampled windows
    cross = (
        fps.filter(F.col("doc_id") == 3)
        .select("fp")
        .join(fps.filter(F.col("doc_id") != 3).select("fp"), "fp")
        .count()
    )
    assert cross == 0


def test_lsh_neardup_exact_duplicates_always_collide(spark):
    """cos=1 vectors get identical sign bits in every band, so exact
    duplicates are guaranteed candidates — LSH recall loss only affects
    boundary pairs, never true copies."""
    import numpy as np

    from lintdb_spark.operators.dedup import embedding_lsh_neardup

    rng = np.random.RandomState(7)
    base = [[float(x) for x in rng.randn(64)] for _ in range(20)]
    rows = [(i, base[i]) for i in range(20)]
    rows += [(100 + i, base[i]) for i in range(5)]  # exact dups of 0..4
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_lsh_neardup(emb, threshold=0.99).collect()
    }
    assert all((i, 100 + i) in pairs for i in range(5))


def test_token_counts_hand_checked(spark):
    from lintdb_spark.operators.textstats import token_counts

    docs = spark.createDataFrame(
        [(1, "Hello world, 42 times!"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_counts(docs).collect()}
    # regex tokens: Hello | world | , | 42 | times | !  -> 6
    assert got[1]["n_ws_tokens"] == 4
    assert got[1]["n_regex_tokens"] == 6
    # ceil(len/4): 2 + 2 + 1 + 1 + 2 + 1 = 9
    assert got[1]["n_subword_est"] == 9
    assert got[2]["n_regex_tokens"] == 0 and got[2]["n_subword_est"] == 0
