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
