"""Quantizer unit tests — numpy-only (no Spark), mirroring the
reference's binarizer_test.cpp / product_quantizer_test.cpp and the
round-trip property in FIXTURES.md §5."""

from __future__ import annotations

import numpy as np
import pytest

from lintdb_spark.index.quantizers import (
    Binarizer,
    HalfQuantizer,
    IdentityQuantizer,
    ProductQuantizer,
    quantizer_from_json,
    quantizer_to_json,
)

RNG = np.random.RandomState(42)


@pytest.mark.parametrize("nbits", [1, 2])
def test_binarizer_roundtrip_property(nbits):
    dim = 16
    res = RNG.randn(500, dim).astype(np.float32) * 0.1
    b = Binarizer.train(res, nbits)
    assert b.code_size == dim * nbits // 8

    x = RNG.randn(7, dim).astype(np.float32) * 0.1
    blob = b.encode(x)
    assert len(blob) == 7 * b.code_size
    dec = b.decode(blob, 7)
    # property: decode(encode(x))[i] == bucket_weights[bucket(x[i])]
    buckets = b.bucketize(x)
    expected = np.asarray(b.p.bucket_weights, dtype=np.float32)[buckets]
    np.testing.assert_array_equal(dec, expected)


def test_binarizer_cutoffs_monotone():
    res = RNG.randn(1000, 8).astype(np.float32)
    b = Binarizer.train(res, 2)
    cuts = b.p.bucket_cutoffs
    assert all(cuts[i] <= cuts[i + 1] for i in range(len(cuts) - 1))
    assert len(cuts) == 3 and len(b.p.bucket_weights) == 4


@pytest.mark.parametrize("nbits", [1, 4, 8])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_pq_roundtrip_better_than_zero(nbits, metric):
    dim, m = 16, 4
    res = RNG.randn(800, dim).astype(np.float32) * 0.2
    pq = ProductQuantizer.train(res, m, nbits=nbits, metric=metric)
    assert pq.code_size == (m * nbits + 7) // 8  # faiss sa_code_size
    x = res[:50]
    blob = pq.encode(x)
    assert len(blob) == 50 * pq.code_size
    dec = pq.decode(blob, 50)
    err = np.linalg.norm(dec - x) / np.linalg.norm(x)
    # reconstruction bound only for L2 assignment (the faiss-parity
    # path); "ip" optimizes dot product, not reconstruction — which is
    # exactly why faiss encodes by L2 even under METRIC_INNER_PRODUCT
    if metric == "l2":
        assert err < (0.9 if nbits > 1 else 1.1)  # 1-bit PQ is very coarse
    else:
        assert err < 1.5
    # codes are deterministic
    assert pq.encode(x) == pq.encode(x)


@pytest.mark.parametrize("nbits", [4, 8])
def test_pq_decode_matches_assignment(nbits):
    """decode(encode(x)) must reproduce exactly the assigned codebook
    entries (pack/unpack is lossless on the indices)."""
    dim, m = 16, 4
    res = RNG.randn(600, dim).astype(np.float32) * 0.2
    pq = ProductQuantizer.train(res, m, nbits=nbits)
    x = RNG.randn(9, dim).astype(np.float32) * 0.2
    codes = pq._assign(x)
    dec = pq.decode(pq.encode(x), 9)
    ds = dim // m
    for i in range(m):
        np.testing.assert_array_equal(
            dec[:, i * ds : (i + 1) * ds], pq._books[i][codes[:, i]]
        )


def test_pq_more_bits_reconstruct_better():
    dim, m = 16, 4
    res = RNG.randn(1500, dim).astype(np.float32) * 0.2
    errs = {}
    for nbits in (1, 4, 8):
        pq = ProductQuantizer.train(res, m, nbits=nbits)
        dec = pq.decode(pq.encode(res[:200]), 200)
        errs[nbits] = np.linalg.norm(dec - res[:200])
    assert errs[8] < errs[4] < errs[1]


def test_identity_exact():
    q = IdentityQuantizer(8)
    x = RNG.randn(5, 8).astype(np.float32)
    np.testing.assert_array_equal(q.decode(q.encode(x), 5), x)


def test_half_roundtrip_within_fp16_eps():
    q = HalfQuantizer(8)
    x = RNG.randn(5, 8).astype(np.float32)
    dec = q.decode(q.encode(x), 5)
    assert q.code_size == 16  # 2 bytes/dim
    np.testing.assert_allclose(dec, x, rtol=1e-3, atol=1e-4)
    # exact for values representable in fp16
    y = np.asarray([[0.5, -2.0, 1.25, 0.0, 3.0, -0.75, 8.0, 0.125]], dtype=np.float32)
    np.testing.assert_array_equal(q.decode(q.encode(y), 1), y)


def test_quantizer_json_roundtrip():
    res = RNG.randn(300, 8).astype(np.float32)
    for q in [
        Binarizer.train(res, 1),
        ProductQuantizer.train(res, 2),
        ProductQuantizer.train(res, 2, nbits=4),
        ProductQuantizer.train(res, 2, nbits=4, metric="ip"),
        IdentityQuantizer(8),
        HalfQuantizer(8),
    ]:
        q2 = quantizer_from_json(quantizer_to_json(q))
        x = RNG.randn(3, 8).astype(np.float32)
        np.testing.assert_array_equal(q.decode(q.encode(x), 3), q2.decode(q2.encode(x), 3))


@pytest.mark.parametrize("nbits", [4, 8])
def test_pq_adc_tables_match_decode_dot(nbits):
    """D11 parity: inner_prod_tables lookups summed over subquantizers
    must equal <q, decode(code)> exactly-ish (PQDistanceTables.cpp:
    28-43 — ADC is the same sum, just never reconstructed)."""
    dim, m = 16, 4
    res = RNG.randn(600, dim).astype(np.float32) * 0.3
    pq = ProductQuantizer.train(res, m, nbits=nbits)
    x = RNG.randn(9, dim).astype(np.float32)
    blob = pq.encode(x)
    codes = pq.unpack_codes(blob, 9)          # (9, m)
    dec = pq.decode(blob, 9)                  # (9, dim)
    Q = RNG.randn(5, dim).astype(np.float32)
    tab = pq.inner_prod_tables(Q)             # (5, m, 2^nbits)
    # explicit loop spelling (the UDF uses a flat fancy-index; here we
    # assert the math, not the vectorization)
    want = Q @ dec.T                          # (5, 9)
    got = np.zeros_like(want)
    for qi in range(5):
        for ti in range(9):
            got[qi, ti] = sum(tab[qi, i, codes[ti, i]] for i in range(m))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pq_unpack_codes_roundtrip():
    dim, m, nbits = 16, 4, 4
    res = RNG.randn(400, dim).astype(np.float32) * 0.3
    pq = ProductQuantizer.train(res, m, nbits=nbits)
    x = RNG.randn(13, dim).astype(np.float32)
    codes = pq.unpack_codes(pq.encode(x), 13)
    assert codes.shape == (13, m)
    assert codes.min() >= 0 and codes.max() < (1 << nbits)
    np.testing.assert_array_equal(codes, pq._assign(x))
