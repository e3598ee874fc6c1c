"""Residual quantizers: Identity (NONE), Binarizer (PLAID-style), and
Product Quantizer — numpy implementations wrapped in Arrow-batched
pandas UDFs for the distributed encode/decode paths.

Reference behavior being matched (SURVEY.md §2.E):
- Binarizer (lintdb/quantizers/Binarizer.cpp): train = quantile
  bucket_cutoffs over residual values + bucket_weights (bucket
  midpoints); encode = per-dim bucketize then big-endian packbits to
  dim*nbits/8 bytes; decode = unpack + weight LUT. Round-trip
  property: decode(encode(x))[i] == bucket_weights[bucket(x[i])].
- ProductEncoder (lintdb/quantizers/ProductEncoder.cpp): m
  subquantizers x 2^nbits codebooks, nearest-codebook per subspace,
  packed codes of ceil(m*nbits/8) bytes (faiss sa_code_size). faiss
  IndexPQ assigns codes by L2 even under METRIC_INNER_PRODUCT (the
  metric only affects its search-time distance tables, vestigial in
  the reference), so L2 assignment IS the parity behavior; an "ip"
  assignment option exists besides it.
- Training subsampling (lintdb/index.cpp:256-280): sqrt(n) sample of
  residuals is collected to the driver — same strategy the reference
  uses; encode/decode stay fully distributed.

Codes are stored as BinaryType; all quantizers are round-trip pure
numpy so they are property-testable without Spark.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np


@dataclass
class BinarizerParams:
    dim: int
    nbits: int
    bucket_cutoffs: list[float]  # len 2^nbits - 1
    bucket_weights: list[float]  # len 2^nbits
    avg_residual: float

    def to_json(self) -> str:
        return json.dumps(
            {
                "kind": "binarizer",
                "dim": self.dim,
                "nbits": self.nbits,
                "bucket_cutoffs": self.bucket_cutoffs,
                "bucket_weights": self.bucket_weights,
                "avg_residual": self.avg_residual,
            }
        )


class Binarizer:
    """PLAID residual binarizer. code_size = dim*nbits/8 bytes
    (Binarizer.cpp:384-386: 128-dim, nbits=1 -> 16 B)."""

    def __init__(self, params: BinarizerParams):
        self.p = params
        self._cutoffs = np.asarray(params.bucket_cutoffs, dtype=np.float32)
        self._weights = np.asarray(params.bucket_weights, dtype=np.float32)

    @property
    def code_size(self) -> int:
        return self.p.dim * self.p.nbits // 8

    @classmethod
    def train(cls, residuals: np.ndarray, nbits: int) -> "Binarizer":
        """Quantile training over all residual values
        (Binarizer.cpp:186-231): cutoffs at i/2^nbits quantiles,
        weights at (i+0.5)/2^nbits quantiles (bucket midpoints).

        Deliberate deviation: the reference places weights at the
        i/2^nbits quantiles — its own '+ 0.5f/num_options' midpoint
        offset is commented out (Binarizer.cpp:208) — which makes each
        weight the *left edge* of its bucket and biases reconstruction
        low. We use the midpoint the reference evidently intended;
        round-trip semantics (decode(encode(x))[i] ==
        bucket_weights[bucket(x[i])]) are unchanged."""
        assert residuals.ndim == 2
        dim = residuals.shape[1]
        assert (dim * nbits) % 8 == 0, "dim*nbits must be byte-aligned"
        vals = residuals.astype(np.float32).ravel()
        n_buckets = 1 << nbits
        qs_cut = np.arange(1, n_buckets) / n_buckets
        qs_w = (np.arange(n_buckets) + 0.5) / n_buckets
        cutoffs = np.quantile(vals, qs_cut).astype(np.float32)
        weights = np.quantile(vals, qs_w).astype(np.float32)
        avg = float(np.mean(np.abs(vals)))
        return cls(
            BinarizerParams(dim, nbits, cutoffs.tolist(), weights.tolist(), avg)
        )

    def bucketize(self, x: np.ndarray) -> np.ndarray:
        return np.digitize(x.astype(np.float32), self._cutoffs, right=False)

    def encode(self, tokens: np.ndarray) -> bytes:
        """(n_tokens, dim) float32 -> packed big-endian bits, token-major."""
        codes = self.bucketize(tokens)  # (n, dim) ints in [0, 2^nbits)
        nb = self.p.nbits
        # expand each code into nbits bits, MSB first (big-endian packbits,
        # matching the reference's byte layout)
        bits = ((codes[..., None] >> np.arange(nb - 1, -1, -1)) & 1).astype(np.uint8)
        return np.packbits(bits.reshape(codes.shape[0], -1), axis=1, bitorder="big").tobytes()

    def decode(self, blob: bytes, num_tokens: int) -> np.ndarray:
        """packed bytes -> (num_tokens, dim) float32 of bucket weights."""
        nb = self.p.nbits
        dim = self.p.dim
        raw = np.frombuffer(blob, dtype=np.uint8).reshape(num_tokens, dim * nb // 8)
        bits = np.unpackbits(raw, axis=1, bitorder="big").reshape(num_tokens, dim, nb)
        codes = np.zeros((num_tokens, dim), dtype=np.int64)
        for b in range(nb):
            codes = (codes << 1) | bits[:, :, b]
        return self._weights[codes]


@dataclass
class PQParams:
    dim: int
    num_subquantizers: int
    nbits: int
    codebooks: list  # (m, 2^nbits, dim/m) nested lists
    metric: str = "l2"  # codebook-assignment metric: "l2" | "ip"

    def to_json(self) -> str:
        return json.dumps(
            {
                "kind": "product",
                "dim": self.dim,
                "num_subquantizers": self.num_subquantizers,
                "nbits": self.nbits,
                "codebooks": self.codebooks,
                "metric": self.metric,
            }
        )


def _lloyd(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Tiny deterministic k-means (the reference delegates to Faiss
    Clustering — kmeans.cpp:11-35; we only need it for PQ codebooks on
    a sqrt(n) driver-side sample)."""
    rng = np.random.RandomState(seed)
    if len(x) < k:
        reps = -(-k // len(x))
        x = np.tile(x, (reps, 1))
    centers = x[rng.choice(len(x), size=k, replace=False)].astype(np.float32).copy()
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            m = assign == j
            if m.any():
                centers[j] = x[m].mean(0)
    return centers


class ProductQuantizer:
    """PQ with faiss-IndexPQ parity (ProductEncoder.cpp:13-91):
    variable nbits with packed codes (code_size = ceil(m*nbits/8)
    bytes/token, the faiss sa_code_size), per-subspace codebooks.

    Assignment metric: faiss IndexPQ encodes by L2 nearest codebook
    entry EVEN under METRIC_INNER_PRODUCT (the metric only shapes the
    search-time distance tables, which are vestigial in the reference —
    SURVEY §2.D D11) — so metric="l2" is the parity default; "ip"
    (argmax dot) is available for experimentation."""

    def __init__(self, params: PQParams):
        self.p = params
        self._books = np.asarray(params.codebooks, dtype=np.float32)  # (m, k, ds)

    @property
    def code_size(self) -> int:
        # ceil(m * nbits / 8) bytes per token (faiss sa_code_size)
        return (self.p.num_subquantizers * self.p.nbits + 7) // 8

    @classmethod
    def train(
        cls,
        residuals: np.ndarray,
        m: int,
        nbits: int = 8,
        iters: int = 10,
        seed: int = 42,
        metric: str = "l2",
    ) -> "ProductQuantizer":
        dim = residuals.shape[1]
        assert dim % m == 0, "dim must divide num_subquantizers"
        assert 1 <= nbits <= 8, "nbits in [1, 8]"
        ds = dim // m
        k = 1 << nbits
        books = np.stack(
            [
                _lloyd(residuals[:, i * ds : (i + 1) * ds].astype(np.float32), k, iters, seed + i)
                for i in range(m)
            ]
        )
        return cls(PQParams(dim, m, nbits, books.tolist(), metric))

    def _assign(self, tokens: np.ndarray) -> np.ndarray:
        """(n, dim) -> (n, m) codebook indices."""
        m, ds = self.p.num_subquantizers, self.p.dim // self.p.num_subquantizers
        out = np.empty((tokens.shape[0], m), dtype=np.int64)
        for i in range(m):
            sub = tokens[:, i * ds : (i + 1) * ds].astype(np.float32)
            if self.p.metric == "ip":
                out[:, i] = (sub @ self._books[i].T).argmax(1)
            else:
                d = ((sub[:, None, :] - self._books[i][None, :, :]) ** 2).sum(-1)
                out[:, i] = d.argmin(1)
        return out

    def encode(self, tokens: np.ndarray) -> bytes:
        """(n, dim) -> packed codes, nbits per subquantizer index,
        MSB-first within each index, byte-aligned per TOKEN (so blobs
        slice cleanly at code_size boundaries)."""
        codes = self._assign(tokens)
        nb = self.p.nbits
        bits = ((codes[..., None] >> np.arange(nb - 1, -1, -1)) & 1).astype(np.uint8)
        return np.packbits(
            bits.reshape(codes.shape[0], -1), axis=1, bitorder="big"
        ).tobytes()

    def unpack_codes(self, blob: bytes, num_tokens: int) -> np.ndarray:
        """Packed blob -> (num_tokens, m) codebook indices (the inverse
        of encode's packbits; no float reconstruction)."""
        m, nb = self.p.num_subquantizers, self.p.nbits
        raw = np.frombuffer(blob, dtype=np.uint8).reshape(num_tokens, self.code_size)
        bits = np.unpackbits(raw, axis=1, bitorder="big")[:, : m * nb].reshape(
            num_tokens, m, nb
        )
        codes = np.zeros((num_tokens, m), dtype=np.int64)
        for b in range(nb):
            codes = (codes << 1) | bits[:, :, b]
        return codes

    def decode(self, blob: bytes, num_tokens: int) -> np.ndarray:
        m, ds = self.p.num_subquantizers, self.p.dim // self.p.num_subquantizers
        codes = self.unpack_codes(blob, num_tokens)
        out = np.empty((num_tokens, self.p.dim), dtype=np.float32)
        for i in range(m):
            out[:, i * ds : (i + 1) * ds] = self._books[i][codes[:, i]]
        return out

    def inner_prod_tables(self, queries: np.ndarray) -> np.ndarray:
        """ADC distance tables (PQDistanceTables.cpp:10-26 /
        faiss pq.compute_inner_prod_table): for each query token a
        (m, 2^nbits) table T with T[i, c] = <q[i*ds:(i+1)*ds],
        books[i][c]>, so that the residual's inner product with q is
        sum_i T[i, code_i] — no float reconstruction needed.
        Returns (n_queries, m, 2^nbits) float32."""
        m, ds = self.p.num_subquantizers, self.p.dim // self.p.num_subquantizers
        q = np.asarray(queries, dtype=np.float32)
        # (n, m, ds) x (m, k, ds) -> (n, m, k)
        return np.einsum(
            "nmd,mkd->nmk", q.reshape(q.shape[0], m, ds), self._books
        ).astype(np.float32)


class HalfQuantizer:
    """float16 storage (reference: TENSOR_FLOAT16 / half.h vendored
    half implementation, DataTypes.h:29-40 + api.h:14). Spark has no
    fp16 column type, so halves live as packed bytes: 2 bytes/dim,
    decode upcasts to float32. Lossy by ~1e-3 relative — the standard
    fp16 storage trade."""

    def __init__(self, dim: int):
        self.dim = dim

    @property
    def code_size(self) -> int:
        return self.dim * 2

    def encode(self, tokens: np.ndarray) -> bytes:
        return np.ascontiguousarray(tokens, dtype=np.float16).tobytes()

    def decode(self, blob: bytes, num_tokens: int) -> np.ndarray:
        return (
            np.frombuffer(blob, dtype=np.float16)
            .reshape(num_tokens, self.dim)
            .astype(np.float32)
        )


class IdentityQuantizer:
    """QuantizerType.NONE passthrough (lintdb/quantizers/io.cpp:9-12):
    residual float32 bytes stored raw."""

    def __init__(self, dim: int):
        self.dim = dim

    @property
    def code_size(self) -> int:
        return self.dim * 4

    def encode(self, tokens: np.ndarray) -> bytes:
        return np.ascontiguousarray(tokens, dtype=np.float32).tobytes()

    def decode(self, blob: bytes, num_tokens: int) -> np.ndarray:
        return np.frombuffer(blob, dtype=np.float32).reshape(num_tokens, self.dim).copy()


def quantizer_from_json(s: str):
    raw = json.loads(s)
    if raw["kind"] == "binarizer":
        return Binarizer(
            BinarizerParams(
                raw["dim"], raw["nbits"], raw["bucket_cutoffs"], raw["bucket_weights"], raw["avg_residual"]
            )
        )
    if raw["kind"] == "product":
        return ProductQuantizer(
            PQParams(
                raw["dim"],
                raw["num_subquantizers"],
                raw["nbits"],
                raw["codebooks"],
                raw.get("metric", "l2"),
            )
        )
    if raw["kind"] == "identity":
        return IdentityQuantizer(raw["dim"])
    if raw["kind"] == "half":
        return HalfQuantizer(raw["dim"])
    raise ValueError(f"unknown quantizer kind {raw['kind']}")


def quantizer_to_json(q) -> str:
    if isinstance(q, IdentityQuantizer):
        return json.dumps({"kind": "identity", "dim": q.dim})
    if isinstance(q, HalfQuantizer):
        return json.dumps({"kind": "half", "dim": q.dim})
    return q.p.to_json()
