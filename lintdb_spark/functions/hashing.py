"""Driver-side twin of Spark's ``xxhash64`` for BIGINT inputs.

The artifact store's partition-layout keys (dpart/bpart) are
``pmod(xxhash64(col), parts)``. The streaming point-update path makes
its pruning decisions from driver-side collected id lists, and paying
a whole Spark job (~0.5 s of fixed scheduling at local[32], the same
at cluster scale) just to evaluate a hash over ≤ a few hundred longs
dominated the per-batch cost profile. This module reimplements the
same public XXH64 algorithm (Collet's xxHash, as used by
``org.apache.spark.sql.catalyst.expressions.XxHash64`` with its
default seed 42) for 8-byte long input so those keys can be computed
in-process.

EXACTNESS MATTERS: a mismatch with the JVM value would make partition
pruning silently drop rows (e.g. the known-doc anti-join would miss a
stored doc and re-ingest it). tests/test_artifacts.py pins parity
against Spark's own xxhash64 over adversarial and random longs; do
not change constants without re-running it.
"""
from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_long(value: int, seed: int = 42) -> int:
    """XXH64 of one 8-byte little-endian block (a Spark BIGINT),
    returned as a SIGNED 64-bit int — bit-for-bit what Spark's
    ``xxhash64(col)`` yields for a non-null BIGINT column."""
    v = value & _M64  # two's-complement bytes of the long
    h = (seed + _P5 + 8) & _M64
    k1 = (v * _P2) & _M64
    k1 = (_rotl(k1, 31) * _P1) & _M64
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_xxhash64_long(value: int, parts: int, seed: int = 42) -> int:
    """``pmod(xxhash64(value), parts)`` — the artifact-store partition
    key for a BIGINT id, computed driver-side."""
    return xxhash64_long(value, seed) % parts
