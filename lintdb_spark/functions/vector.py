"""Vector math as Catalyst column expressions.

Everything here compiles to JVM higher-order functions (``zip_with`` /
``aggregate`` / ``transform``) — no Python UDFs, so these stay inside
whole-stage codegen and never cross the Arrow boundary. This replaces
the reference's BLAS calls (cblas_snrm2/sscal in lintdb/util.cpp:24-44,
sgemm MaxSim in lintdb/scoring/plaid.cpp:149-162) with expressions the
optimizer can pipeline.

Accumulation is in DOUBLE with left-to-right element order, matching
the DuckDB oracle's ``list_dot_product(CAST(.. AS DOUBLE[]), ..)`` so
cross-engine hashes agree after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Inner product of two float arrays, double accumulation."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Row-wise L2 normalization (reference: normalize_vector,
    lintdb/util.cpp:24-44). Zero vectors pass through unchanged."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
