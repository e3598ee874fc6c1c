from lintdb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)

__all__ = ["dot_product", "cosine_similarity", "l2_norm", "l2_normalize"]
