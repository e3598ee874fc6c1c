"""lintdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of DeployQL/LintDB (late-interaction /
ColBERT-style multi-vector retrieval), re-expressed Spark-first.

The reference (read-only at /root/reference) is an embedded C++ vector
database: RocksDB storage, Faiss clustering, boolean filter algebra
(TERM/AND/OR/VECTOR) and a two-phase PLAID -> MaxSim ranking cascade
(see SURVEY.md). This package rebuilds those capabilities as DataFrame
plans that Catalyst can optimize: parquet tables instead of column
families, partition pruning instead of key-prefix scans, broadcast
joins instead of point lookups, and `orderBy().limit()` instead of
heap top-k.

Nothing here is a port: no reference code is copied; file:line
citations in docstrings point at the behavior being matched.
"""

from lintdb_spark.session import get_spark
from lintdb_spark.tables import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
