"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles skewed JOINs
automatically, but a skewed GROUP BY key still funnels one key's rows
into one reduce task. The classic fix is salting: pre-aggregate on
(key, salt) — spreading one hot key over ``salts`` tasks — then
finish on key. Worth it only for algebraic aggregates (sum/count/min/
max) where partial results compose.

Note: Spark's hash aggregate already does map-side partial combine,
which usually suffices; salting matters when the MAP side can't reduce
enough (high-cardinality sub-records per hot key surviving to the
shuffle, e.g. collect_list or many distinct groups per partition).
Provided here as the reusable building block + a measurable demo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salts: int = 16,
) -> DataFrame:
    """Two-phase sum/count per key: phase 1 aggregates on (key, salt)
    — the hot key's rows spread over ``salts`` reduce tasks — phase 2
    combines the partials on key alone (tiny shuffle: |keys| x salts
    rows). Returns (key..., total, n)."""
    salted = df.withColumn(
        "_salt", (F.floor(F.rand(seed=42) * salts)).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_psum"), F.count("*").alias("_pcnt")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").alias("total"),
        F.sum("_pcnt").cast("bigint").alias("n"),
    )
