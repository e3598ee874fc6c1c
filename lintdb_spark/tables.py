"""Test-data table loaders.

The driver materializes TPC-H-ish tables plus ``documents`` (text corpus)
and ``embeddings`` (vec_id, embedding float[64], label) at
/root/testdata/sf*/ (TESTDATA.md). Everything in the engine reads
through here so the physical source can later be swapped for
partitioned/bucketed layouts without touching operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) (Spark's parquet
        # reader rejects it — read nanos as long and convert; µs
        # truncation matches DuckDB's epoch_us on TIMESTAMP_NS) and as
        # timestamp[us] without timezone, which Spark 4.1 reads as
        # TIMESTAMP_NTZ. Normalize both to TIMESTAMP: the session TZ is
        # UTC, so the NTZ→TZ cast is value-preserving and keeps
        # unix_micros / watermarks (TIMESTAMP-only) working.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() mirrors the
    DuckDB oracle environment (same table names)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
