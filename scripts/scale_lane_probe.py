#!/usr/bin/env python
"""Round-16: time the bench's scale-lane sections alone at a given
core count — validates that their sec@8/sec@32 ratio demonstrates
scale behavior (the r15 verdict's item 7). Mirrors bench.py's lane
exactly (x64 replication, repartition(64) before the crossJoin, 1 MB
AQE advisory partition size).

Usage: SPARK_GRAFT_CPUS=8 python scripts/scale_lane_probe.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.operators.dedup import (  # noqa: E402
    doc_shingles,
    lsh_buckets_wide,
    minhash_wide,
    substring_window_postings,
)
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "scale_lane_probe", cpus=cpus, shuffle_partitions=max(cpus, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    K = 64
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    reps = F.broadcast(spark.range(K).select(F.col("id").alias("rep")))
    docs_rep = (
        docs.repartition(64, "doc_id")
        .crossJoin(reps)
        .select(
            (F.col("doc_id") * K + F.col("rep")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" zscale"), F.col("rep").cast("string")
            ).alias("text"),
        )
    )
    for name, fn in (
        (
            "scale_minhash_lsh",
            lambda: noop(
                lsh_buckets_wide(minhash_wide(doc_shingles(docs_rep)))
            ),
        ),
        (
            "scale_substring_postings",
            lambda: noop(substring_window_postings(docs_rep)),
        ),
    ):
        best = None
        for _ in range(2):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"{name:28s} cpus={cpus} min={best:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
