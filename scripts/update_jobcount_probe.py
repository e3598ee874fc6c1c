#!/usr/bin/env python
"""Round-16 probe: Spark JOB COUNT of one seed commit and one timed
update in the bench's artifact_update scenario (load-insensitive
evidence for the single-pass staging change).

Usage: python scripts/update_jobcount_probe.py
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.operators.artifacts import DedupArtifacts  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("update_jobcount", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    store = spark.sparkContext._jsc.sc().statusStore()

    def njobs() -> int:
        return store.jobsList(None).size()

    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    tmp = tempfile.mkdtemp(prefix="jobcount_upd_")
    st = DedupArtifacts.create(spark, tmp + "/store")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    j0, t0 = njobs(), time.perf_counter()
    st.update(docs.filter(F.col("doc_id") % 2 == 0))
    j1, t1 = njobs(), time.perf_counter()
    print(f"seed:   {t1 - t0:6.2f}s jobs={j1 - j0}")

    batch = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .limit(500)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000_000)
    )
    j0, t0 = njobs(), time.perf_counter()
    st.update(batch)
    j1, t1 = njobs(), time.perf_counter()
    print(f"update: {t1 - t0:6.2f}s jobs={j1 - j0}")

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
