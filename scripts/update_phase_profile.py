#!/usr/bin/env python
"""Round-15: wall-clock phase attribution for ONE DedupArtifacts.update
— wraps the store's internal methods with timers to split the update
into plan-construction / bookkeeping-jobs / pair-stats / commit phases.

Usage: python scripts/update_phase_profile.py
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

TIMES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def wrap(obj, name: str) -> None:
    orig = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        try:
            return orig(*a, **k)
        finally:
            TIMES[name] = TIMES.get(name, 0.0) + (time.perf_counter() - t0)
            COUNTS[name] = COUNTS.get(name, 0) + 1

    setattr(obj, name, timed)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("update_phase_profile", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    tmp = tempfile.mkdtemp(prefix="phase_prof_")
    st = DedupArtifacts.create(spark, tmp + "/store")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    st.update(docs.filter(F.col("doc_id") % 2 == 0))

    batch = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .limit(500)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000_000)
    )

    for name in (
        "_stage_pair_stats",
        "_stage_pair_stats_point",
        "_write_segment",
        "_commit_segments",
        "_save_meta",
        "_known_doc_ids",
        "_staged_rows",
        "_drop_empty_flip_segments",
    ):
        wrap(st, name)

    t0 = time.perf_counter()
    st.update(batch)
    wall = time.perf_counter() - t0
    print(f"update wall: {wall:.2f}s")
    for k in sorted(TIMES, key=lambda k: -TIMES[k]):
        print(f"  {k:28s} {TIMES[k]:7.2f}s  x{COUNTS[k]}")
    other = wall - TIMES.get("_stage_pair_stats", 0) - TIMES.get(
        "_commit_segments", 0
    )
    print(f"  (driver residue outside pair-stats+commit: {other:.2f}s;"
          f" _write_segment runs on the pool — overlapped)")
    spark.stop()


if __name__ == "__main__":
    main()
