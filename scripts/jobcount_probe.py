#!/usr/bin/env python
"""Round-15 probe: per-registry-query Spark JOB COUNTS, split into
construction-time jobs (actions run while REGISTRY[name](spark, sf)
builds the frame) and action-time jobs (the .count()).

Job counts are load-insensitive — valid even on a busy box — and
pinpoint queries that pay hidden driver round trips before their one
real action (guide §1.2 step 1: fewer passes).

Usage: python scripts/jobcount_probe.py [query ...]   (default: all)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lintdb_spark.queries import REGISTRY  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or sorted(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("jobcount_probe", cpus=cpus, shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or []) + len(
            [j for j in (tracker.getActiveJobsIds() or [])]
        )

    # statusTracker group API is awkward; count via job end events instead
    jobs_seen = {"n": 0}
    from pyspark import SparkContext  # noqa: F401

    listener_ok = False
    try:
        jvm = sc._jvm
        # simplest reliable counter: allJobs via the AppStatusStore
        store = sc._jsc.sc().statusStore()

        def total_jobs() -> int:
            return store.jobsList(None).size()

        listener_ok = True
    except Exception:
        def total_jobs() -> int:
            return 0

    out = {}
    for name in names:
        if name not in REGISTRY:
            print(f"skip {name}", file=sys.stderr)
            continue
        j0 = total_jobs()
        t0 = time.time()
        df = REGISTRY[name](spark, sf_dir)
        t1 = time.time()
        j1 = total_jobs()
        df.count()
        t2 = time.time()
        j2 = total_jobs()
        # second run: session caches warm — the steady-state cost
        j3 = total_jobs()
        t3 = time.time()
        df2 = REGISTRY[name](spark, sf_dir)
        t4 = time.time()
        j4 = total_jobs()
        df2.count()
        t5 = time.time()
        j5 = total_jobs()
        out[name] = {
            "build_jobs": j1 - j0,
            "count_jobs": j2 - j1,
            "build_jobs_warm": j4 - j3,
            "count_jobs_warm": j5 - j4,
            "build_s": round(t1 - t0, 3),
            "count_s": round(t2 - t1, 3),
            "build_s_warm": round(t4 - t3, 3),
            "count_s_warm": round(t5 - t4, 3),
        }
        print(
            f"{name}: build {j1 - j0}j/{t1 - t0:.2f}s count {j2 - j1}j/{t2 - t1:.2f}s"
            f" | warm build {j4 - j3}j/{t4 - t3:.2f}s count {j5 - j4}j/{t5 - t4:.2f}s",
            flush=True,
        )
    with open(os.path.join(REPO, ".scale_probe", "results_jobcount.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
