#!/usr/bin/env python
"""Round-15: profile ONE DedupArtifacts.update() (the bench's
artifact_update scenario) with an event log, then print the job
timeline: per-job duration, driver-side gaps between jobs, job count.

Usage: python scripts/update_profile.py [evlog_dir]
"""
from __future__ import annotations

import glob
import json
import os
import shutil
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
    evdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="evlog_")
    os.makedirs(evdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "update_profile",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={"spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    tmp = tempfile.mkdtemp(prefix="upd_profile_")
    st = DedupArtifacts.create(spark, tmp + "/store")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    st.update(docs.filter(F.col("doc_id") % 2 == 0))
    batch = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .limit(500)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000_000)
    )
    spark.sparkContext.setJobDescription("TIMED-UPDATE")
    t0 = time.time()
    st.update(batch)
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"update wall: {wall:.2f}s")
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)

    # analyze the event log (Spark 4 may write a rolling eventlog_v2
    # directory of zstd-compressed events_* files instead of one file)
    ev = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)[-1]
    if os.path.isdir(ev):
        parts = sorted(glob.glob(os.path.join(ev, "events_*")))
    else:
        parts = [ev]

    def _read_lines(p: str) -> list[str]:
        if p.endswith(".zstd"):
            import subprocess

            out = subprocess.run(["zstd", "-dc", p], capture_output=True)
            return out.stdout.decode().splitlines()
        with open(p) as fh:
            return fh.read().splitlines()

    lines = []
    for p in parts:
        lines.extend(_read_lines(p))
    jobs = {}
    if True:
        for line in lines:
            try:
                e = json.loads(line)
            except Exception:
                continue
            if e.get("Event") == "SparkListenerJobStart":
                props = e.get("Properties", {}) or {}
                jobs[e["Job ID"]] = {
                    "start": e["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:90],
                    "group": props.get("spark.jobGroup.id", ""),
                }
            elif e.get("Event") == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"]
    timed = sorted(
        (j for j in jobs.values() if j.get("desc") == "TIMED-UPDATE" and "end" in j),
        key=lambda j: j["start"],
    )
    if not timed:
        print("no TIMED-UPDATE jobs found; all jobs:")
        timed = sorted((j for j in jobs.values() if "end" in j), key=lambda j: j["start"])
    t_begin = timed[0]["start"]
    t_end = max(j["end"] for j in timed)
    total_ms = t_end - t_begin
    # coverage: union of [start,end] intervals
    ivals = sorted((j["start"], j["end"]) for j in timed)
    cov = 0
    cur_s, cur_e = ivals[0]
    for s, e in ivals[1:]:
        if s > cur_e:
            cov += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    cov += cur_e - cur_s
    print(f"jobs in timed update: {len(timed)}; span {total_ms/1000:.2f}s; "
          f"job-covered {cov/1000:.2f}s; driver gaps {(total_ms-cov)/1000:.2f}s")
    prev_end = None
    for j in timed:
        gap = (j["start"] - prev_end) / 1000 if prev_end is not None else 0.0
        print(f"  +{(j['start']-t_begin)/1000:7.2f}s  dur={(j['end']-j['start'])/1000:6.2f}s  gap={gap:5.2f}s")
        prev_end = max(prev_end or 0, j["end"])
    print("event log:", ev)


if __name__ == "__main__":
    main()
