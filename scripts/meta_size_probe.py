#!/usr/bin/env python
"""Round-14 instrument for the meta's own size at deployment partition
counts (VERDICT r13 #3/#6): the leaf manifest dominated `_meta.json`
(1.29 of 1.38 MB at the 8192-spart shape measured in round 13), and
SCALE.md's 64k-spart projection (~10-20 MB per external-commit GET)
was a back-of-envelope. This probe measures both, pre and post the
round-14 dictionary coding, at sparts in {8192, 65536}:

  - meta bytes PRE-intern  = len(json.dumps(store._meta)) — the
    in-memory dict IS the plain-list representation the store wrote
    before round 14, so the old on-disk size is computed exactly, not
    replayed from old code;
  - meta bytes POST-intern = the actual committed `_meta.json`;
  - cold-open seconds      = wall time of DedupArtifacts.load on a
    fresh store object (one meta GET + decode + normalize), min of 3.

Corpus: the sf0.01 documents table (same as the round-13 measurement)
with one full compact, so the shingle_docs + df tables carry the fine
spart layout. Results append to .scale_probe/results_meta_size.json;
the SCALE.md §14 table derives from it. Env: PROBE_SPARTS_SWEEP
(default "8192,65536"), PROBE_SF_DIR (default /root/testdata/sf0.01).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lintdb_spark.operators.artifacts import DedupArtifacts  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402

SWEEP = [
    int(x)
    for x in os.environ.get("PROBE_SPARTS_SWEEP", "8192,65536").split(",")
]
SF_DIR = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.01")

spark = get_spark("meta_size_probe")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
    "doc_id", "text"
)

res = {"sf_dir": SF_DIR, "points": []}
tmp = tempfile.mkdtemp(prefix="meta_size_")
try:
    for sparts in SWEEP:
        path = os.path.join(tmp, f"st{sparts}")
        t0 = time.time()
        st = DedupArtifacts.create(spark, path, shingle_parts=sparts)
        st.update(docs, auto_maintain=False)
        st.compact()
        st.vacuum(min_age_s=0)
        build_s = round(time.time() - t0, 1)
        meta_file = os.path.join(path, "_meta.json")
        post = os.path.getsize(meta_file)
        # the in-memory meta holds the decoded plain lists — exactly
        # what _save_meta wrote before round 14
        pre = len(json.dumps(st._meta).encode())
        man = st._meta.get("manifests", {})
        leaves = sum(len(r) for per in man.values() for r in per.values())
        opens = []
        for _ in range(3):
            t0 = time.time()
            DedupArtifacts.load(spark, path)
            opens.append(time.time() - t0)
        point = {
            "sparts": sparts,
            "manifest_leaves": leaves,
            "meta_bytes_pre_intern": pre,
            "meta_bytes_post_intern": post,
            "shrink_x": round(pre / post, 2) if post else None,
            "cold_open_s_min3": round(min(opens), 4),
            "build_s": build_s,
        }
        print(json.dumps(point), flush=True)
        res["points"].append(point)
        shutil.rmtree(path, ignore_errors=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)

out = os.path.join(REPO, ".scale_probe", "results_meta_size.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
hist = []
if os.path.exists(out):
    with open(out) as f:
        hist = json.load(f)
hist.append(res)
with open(out, "w") as f:
    json.dump(hist, f, indent=1)
print(f"wrote {out}")
