#!/usr/bin/env python
"""Round-10 instrument for the update-cost knob (verify_every):
live pair verification costs 3.2-3.6x on store writes (bench r8->r9),
so drift-heavy / ingest-bound streams want to amortize it. Measure,
per corpus decade, the p50/p95 update latency of 8 synthetic 1k-doc
batches plus the serve-after latency, under three modes sharing ONE
seeded store (copied, meta tweaked):

  floor   pair_stats_live=False  (no verification at write; serve
                                  pays the full memoized verify)
  live    verify_every=1         (the default: verify every batch)
  every8  verify_every=8         (defer; batch 8 pays the flush)

Results append to .scale_probe/results_verify_every.json.
Env: PROBE_SF=sf1|sf10|sf0.1 (default sf1), PROBE_FORCE=1 to redo.
sf10 needs SPARK_GRAFT_DRIVER_MEM=32g (see memory notes).
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

from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.operators.artifacts import DedupArtifacts  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402

SF = os.environ.get("PROBE_SF", "sf1")
DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".scale_probe", "sf1"),
    "sf10": os.path.join(REPO, ".scale_probe", "sf10"),
}
BATCHES = 8
BATCH_DOCS = 1000

spark = get_spark("verify_every_probe")
spark.sparkContext.setLogLevel("ERROR")

out = os.path.join(REPO, ".scale_probe", "results_verify_every.json")
results = {}
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)
if SF in results and not os.environ.get("PROBE_FORCE"):
    print(f"{SF}: already measured (PROBE_FORCE=1 to redo)")
    sys.exit(0)

sf_dir = DIRS[SF]
docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
n = docs.count()
tmp = tempfile.mkdtemp(prefix=f"ve_probe_{SF}_")
seed_path = os.path.join(tmp, "seed")
print(f"{SF}: seeding {n} docs ...", flush=True)
t0 = time.time()
st = DedupArtifacts.create(
    spark, seed_path, bucket_parts=1024, doc_parts=256, shingle_parts=1024
)
st.update(docs.filter(F.col("doc_id") % 2 == 0))
st.update(docs.filter(F.col("doc_id") % 2 == 1))
st.compact()
st.vacuum(min_age_s=0)
print(f"seed: {time.time()-t0:.1f}s", flush=True)

MODES = {
    "floor": {"pair_stats_live": False},
    "live": {"verify_every": 1},
    "every8": {"verify_every": BATCHES},
}
res = {"docs": n, "batches": BATCHES, "batch_docs": BATCH_DOCS, "modes": {}}
for mi, (mode, meta_patch) in enumerate(MODES.items()):
    mpath = os.path.join(tmp, mode)
    shutil.copytree(seed_path, mpath)
    with open(os.path.join(mpath, "_meta.json")) as f:
        meta = json.load(f)
    meta.update(meta_patch)
    with open(os.path.join(mpath, "_meta.json"), "w") as f:
        json.dump(meta, f)
    ms = DedupArtifacts.load(spark, mpath)
    # mode comparison must be pure: the auto-compact backstop is
    # measured separately (artifact_stream_probe)
    ms.auto_compact = False
    # DISJOINT source docs per batch (clones of seeded docs under
    # fresh ids — realistic near-dup pressure): stacking the SAME
    # 1k docs every batch manufactures a quadratic clone storm that
    # measures an adversarial corner, not typical ingest
    mod = max(BATCHES, n // BATCH_DOCS)
    times = []
    for b in range(BATCHES):
        batch = docs.filter(F.col("doc_id") % mod == b).withColumn(
            "doc_id",
            F.col("doc_id") + (1 + mi) * 1_000_000_000,
        )
        t0 = time.time()
        r = ms.update(batch)
        times.append(round(time.time() - t0, 2))
        assert r["docs"] > 0, r
    t_flush = 0.0
    if any(ms._meta.get("pair_unverified", {}).values()):
        t0 = time.time()
        ms.flush_pairs()
        t_flush = time.time() - t0
    t0 = time.time()
    n_pairs = ms.verified_pairs(min_jaccard=0.5).count()
    t_serve = time.time() - t0
    ts = sorted(times)
    res["modes"][mode] = {
        "update_s": times,
        "p50": ts[len(ts) // 2],
        "p95": ts[-1],
        "sum": round(sum(times), 2),
        "flush_s": round(t_flush, 2),
        "serve_s": round(t_serve, 2),
        "pairs": n_pairs,
    }
    print(mode, json.dumps(res["modes"][mode]), flush=True)
    shutil.rmtree(mpath, ignore_errors=True)

results[SF] = res
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(results, f, indent=1)
shutil.rmtree(tmp, ignore_errors=True)
print("wrote", out)
