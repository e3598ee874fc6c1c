#!/usr/bin/env python
"""Round-12 instrument for minor-compact coverage extension (VERDICT
r11 "Next round" #1): show that the flip-commit lookup's UNCOVERED
doc-keyed read stays batch-proportional as the batch tier grows.

Protocol: seed + compact a store (covers = the v* snapshot), then
ingest N append batches with tiered maintenance ON but the FULL
compact disabled (batch-frac debt at infinity — the regime between
debt-triggered rewrites, exactly where VERDICT r11 weak #1 lives).
After every batch record the uncovered shingles segments (count +
bytes) — the set every drift commit must read wholesale — under:

  r12   the shipped behavior: _minor_companion inverts merged
        segments and advances covers, so uncovered = fresh level-0
        batches only (bounded by the fanout)
  r11   companion disabled (monkeypatched no-op): minor merges move
        batch rows into uncovered m-tier segments that accumulate
        until the next full compact — uncovered bytes grow with the
        whole batch tier

Every PROBE_DRIFT_EVERY batches the batch is a DRIFT batch (clones of
already-stored docs under shifted ids: shingle df doubles, capped
statuses cross) and the drift update's wall time is recorded — the
end-to-end cost the uncovered read sits inside.

Results append to .scale_probe/results_coverage.json.
Env: PROBE_SF_DIR (default /root/testdata/sf0.1; .scale_probe/sf10
for the full-scale rep — needs SPARK_GRAFT_DRIVER_MEM=32g),
PROBE_BATCHES (default 16), PROBE_DRIFT_EVERY (default 4),
PROBE_SEED_FRAC (default 0.5), PROBE_FORCE=1.
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

from lintdb_spark import params as P  # noqa: E402
from lintdb_spark.operators.artifacts import DedupArtifacts  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.1")
BATCHES = int(os.environ.get("PROBE_BATCHES", "16"))
DRIFT_EVERY = int(os.environ.get("PROBE_DRIFT_EVERY", "4"))
SEED_FRAC = float(os.environ.get("PROBE_SEED_FRAC", "0.5"))

spark = get_spark("coverage_probe")
spark.sparkContext.setLogLevel("ERROR")

out = os.path.join(REPO, ".scale_probe", "results_coverage.json")
results = {}
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)
KEY = f"{os.path.basename(SF_DIR)}@b{BATCHES}"
if KEY in results and not os.environ.get("PROBE_FORCE"):
    print(f"{KEY}: already measured (PROBE_FORCE=1 to redo)")
    sys.exit(0)

# the between-full-compacts regime: minor merges only
P.ARTIFACT_FULLCOMPACT_BATCH_FRAC = 10**9
P.ARTIFACT_FULLCOMPACT_TOMBSTONE_FRAC = 10**9
P.ARTIFACT_AUTOCOMPACT_FLIP_ROWS = 10**15
P.ARTIFACT_FOLD_COST_ROWS = 10**15

docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
n = docs.count()
n_seed = int(n * SEED_FRAC)
batch_docs = max((n - n_seed) // BATCHES, 1)
print(
    f"corpus {n}: seed {n_seed}, {BATCHES} batches of ~{batch_docs}",
    flush=True,
)


def du(path: str) -> int:
    total = 0
    for wr, _d, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(wr, f))
            except OSError:
                pass
    return total


res = {"sf_dir": SF_DIR, "batches": BATCHES, "modes": {}}


def _save() -> None:
    results[KEY] = res
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


orig_companion = DedupArtifacts._minor_companion
for mode in ("r12", "r11"):
    if mode == "r11":
        DedupArtifacts._minor_companion = (
            lambda self, table, merged, seg, new_meta: None
        )
    else:
        DedupArtifacts._minor_companion = orig_companion
    tmp = tempfile.mkdtemp(prefix=f"coverage_{mode}_")
    st = DedupArtifacts.create(
        spark,
        os.path.join(tmp, "store"),
        bucket_parts=256,
        doc_parts=64,
        shingle_parts=256,
    )
    st.update(docs.filter(F.col("doc_id") < n_seed), auto_maintain=False)
    st.compact()
    st.vacuum(min_age_s=0)
    recs = []
    for b in range(BATCHES):
        lo = n_seed + b * batch_docs
        hi = min(lo + batch_docs, n)
        if DRIFT_EVERY and (b + 1) % DRIFT_EVERY == 0:
            # drift: clone an already-stored slice under shifted ids —
            # every cloned shingle's df doubles, capped statuses cross
            batch = docs.filter(F.col("doc_id") < batch_docs).withColumn(
                "doc_id", F.col("doc_id") + (b + 1) * 10_000_000
            )
            kind = "drift"
        else:
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            kind = "append"
        t0 = time.time()
        st.update(batch, idempotency_token=("cov", b))
        upd_s = round(time.time() - t0, 2)
        covers = set(st._meta.get("shingle_docs_covers") or [])
        sh_segs = st._segments("shingles")
        unc = [s for s in sh_segs if s not in covers]
        unc_bytes = sum(
            du(os.path.join(st.path, "shingles", s)) for s in unc
        )
        batch_tier = [s for s in sh_segs if not s.startswith("v")]
        batch_bytes = sum(
            du(os.path.join(st.path, "shingles", s)) for s in batch_tier
        )
        recs.append(
            {
                "batch": b,
                "kind": kind,
                "update_s": upd_s,
                "uncovered_segs": len(unc),
                "uncovered_bytes": unc_bytes,
                "batch_tier_segs": len(batch_tier),
                "batch_tier_bytes": batch_bytes,
                "shingle_docs_segs": len(st._segments("shingle_docs")),
                "shingle_docs_bytes": du(
                    os.path.join(st.path, "shingle_docs")
                ),
            }
        )
        print(mode, json.dumps(recs[-1]), flush=True)
    res["modes"][mode] = recs
    _save()
    shutil.rmtree(tmp, ignore_errors=True)
DedupArtifacts._minor_companion = orig_companion
print("done", flush=True)
