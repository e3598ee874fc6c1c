#!/usr/bin/env python
"""Round-12 instrument for the cost-based fold trigger (VERDICT r11
"Next round" #3): replay the sf10 stream's drift-heavy TAIL and record,
per batch, the outstanding flip rows, the serve-cost estimate the new
trigger routes on (_fold_cost_rows = flip_rows x (1 + degree)), the
degree components (pair_stats rows / pair_docs endpoint rows from
footer stats), whether a fold fired, and a serve sample — so the
ARTIFACT_FOLD_COST_ROWS constant is CALIBRATED against the measured
serve-exposure boundary rather than hand-tuned in row units, and so a
3x change in flip volume per batch (PROBE_BATCH_DOCS=30000) is shown
to keep serve seconds-class with NO retune.

Seed: the first SEED_FRAC of the corpus in bulk chunks + compact (the
drift regime lives in the late corpus, where shingle df sits near the
cap). Tail: the remainder in PROBE_BATCH_DOCS batches with auto
maintenance as configured.

Modes (PROBE_MODE):
  observe   triggers disabled (both bounds at infinity) — records the
            raw cost trajectory vs serve degradation, the calibration
            input
  auto10k   defaults, 10k-doc tail batches (the r11 replay regime)
  auto30k   defaults, 30k-doc tail batches (3x flip volume per batch)

Results append to .scale_probe/results_fold_cost.json.
Env: PROBE_SF_DIR (default .scale_probe/sf10), PROBE_SEED_FRAC
(default 0.8), PROBE_BATCH_DOCS (default 10000), PROBE_MODE,
SPARK_GRAFT_DRIVER_MEM=32g recommended at sf10.
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

SF_DIR = os.environ.get(
    "PROBE_SF_DIR", os.path.join(REPO, ".scale_probe", "sf10")
)
SEED_FRAC = float(os.environ.get("PROBE_SEED_FRAC", "0.8"))
BATCH_DOCS = int(os.environ.get("PROBE_BATCH_DOCS", "10000"))
MODE = os.environ.get("PROBE_MODE", "observe")

spark = get_spark("fold_cost_replay")
spark.sparkContext.setLogLevel("ERROR")

out = os.path.join(REPO, ".scale_probe", "results_fold_cost.json")
results = {}
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)
KEY = f"{MODE}@{BATCH_DOCS}"
if KEY in results and not os.environ.get("PROBE_FORCE"):
    print(f"{KEY}: already measured (PROBE_FORCE=1 to redo)")
    sys.exit(0)

if MODE == "observe":
    P.ARTIFACT_FOLD_COST_ROWS = 10**15
    P.ARTIFACT_AUTOCOMPACT_FLIP_ROWS = 10**15

docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
n = docs.count()
n_seed = int(n * SEED_FRAC)
print(f"corpus {n} docs: seed {n_seed}, tail in {BATCH_DOCS}-doc batches", flush=True)

tmp = tempfile.mkdtemp(prefix=f"fold_cost_{MODE}_")
st = DedupArtifacts.create(
    spark,
    os.path.join(tmp, "store"),
    bucket_parts=1024,
    doc_parts=256,
    shingle_parts=1024,
)
t0 = time.time()
# bulk seed in 4 chunks (one giant update would blow the driver-side
# prefilter gates' assumptions; 100k chunks match the probe lineage)
seed_chunk = max(n_seed // 4, 1)
for i in range(4):
    lo, hi = i * seed_chunk, min((i + 1) * seed_chunk, n_seed)
    if lo >= hi:
        break
    st.update(
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
        auto_maintain=False,
    )
st.compact()
st.vacuum(min_age_s=0)
seed_s = round(time.time() - t0, 1)
print(f"seed: {seed_s}s", flush=True)

res = {
    "sf_dir": SF_DIR,
    "mode": MODE,
    "batch_docs": BATCH_DOCS,
    "seed_docs": n_seed,
    "seed_s": seed_s,
    "fold_cost_rows_param": int(P.ARTIFACT_FOLD_COST_ROWS),
    "flip_rows_param": int(P.ARTIFACT_AUTOCOMPACT_FLIP_ROWS),
    "batches": [],
}


def _save() -> None:
    results[KEY] = res
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


b = 0
lo = n_seed
while lo < n:
    hi = min(lo + BATCH_DOCS, n)
    batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    t0 = time.time()
    r = st.update(batch, idempotency_token=("fold_cost", b))
    upd_s = round(time.time() - t0, 2)
    fr = int(st._meta.get("flip_rows_live", 0))
    cost = st._fold_cost_rows()
    pr = st._table_rows("pair_stats")
    ep = st._table_rows("pair_docs")
    t0 = time.time()
    n_pairs = st.verified_pairs(min_jaccard=0.5).count()
    serve_s = round(time.time() - t0, 2)
    rec = {
        "batch": b,
        "docs": r.get("docs"),
        "update_s": upd_s,
        "folded": bool(r.get("folded")),
        "compacted": bool(r.get("compacted")),
        "minor": bool(r.get("minor_compacted")),
        "flip_rows_live": fr,
        "fold_cost_rows": cost,
        "pair_rows": pr,
        "endpoint_rows": ep,
        "serve_s": serve_s,
        "pairs": n_pairs,
    }
    res["batches"].append(rec)
    print(json.dumps(rec), flush=True)
    _save()
    lo = hi
    b += 1

shutil.rmtree(tmp, ignore_errors=True)
print("done", flush=True)
