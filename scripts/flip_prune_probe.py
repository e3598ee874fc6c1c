#!/usr/bin/env python
"""Round-11 instrument for the flip-commit lookup rework (VERDICT r10
"What's wrong" #1/#2): on one seeded, compacted store, measure

  A. drift-heavy update latency with the r11 path (flip_rev 2:
     spart-pruned inverted shingle->doc lookup + pair-endpoint
     restriction) vs the r10 path (flip_rev 1: corpus scan of the
     doc-keyed shingle table) — same seed, same batches, only the
     lookup differs;
  B. flip-table volume both ways (the endpoint restriction is the
     bigger lever: flips for pairless docs adjust nothing and are
     dropped at staging);
  C. the row-scoped fold: wall time + folded-segment rows vs total
     pair rows (write cost ∝ touched pairs, not table size);
  D. bytes evidence of the spart prune: on-disk size of the inverted
     table's MATCHED spart partitions for the observed crossing set
     vs the full doc-keyed shingle table the legacy path scans.

Results append to .scale_probe/results_flip_prune.json.
Env: PROBE_SF=sf1|sf10|sf0.1 (default sf1), PROBE_FORCE=1,
PROBE_BATCHES (default 3), PROBE_BATCH_DOCS (default 1000 — the first
sf1/sf0.1 runs showed 1k-doc clone batches cross ZERO df-cap
boundaries below sf10, measuring only the no-flip overhead; 10k-doc
batches match the stream replay that observed 1-3M flip rows/batch).
sf10 needs SPARK_GRAFT_DRIVER_MEM=32g.
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

from lintdb_spark.operators.artifacts import (  # noqa: E402
    _FLIP_SCHEMA,
    DedupArtifacts,
)
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402

SF = os.environ.get("PROBE_SF", "sf1")
DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".scale_probe", "sf1"),
    "sf10": os.path.join(REPO, ".scale_probe", "sf10"),
}
BATCHES = int(os.environ.get("PROBE_BATCHES", "3"))
BATCH_DOCS = int(os.environ.get("PROBE_BATCH_DOCS", "1000"))

spark = get_spark("flip_prune_probe")
spark.sparkContext.setLogLevel("ERROR")

out = os.path.join(REPO, ".scale_probe", "results_flip_prune.json")
results = {}
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)
KEY = SF if BATCH_DOCS == 1000 else f"{SF}@{BATCH_DOCS}"
if os.environ.get("PROBE_ORDER") == "swap":
    KEY += "@swap"
if os.environ.get("PROBE_BATCHES"):
    KEY += f"@b{os.environ['PROBE_BATCHES']}"
if KEY in results and not os.environ.get("PROBE_FORCE"):
    print(f"{KEY}: already measured (PROBE_FORCE=1 to redo)")
    sys.exit(0)


def _save() -> None:
    # incremental: a crash in a later mode / bytes step must not lose
    # an hour of sf10 measurement
    results[KEY] = res
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)

sf_dir = DIRS[SF]
docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
n = docs.count()
tmp = tempfile.mkdtemp(prefix=f"flip_probe_{SF}_")
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


def du(path: str) -> int:
    total = 0
    for wr, _d, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(wr, f))
            except OSError:
                pass
    return total


res = {"docs": n, "batches": BATCHES, "batch_docs": BATCH_DOCS, "modes": {}}
mod = max(BATCHES, n // BATCH_DOCS)
# mode order is a confound: the first mode pays JVM/codegen warm-up
# (first-batch inflation measured ~1.3x) — PROBE_ORDER=swap runs the
# legacy mode first so the warm-up lands on IT instead
order = ("r11_pruned", "r10_scan")
if os.environ.get("PROBE_ORDER") == "swap":
    order = ("r10_scan", "r11_pruned")
    res["order"] = "swap"
for mi, mode in enumerate(order):
    mpath = os.path.join(tmp, mode)
    shutil.copytree(seed_path, mpath)
    if mode == "r10_scan":
        with open(os.path.join(mpath, "_meta.json")) as f:
            meta = json.load(f)
        meta["flip_rev"] = 1  # the round-10 lookup path
        # drop the endpoint registry too: fold_flips picks its regime
        # by the PRESENCE of pair_docs segments, so a flip_rev
        # downgrade alone would still run the round-11 cost-based fold
        # in the "r10" mode (caught in review; the recorded r11 run's
        # estimator chose the FULL rewrite — the r10 physical shape —
        # so its numbers stand, but future runs should not rely on
        # that coincidence)
        meta.get("segments", {}).pop("pair_docs", None)
        meta.get("manifests", {}).pop("pair_docs", None)
        with open(os.path.join(mpath, "_meta.json"), "w") as f:
            json.dump(meta, f)
    ms = DedupArtifacts.load(spark, mpath)
    ms.auto_compact = False  # fold measured explicitly below
    times, flip_rows = [], []
    for b in range(BATCHES):
        batch = docs.filter(F.col("doc_id") % mod == b).withColumn(
            "doc_id", F.col("doc_id") + (1 + mi) * 1_000_000_000
        )
        before = int(ms._meta.get("flip_rows_live", 0))
        t0 = time.time()
        r = ms.update(batch)
        times.append(round(time.time() - t0, 2))
        flip_rows.append(int(ms._meta.get("flip_rows_live", 0)) - before)
        assert r["docs"] > 0, r
    t0 = time.time()
    n_pairs_total = (
        ms._read_t("pair_stats", None).select("doc_a", "doc_b").distinct().count()
        if ms._segments("pair_stats")
        else 0
    )
    pair_count_s = round(time.time() - t0, 2)
    pre_segs = list(ms._segments("pair_stats"))
    t0 = time.time()
    ms.fold_flips()
    fold_s = round(time.time() - t0, 2)
    fold_segs = [s for s in ms._segments("pair_stats") if s not in pre_segs]
    folded_rows = (
        spark.read.parquet(
            *[os.path.join(mpath, "pair_stats", s) for s in fold_segs]
        ).count()
        if fold_segs
        else 0
    )
    ts = sorted(times)
    res["modes"][mode] = {
        "update_s": times,
        "p50": ts[len(ts) // 2],
        "sum": round(sum(times), 2),
        "flip_rows_per_batch": flip_rows,
        "fold_s": fold_s,
        "folded_rows": folded_rows,
        "total_pairs": n_pairs_total,
        "pair_count_probe_s": pair_count_s,
    }
    print(mode, json.dumps(res["modes"][mode]), flush=True)

    if mode == "r11_pruned":
        # D. bytes evidence: the spart partitions the LAST observed
        # crossing set matched vs the full doc-keyed shingle table the
        # legacy scan reads. (Flip segments were just folded; recompute
        # the crossing sparts from the folded flips' shingles is no
        # longer possible, so we use the per-batch staged sets captured
        # in flip_shingles below.)
        sd_root = os.path.join(
            mpath, "shingle_docs", f"v{ms._version('shingle_docs')}"
        )
        sh_root = os.path.join(mpath, "shingles")
        res["modes"][mode]["inverted_table_bytes"] = du(sd_root)
        res["modes"][mode]["shingles_table_bytes"] = du(sh_root)
    _save()
    shutil.rmtree(mpath, ignore_errors=True)

# D (exact): re-run ONE drift batch on a fresh copy and, BEFORE folding,
# read the staged flip segment's shingles -> matched spart dirs
try:
    mpath = os.path.join(tmp, "bytes_probe")
    shutil.copytree(seed_path, mpath)
    ms = DedupArtifacts.load(spark, mpath)
    ms.auto_compact = False
    batch = docs.filter(F.col("doc_id") % mod == 0).withColumn(
        "doc_id", F.col("doc_id") + 7_000_000_000
    )
    ms.update(batch)
except Exception as e:  # keep the mode results on a bytes-step crash
    res["bytes_evidence_error"] = repr(e)
    _save()
    raise
if ms._segments("flip_docs"):
    try:
        fl = ms._read_t("flip_docs", _FLIP_SCHEMA)
        sparts = sorted(
            r["spart"]
            for r in fl.select(
                ms._spart_col(F.col("shingle")).alias("spart")
            )
            .distinct()
            .collect()
        )
        n_cross = fl.select("shingle").distinct().count()
        sd_root = os.path.join(
            mpath, "shingle_docs", f"v{ms._version('shingle_docs')}", "tenant=0"
        )
        matched = sum(
            du(os.path.join(sd_root, f"spart={s}")) for s in sparts
        )
        res["bytes_evidence"] = {
            "crossing_shingles": n_cross,
            "matched_sparts": len(sparts),
            "shingle_parts": int(ms._meta["shingle_parts"]),
            "matched_spart_bytes": matched,
            "inverted_table_bytes": du(os.path.dirname(sd_root)),
            "legacy_scan_bytes": du(os.path.join(mpath, "shingles")),
        }
        print("bytes_evidence", json.dumps(res["bytes_evidence"]), flush=True)
    except Exception as e:
        res["bytes_evidence_error"] = repr(e)
        _save()
        raise
else:
    res["bytes_evidence"] = None  # no flips in the probe batch
shutil.rmtree(mpath, ignore_errors=True)

_save()
shutil.rmtree(tmp, ignore_errors=True)
print("wrote", out)
