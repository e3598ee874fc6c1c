#!/usr/bin/env python
"""Round-8 recall sweep for the approximate dedup tiers, against the
exhaustive tier as ground truth on the sf0.1 corpus (5,000 docs — the
largest scale where the exhaustive tier still runs comfortably).

MinHash-LSH (jaccard_verify_pairs): sweep bands over 16 perms —
(bands, rows) ∈ {(2,8), (4,4), (8,2)} — and report recall of the
exhaustive jaccard >= {0.5, 0.8} pair sets plus candidate volume (the
cost driver). Theory: P(collide | s) = 1-(1-s^r)^b; the corpus is
bimodal (true near-dups sit at j >= 0.9) so corpus recall lands far
above the worst-case at the threshold boundary.

SimHash (simhash_neardup_pairs): the banded candidate stage is
pigeonhole-EXACT for hamming <= bands-1, so recall must measure 1.0 —
the sweep verifies that and records candidate volume vs (bits, bands).

The knob-sweep shape mirrors the reference's own recall benchmarking
(benchmarks/lotte/common.py:60-145: k1/nprobe sweeps against an
exhaustive answer set). Results → .scale_probe/results_recall.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.operators import dedup  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402

SF = os.environ.get("RECALL_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("recall_probe")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, SF, "documents").select("doc_id", "text").persist()
print("docs:", docs.count())

out = {"sf_dir": SF, "minhash": [], "simhash": []}

# ---- MinHash-LSH sweep ----
sh = dedup.doc_shingles(docs).persist()
capped = dedup.df_capped_shingles(sh).persist()
wide = dedup.minhash_wide(sh).persist()

t0 = time.time()
exhaustive = (
    dedup.jaccard_pairs(sh, capped=capped, on_overflow="raise")
    .select("doc_a", "doc_b", "jaccard")
    .persist()
)
truth = {
    thr: {(r.doc_a, r.doc_b) for r in exhaustive.filter(F.col("jaccard") >= thr).collect()}
    for thr in (0.5, 0.8)
}
t_exh = time.time() - t0
print(f"exhaustive: {len(truth[0.5])} pairs@0.5, {len(truth[0.8])}@0.8 in {t_exh:.1f}s")

for bands in (2, 4, 8):
    buckets = dedup.lsh_buckets_wide(wide, bands=bands)
    t0 = time.time()
    n_cand = dedup.lsh_candidate_pairs(buckets).count()
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_verify_pairs(capped, buckets, min_jaccard=0.5)
        .select("doc_a", "doc_b")
        .collect()
    }
    dt = time.time() - t0
    rec = {
        thr: (len(got & truth[thr]) / len(truth[thr])) if truth[thr] else 1.0
        for thr in (0.5, 0.8)
    }
    row = {
        "bands": bands,
        "rows_per_band": 16 // bands,
        "candidates": n_cand,
        "recall@0.5": round(rec[0.5], 4),
        "recall@0.8": round(rec[0.8], 4),
        "time_s": round(dt, 2),
    }
    out["minhash"].append(row)
    print("minhash", row, flush=True)

# ---- SimHash sweep (pigeonhole-exact; verify recall == 1.0) ----
for bits, bands in ((32, 4), (32, 8), (60, 4)):
    fp = dedup.simhash(docs, bits=bits).persist()
    fps = {r.doc_id: r.simhash for r in fp.collect()}
    ids = np.array(sorted(fps))
    vals = np.array([fps[i] for i in ids], dtype=np.uint64)
    for max_h in (1, min(3, bands - 1)):
        # exhaustive Hamming ground truth: numpy XOR popcount blocks
        truth_pairs = set()
        B = 1000
        for i0 in range(0, len(ids), B):
            x = vals[i0 : i0 + B, None] ^ vals[None, :]
            # popcount via unpackbits on the 8-byte view
            h = np.unpackbits(x.view(np.uint8), axis=-1).reshape(
                x.shape[0], x.shape[1], 64
            ).sum(axis=2)
            ii, jj = np.where(h <= max_h)
            for a, b in zip(ii, jj):
                da, db = ids[i0 + a], ids[b]
                if da < db:
                    truth_pairs.add((int(da), int(db)))
        t0 = time.time()
        got = {
            (r.doc_a, r.doc_b)
            for r in dedup.simhash_neardup_pairs(
                fingerprints=fp, bits=bits, bands=bands, max_hamming=max_h
            ).collect()
        }
        dt = time.time() - t0
        row = {
            "bits": bits,
            "bands": bands,
            "max_hamming": max_h,
            "true_pairs": len(truth_pairs),
            "found": len(got),
            "recall": (len(got & truth_pairs) / len(truth_pairs)) if truth_pairs else 1.0,
            "exact": got == truth_pairs,
            "time_s": round(dt, 2),
        }
        out["simhash"].append(row)
        print("simhash", row, flush=True)
    fp.unpersist()

dst = os.path.join(REPO, ".scale_probe", "results_recall.json")
with open(dst, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", dst)
