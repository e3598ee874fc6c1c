#!/usr/bin/env python
"""Round-9 probe: streaming artifact maintenance CADENCE at sf10.

Replays the sf10 corpus (500k docs) into a DedupArtifacts store as 50
micro-batches — the exact call stream_artifacts' foreachBatch handler
makes (update() with an idempotency token, then compact() every
compact_every batches; the stream plumbing itself is pytest-covered) —
and records per-batch update cost, segment accretion, and the serve
latency (verified_pairs count off the maintained pair_stats table)
sampled every 10 batches. Two runs: compact_every=10 (+vacuum) vs no
compaction, so the read-amplification claim is measured: without
compaction every read unions one scan per segment per table and serve
latency degrades with the batch count; with it, serve stays flat.

Results -> .scale_probe/results_artifact_stream.json.
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

SF = os.environ.get("STREAM_PROBE_SF_DIR", os.path.join(REPO, ".scale_probe", "sf10"))
N_BATCHES = int(os.environ.get("PROBE_BATCHES", "50"))
SERVE_EVERY = 10

spark = get_spark("artifact_stream_probe")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents").select("doc_id", "text")
docs = docs.withColumn("_b", F.pmod(F.xxhash64("doc_id"), F.lit(N_BATCHES)))
docs = docs.persist()
n = docs.count()
print(f"corpus {n} docs, {N_BATCHES} micro-batches", flush=True)


def run(compact_every: int | None, auto: bool = False) -> dict:
    """auto=True (round 10): NO caller cadence — the store's own
    segment/flip-threshold trigger must keep serve flat (the backstop
    for the measured 30x no-compaction cliff). auto=False disables the
    trigger so 'tuned' and 'none' stay pure cadence measurements."""
    tmp = tempfile.mkdtemp(prefix="artifact_stream_")
    st = DedupArtifacts.create(
        spark, tmp + "/store", bucket_parts=1024, doc_parts=256,
        shingle_parts=1024,
    )
    st.auto_compact = auto
    batches = []
    serves = []
    try:
        for b in range(N_BATCHES):
            batch = docs.filter(F.col("_b") == b).drop("_b")
            t0 = time.time()
            stats = st.update(batch, idempotency_token=("probe", b))
            dt = time.time() - t0
            compacted = bool(stats.get("compacted"))
            dt_c = dt if compacted else 0.0  # auto: inside update_s
            if compact_every and (b + 1) % compact_every == 0:
                t0 = time.time()
                st.compact()
                st.vacuum(min_age_s=0)
                dt_c = time.time() - t0
                compacted = True
            segs = sum(len(st._segments(t)) for t in st.TABLES)
            batches.append(
                {
                    "batch": b,
                    "docs": stats["docs"],
                    "pairs": stats["pairs"],
                    "update_s": round(dt, 2),
                    **({"compact_s": round(dt_c, 2)} if compacted else {}),
                    "segments_total": segs,
                }
            )
            if (b + 1) % SERVE_EVERY == 0:
                t0 = time.time()
                n_pairs = st.verified_pairs(min_jaccard=0.5).count()
                serves.append(
                    {
                        "after_batch": b,
                        "serve_s": round(time.time() - t0, 2),
                        "pairs": n_pairs,
                        "segments_total": segs,
                    }
                )
                print(f"  serve@{b}: {serves[-1]}", flush=True)
        upd = [x["update_s"] for x in batches]
        return {
            "compact_every": compact_every,
            "n_batches": N_BATCHES,
            "update_s_p50": sorted(upd)[len(upd) // 2],
            "update_s_max": max(upd),
            "update_s_sum": round(sum(upd), 1),
            "compact_s_sum": round(
                sum(x.get("compact_s", 0) for x in batches), 1
            ),
            "final_segments": batches[-1]["segments_total"],
            "serves": serves,
            "batches": batches,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


out = os.path.join(REPO, ".scale_probe", "results_artifact_stream.json")
results = {}
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)

MODES = {
    "compact_every_10": dict(compact_every=10),
    "no_compaction": dict(compact_every=None),
    # round 10: no caller cadence at all — the self-triggering
    # compaction must keep serve within 2x of the tuned run
    "auto_compact": dict(compact_every=None, auto=True),
}
only = os.environ.get("PROBE_MODES")
for tag, kw in MODES.items():
    if only and tag not in only.split(","):
        continue
    if tag in results and not os.environ.get("PROBE_FORCE"):
        print(f"{tag}: already measured, skip", flush=True)
        continue
    print(f"=== {tag} ===", flush=True)
    results[tag] = run(**kw)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(tag, "done:", {k: v for k, v in results[tag].items() if k != "batches"}, flush=True)
print("wrote", out)
