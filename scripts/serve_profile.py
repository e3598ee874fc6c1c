#!/usr/bin/env python
"""Profile the warm 1000-query batch serve against the sf10 index
(.scale_probe/idx10/idx): phase breakdown of search_batch so the
optimization target is measured, not guessed. Round-7 instrument for
the >=100 q/s goal (SCALE.md records 78 q/s after the r06 fixes)."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from lintdb_spark import model  # noqa: E402
from lintdb_spark.index import Index, SearchOptions  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402

IDX = os.path.join(REPO, ".scale_probe", "idx10", "idx")
SF = os.path.join(REPO, ".scale_probe", "sf10")
NQ = int(os.environ.get("PROBE_NQ", "1000"))

PREWARM = os.environ.get("PROBE_PREWARM", "0") == "1"

spark = get_spark("serve_profile")
spark.sparkContext.setLogLevel("ERROR")
t = time.time()
idx = Index.load(spark, IDX)
print(f"load: {time.time()-t:.2f}s")
if PREWARM:
    # the server-startup step (round 9): builds postings persist +
    # doc-blob broadcast + centroid state through the real serve path,
    # so the first user batch below lands warm
    t = time.time()
    idx.prewarm(0, "emb")
    print(f"prewarm: {time.time()-t:.2f}s")
print("docs:", idx._docs().count(), "centroids:", idx.centroids["emb"].shape)

qrows = model.batch_queries(spark, SF, NQ).collect()
queries: dict[int, list] = {}
for r in qrows:
    queries.setdefault(r["qid"], []).append((r["q_id"], r["qvec"]))
qmats = {
    qid: np.asarray([v for _, v in sorted(toks)], dtype=np.float32)
    for qid, toks in queries.items()
}
opts = SearchOptions(n_probe=8, num_second_pass=64, centroid_score_threshold=0.0)

# phase 1: driver-side probe selection alone
t = time.time()
probe_rows = [
    (qid, c) for qid, q in qmats.items() for c in idx._top_centroids("emb", q, opts)
]
print(f"probe selection ({len(probe_rows)} rows): {time.time()-t:.2f}s")

# cold + 2 warm full batches
blob_times = []
for tag in ("cold", "warm1", "warm2"):
    t = time.time()
    n = idx.search_batch(0, "emb", qmats, k=10, opts=opts).count()
    dt_s = time.time() - t
    blob_times.append(dt_s)
    print(f"{tag}: {dt_s:.2f}s rows={n}", flush=True)

# round 11 (VERDICT r10 #3): price the FORCED cogroup fallback at sf10 —
# the 100 TB serve path (doc blobs over the broadcast threshold) that
# bench-scale corpora never route to on their own. Two reps, min taken,
# same query batch, vs the warm blob path above.
cg_times = []
idx.force_cogroup = True
try:
    for i in range(2):
        t = time.time()
        n = idx.search_batch(0, "emb", qmats, k=10, opts=opts).count()
        dt_s = time.time() - t
        cg_times.append(dt_s)
        print(f"cogroup{i}: {dt_s:.2f}s  {NQ/dt_s:.0f} q/s  rows={n}", flush=True)
finally:
    idx.force_cogroup = False
warm_blob = min(blob_times[1:])
print(
    f"SUMMARY_SF10 nq={NQ} blob_warm={warm_blob:.2f}s ({NQ/warm_blob:.0f} q/s) "
    f"cogroup_min={min(cg_times):.2f}s ({NQ/min(cg_times):.0f} q/s) "
    f"ratio={min(cg_times)/warm_blob:.2f}x"
)
