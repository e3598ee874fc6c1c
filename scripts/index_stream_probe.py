#!/usr/bin/env python
"""Round-11 probe: Index micro-batch ingest with self-triggering
tiered maintenance vs none.

Streams N small add() batches into a trained index (the stream_ingest
foreachBatch shape, no compact_every cadence) in two modes:
- auto (default): Index.add self-triggers tiered maintenance — first
  trip full compact (no base tier), minor merges after.
- none: auto_compact=False — one segment per table per batch accretes
  unboundedly (the pre-round-11 default behavior for an unconfigured
  stream).

Records per-batch add_s, segment counts, maintenance events, and a
search sample every SEARCH_EVERY batches (the accretion cost shows up
as per-segment scan branches + footer opens in every search).

Results -> .scale_probe/results_index_stream_r11.json.
Env: PROBE_BATCHES (default 40), PROBE_DOCS (per batch, default 75),
PROBE_MODES, PROBE_FORCE=1.
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

import numpy as np  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from lintdb_spark.index import (  # noqa: E402
    Index,
    SearchOptions,
    VectorQuery,
)
from lintdb_spark.index.schema import (  # noqa: E402
    FieldType,
    Schema,
    TensorField,
)
from lintdb_spark.session import get_spark  # noqa: E402

N_BATCHES = int(os.environ.get("PROBE_BATCHES", "40"))
DOCS_PER_BATCH = int(os.environ.get("PROBE_DOCS", "75"))
SEARCH_EVERY = 10
DIM, NUM_TOKENS = 32, 8
OUT = os.path.join(REPO, ".scale_probe", "results_index_stream_r11.json")

spark = get_spark("index_stream_probe")
spark.sparkContext.setLogLevel("ERROR")


def make_schema() -> Schema:
    return Schema(
        [
            TensorField(
                "colbert",
                dimensions=DIM,
                roles=[FieldType.COLBERT],
                quantization="none",
                num_centroids=16,
            ),
        ]
    )


def doc_tokens(doc_id: int) -> np.ndarray:
    rng = np.random.RandomState(doc_id)
    t = rng.randn(NUM_TOKENS, DIM).astype(np.float32)
    return t / np.linalg.norm(t, axis=1, keepdims=True)


_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("colbert", T.ArrayType(T.ArrayType(T.FloatType()))),
    ]
)


def make_docs(doc_ids):
    rows = [
        (0, d, [[float(x) for x in tok] for tok in doc_tokens(d)])
        for d in doc_ids
    ]
    return spark.createDataFrame(rows, _SCHEMA)


OPTS = SearchOptions(
    n_probe=8, k_top_centroids=2, num_second_pass=100,
    centroid_score_threshold=0.0,
)

results = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        results = json.load(f)


def run(auto: bool) -> dict:
    tmp = tempfile.mkdtemp(prefix="index_stream_")
    idx = Index.create(spark, tmp + "/index", make_schema())
    idx.auto_compact = auto
    train = make_docs(range(600))
    idx.train(train)
    batches, searches, maint = [], [], []
    try:
        for b in range(N_BATCHES):
            ids = range(b * DOCS_PER_BATCH, (b + 1) * DOCS_PER_BATCH)
            t0 = time.time()
            idx.add(make_docs(ids), idempotency_token=("probe", b))
            dt = time.time() - t0
            segs = sum(len(idx._segments(t)) for t in idx._all_tables())
            row = {"batch": b, "add_s": round(dt, 2), "segments": segs}
            batches.append(row)
            if (b + 1) % SEARCH_EVERY == 0:
                # query a doc from the FIRST batch (must scan the full
                # segment list) — min of 2 reps, the serve shape
                q = VectorQuery("colbert", doc_tokens(3))
                best = None
                for _ in range(2):
                    t0 = time.time()
                    rows = idx.search(0, q, k=5, opts=OPTS).collect()
                    s = time.time() - t0
                    best = s if best is None else min(best, s)
                assert rows[0]["doc_id"] == 3, rows[:2]
                searches.append(
                    {"after_batch": b, "search_s": round(best, 2),
                     "segments": segs}
                )
                print(f"  search@{b}: {searches[-1]}", flush=True)
        adds = [x["add_s"] for x in batches]
        return {
            "auto": auto,
            "n_batches": N_BATCHES,
            "docs_per_batch": DOCS_PER_BATCH,
            "add_s_p50": sorted(adds)[len(adds) // 2],
            "add_s_max": max(adds),
            "add_s_sum": round(sum(adds), 1),
            "final_segments": batches[-1]["segments"],
            "searches": searches,
            "batches": batches,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


MODES = {"auto": dict(auto=True), "none": dict(auto=False)}
only = os.environ.get("PROBE_MODES")
for tag, kw in MODES.items():
    if only and tag not in only.split(","):
        continue
    if tag in results and not os.environ.get("PROBE_FORCE"):
        print(f"{tag}: already measured, skip", flush=True)
        continue
    print(f"=== {tag} ===", flush=True)
    results[tag] = run(**kw)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(tag, "done:",
          {k: v for k, v in results[tag].items() if k != "batches"},
          flush=True)
print("wrote", OUT)
