#!/usr/bin/env python
"""Round-8 instrument for the incremental-artifact claim: update cost
must be proportional to the NEW batch, not the corpus. For each corpus
decade (sf0.1 bench data, .scale_probe sf1 / sf10) we seed a
DedupArtifacts store with the full corpus (batched), then time an
update() of the SAME 1,000 synthetic new docs — if maintenance is
incremental the update time stays ~flat across two decades while the
seed build grows linearly. Also records the serve-side read
(verified_pairs count) off the maintained store.

Results append to .scale_probe/results_artifacts.json.
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

CORPORA = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".scale_probe", "sf1")),
    ("sf10", os.path.join(REPO, ".scale_probe", "sf10")),
]

spark = get_spark("artifact_probe")
spark.sparkContext.setLogLevel("ERROR")

results = {}
for tag, sf_dir in CORPORA:
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        print(f"{tag}: missing, skip")
        continue
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    tmp = tempfile.mkdtemp(prefix=f"artifact_probe_{tag}_")
    st = DedupArtifacts.create(spark, tmp + "/store")

    t0 = time.time()
    # seed in two batches (exercises the incremental path during build)
    st.update(docs.filter(F.col("doc_id") % 2 == 0))
    st.update(docs.filter(F.col("doc_id") % 2 == 1))
    t_build = time.time() - t0

    # the SAME-SIZED marginal batch at every decade: 1,000 docs cloned
    # from the corpus under fresh ids (realistic near-dup pressure)
    batch = docs.limit(1000).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000_000
    )
    t0 = time.time()
    stats = st.update(batch)
    t_update = time.time() - t0

    t0 = time.time()
    n_pairs = st.verified_pairs(min_jaccard=0.5).count()
    t_serve = time.time() - t0

    results[tag] = {
        "docs": n,
        "build_s": round(t_build, 2),
        "update_1k_s": round(t_update, 2),
        "update_docs": stats["docs"],
        "update_pairs": stats["pairs"],
        "verified_pairs": n_pairs,
        "serve_s": round(t_serve, 2),
    }
    print(tag, results[tag], flush=True)
    shutil.rmtree(tmp, ignore_errors=True)

out = os.path.join(REPO, ".scale_probe", "results_artifacts.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("wrote", out)
