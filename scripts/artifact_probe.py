#!/usr/bin/env python
"""Round-9 instrument for the incremental-artifact claims:

1. update cost ∝ batch, not corpus — for each corpus decade (sf0.1
   bench data, .scale_probe sf1 / sf10) seed a store with the full
   corpus, then time an update() of the SAME 1,000 synthetic docs and
   of a 16-doc POINT batch.
2. bytes READ per update are bounded by layout pruning — the collision
   join touches only the batch's bpart partitions of the stored bucket
   table and the known-doc check only the batch's dpart partitions of
   the registry. We account the touched partition-directory bytes
   deterministically (an upper bound on scan bytes; column pruning
   reads less) against the table totals and against the bytes the
   round-8 path had to re-read AND re-hash every batch (the full
   signature table).
3. serve-after-update ∝ new pairs — verified_pairs() now reads the
   maintained pair_stats table (max-seq row per pair) instead of
   re-paying a full snapshot verify (141 s at sf10 in round 8).

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

from lintdb_spark.operators import dedup  # noqa: E402
from lintdb_spark.operators.artifacts import DedupArtifacts  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402

CORPORA = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".scale_probe", "sf1")),
    ("sf10", os.path.join(REPO, ".scale_probe", "sf10")),
]
# forward-looking layout: fine partitioning so point updates prune
# hard (a production 100 TB store sizes these in the thousands)
BUCKET_PARTS = 1024
DOC_PARTS = 256

spark = get_spark("artifact_probe")
spark.sparkContext.setLogLevel("ERROR")


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _part_bytes(st, table: str, key: str, wanted: set[int]) -> tuple[int, int]:
    """(touched_bytes, total_bytes) of a table's partition dirs, where
    touched = dirs whose {key}=N value is in ``wanted``."""
    touched = total = 0
    base = os.path.join(st.path, table)
    for seg in st._segments(table):
        segp = os.path.join(base, seg)
        if not os.path.isdir(segp):
            continue
        for tdir in os.listdir(segp):
            tp = os.path.join(segp, tdir)
            if not os.path.isdir(tp):
                continue
            for pdir in os.listdir(tp):
                if "=" not in pdir:
                    continue
                sz = _du(os.path.join(tp, pdir))
                total += sz
                k, v = pdir.split("=", 1)
                if k == key and int(v) in wanted:
                    touched += sz
    return touched, total


def _update_read_footprint(st, batch) -> dict:
    """Bytes the pruned reads of update(batch) touch, vs table totals
    and vs the round-8 cost base (full signature re-band)."""
    sh = dedup.doc_shingles(batch)
    wide = dedup.minhash_wide(sh, st.num_perms)
    new_b = dedup.lsh_buckets_wide(
        wide, bands=st.lsh_bands, num_perms=st.num_perms
    ).withColumn("bpart", st._bpart_col(F.col("bucket")))
    bparts = {r["bpart"] for r in new_b.select("bpart").distinct().collect()}
    dparts = {
        r["dpart"]
        for r in batch.select(st._dpart_col(F.col("doc_id")).alias("dpart"))
        .distinct()
        .collect()
    }
    bt, btot = _part_bytes(st, "buckets", "bpart", bparts)
    dt, dtot = _part_bytes(st, "doc_ids", "dpart", dparts)
    sig_bytes = _du(os.path.join(st.path, "signatures"))
    return {
        "bucket_parts_touched": len(bparts),
        "bucket_bytes_touched": bt,
        "bucket_bytes_total": btot,
        "docid_bytes_touched": dt,
        "docid_bytes_total": dtot,
        "r8_reband_bytes": sig_bytes,  # what the old path re-read per batch
    }


results = {}
out = os.path.join(REPO, ".scale_probe", "results_artifacts.json")
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)

for tag, sf_dir in CORPORA:
    if tag in results and not os.environ.get("PROBE_FORCE"):
        print(f"{tag}: already measured, skip (PROBE_FORCE=1 to redo)")
        continue
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        print(f"{tag}: missing, skip")
        continue
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    tmp = tempfile.mkdtemp(prefix=f"artifact_probe_{tag}_")
    st = DedupArtifacts.create(
        spark, tmp + "/store", bucket_parts=BUCKET_PARTS, doc_parts=DOC_PARTS
    )

    t0 = time.time()
    # seed in two batches (exercises the incremental path during build)
    st.update(docs.filter(F.col("doc_id") % 2 == 0))
    st.update(docs.filter(F.col("doc_id") % 2 == 1))
    t_build = time.time() - t0
    st.compact()
    st.vacuum(min_age_s=0)

    # the SAME-SIZED marginal batch at every decade: 1,000 docs cloned
    # from the corpus under fresh ids (realistic near-dup pressure)
    batch = docs.limit(1000).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000_000
    )
    fp_1k = _update_read_footprint(st, batch)
    t0 = time.time()
    stats = st.update(batch)
    t_update = time.time() - t0

    t0 = time.time()
    n_pairs = st.verified_pairs(min_jaccard=0.5).count()
    t_serve = time.time() - t0

    # POINT batch: the streaming/latency case where partition pruning
    # bites (16 docs x 4 bands = 64 bucket keys vs 1024 partitions)
    point = docs.limit(16).withColumn(
        "doc_id", F.col("doc_id") + 2_000_000_000
    )
    fp_pt = _update_read_footprint(st, point)
    t0 = time.time()
    stats_pt = st.update(point)
    t_point = time.time() - t0
    t0 = time.time()
    st.verified_pairs(min_jaccard=0.5).count()
    t_serve2 = time.time() - t0

    results[tag] = {
        "docs": n,
        "build_s": round(t_build, 2),
        "update_1k_s": round(t_update, 2),
        "update_docs": stats["docs"],
        "update_pairs": stats["pairs"],
        "verified_pairs": n_pairs,
        "serve_s": round(t_serve, 2),
        "serve_mode": "pair_stats",
        "update_point_s": round(t_point, 2),
        "point_pairs": stats_pt["pairs"],
        "serve_after_point_s": round(t_serve2, 2),
        "read_footprint_1k": fp_1k,
        "read_footprint_point": fp_pt,
    }
    print(tag, json.dumps(results[tag]), flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    shutil.rmtree(tmp, ignore_errors=True)

print("wrote", out)
