#!/usr/bin/env python
"""Round-12 instrument for the SPARSE-regime inverted flip lookup
(VERDICT r11 "What's missing" #2): the spart-pruned shingle_docs road
has only ever been measured where the cost model REJECTS it (the sf10
drift storm: S=3675 crossing shingles over P=1024 partitions matched
990/1024 — saturated). The 100 TB drift story rests on the unmeasured
sparse regime: a deployment-sized partition space (here P=8192) and a
few-hundred-shingle crossing set. This probe measures it.

Corpus engineering: S_MAX phrases, each a 3-word (one-trigram) phrase
planted in exactly JACCARD_DF_CEIL (=1000) docs — AT the df cap — plus
unique filler words per doc. A drift batch adding more containing docs
pushes each planted trigram's df over the cap: a crossing set of
exactly the phrases we choose, so S can be swept without touching the
store.

For each S in the sweep, measured on the SAME compacted store:
  - matched sparts (distinct xxhash(shingle) % P) and their fraction
  - inverted-road bytes: on-disk size of the matched spart partitions
    of shingle_docs (what the pruned scan reads)
  - flat-road bytes: on-disk size of the full doc-keyed shingles
    table (what the saturated-regime scan reads)
  - wall time of _crossing_doc_rows(...).count() down each road (the
    flat road forced via the threshold's parts_total, read-only)

Results append to .scale_probe/results_sparse_road.json; the
SCALE.md §12 row derives from it. Env: PROBE_DOCS (default 50000),
PROBE_SPARTS (default 8192), PROBE_S_SWEEP (default
"100,300,1000,2048,4096"), PROBE_FORCE=1.
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
from pyspark.sql import types as T  # noqa: E402

from lintdb_spark import params as P  # noqa: E402
from lintdb_spark.operators.artifacts import DedupArtifacts  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("PROBE_DOCS", "50000"))
SPARTS = int(os.environ.get("PROBE_SPARTS", "8192"))
S_SWEEP = [
    int(x)
    for x in os.environ.get("PROBE_S_SWEEP", "100,300,1000,2048,4096").split(",")
]
S_MAX = max(S_SWEEP)
DF_AT_CAP = int(P.JACCARD_DF_CEIL)  # plant each phrase in exactly cap docs

spark = get_spark("sparse_road_probe")
spark.sparkContext.setLogLevel("ERROR")

out = os.path.join(REPO, ".scale_probe", "results_sparse_road.json")
results = {}
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)
KEY = f"d{N_DOCS}@p{SPARTS}"
if KEY in results and not os.environ.get("PROBE_FORCE"):
    print(f"{KEY}: already measured (PROBE_FORCE=1 to redo)")
    sys.exit(0)

# ---- corpus: phrase memberships hashed over docs -------------------
# phrase i's ~DF_AT_CAP containing docs are xxhash-scattered (a
# round-robin/stride layout makes neighboring docs share most of
# their phrases — a manufactured near-dup graph); doc text = its
# phrases + 10 unique filler words. Built in Spark from a range (no
# driver-side text assembly).
doc = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
mem = (
    spark.range(S_MAX * DF_AT_CAP)
    .select(
        (F.col("id") / DF_AT_CAP).cast("long").alias("phrase"),
        F.pmod(F.xxhash64("id"), F.lit(N_DOCS)).alias("doc_id"),
    )
    .distinct()
    .groupBy("doc_id")
    .agg(F.collect_list("phrase").alias("phrases"))
)
texts = (
    doc.join(mem, "doc_id", "left")
    .select(
        "doc_id",
        F.concat_ws(
            " ",
            F.concat_ws(
                " ",
                F.transform(
                    F.coalesce("phrases", F.array()),
                    lambda p: F.concat_ws(
                        " ",
                        F.concat(F.lit("pA"), p),
                        F.concat(F.lit("pB"), p),
                        F.concat(F.lit("pC"), p),
                    ),
                ),
            ),
            # 10 unique filler words per doc
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"f{k}x"), F.col("doc_id"))
                    for k in range(10)
                ],
            ),
        ).alias("text"),
    )
)

# 200 exact-duplicate clones give the store a non-empty pair-endpoint
# registry: with an EMPTY pd_docs, AQE folds the endpoint semi-join
# to an empty relation and skips the very scans this probe times
texts = texts.unionByName(
    texts.filter(F.col("doc_id") < 200).withColumn(
        "doc_id", F.col("doc_id") + N_DOCS
    )
)

tmp = tempfile.mkdtemp(prefix="sparse_road_")
print(f"seeding {N_DOCS} docs, {S_MAX} cap-density phrases ...", flush=True)
t0 = time.time()
st = DedupArtifacts.create(
    spark,
    os.path.join(tmp, "store"),
    bucket_parts=256,
    doc_parts=64,
    shingle_parts=SPARTS,
)
st.update(texts, auto_maintain=False)
st.compact()
st.vacuum(min_age_s=0)
seed_s = round(time.time() - t0, 1)
print(f"seed+compact: {seed_s}s", flush=True)


def du(path: str) -> int:
    total = 0
    for wr, _d, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(wr, f))
            except OSError:
                pass
    return total


sd_root = os.path.join(st.path, "shingle_docs", f"v{st._version('shingle_docs')}")
sh_root = os.path.join(st.path, "shingles")
flat_bytes = du(sh_root)
inv_total_bytes = du(sd_root)
res = {
    "docs": N_DOCS,
    "shingle_parts": SPARTS,
    "df_at_cap": DF_AT_CAP,
    "seed_s": seed_s,
    "flat_table_bytes": flat_bytes,
    "inverted_table_bytes": inv_total_bytes,
    "sweep": [],
}

crossing_schema = T.StructType(
    [
        T.StructField("shingle", T.StringType()),
        T.StructField("delta", T.IntegerType()),
    ]
)
for S in S_SWEEP:
    # the crossing set: phrase trigrams 0..S-1 (each phrase is one
    # trigram "pAi pBi pCi")
    # doc_shingles preserves case: the planted trigram is verbatim
    shingles = [f"pA{i} pB{i} pC{i}" for i in range(S)]
    crossing = F.broadcast(
        spark.createDataFrame([(s, -1) for s in shingles], crossing_schema)
    )
    srow = (
        spark.createDataFrame([(s,) for s in shingles], "shingle string")
        .select(st._spart_col(F.col("shingle")).alias("spart"))
        .distinct()
        .collect()
    )
    sparts = sorted(r["spart"] for r in srow)
    matched_bytes = sum(
        du(os.path.join(sd_root, "tenant=0", f"spart={s}")) for s in sparts
    )
    # inverted road (the real sparse-regime branch), forced READ-ONLY
    # via the routing override so the r13 byte rule can't re-route
    st._road_override = "inverted"
    try:
        t0 = time.time()
        n_inv = st._crossing_doc_rows(0, crossing, None, sparts).count()
        inv_s = round(time.time() - t0, 2)
        # flat road, same override knob
        st._road_override = "flat"
        t0 = time.time()
        n_flat = st._crossing_doc_rows(0, crossing, None, sparts).count()
        flat_s = round(time.time() - t0, 2)
    finally:
        st._road_override = None
    assert n_inv == n_flat, (n_inv, n_flat)
    count_inverted = len(set(sparts)) < max(1, SPARTS // 4)
    byte_inverted = not st._flat_road_cheaper(sparts, SPARTS)
    rec = {
        "S": S,
        "matched_sparts": len(sparts),
        "matched_frac": round(len(sparts) / SPARTS, 4),
        "inverted_road_bytes": matched_bytes,
        "flat_road_bytes": flat_bytes,
        "bytes_ratio": round(matched_bytes / max(flat_bytes, 1), 4),
        "inverted_s": inv_s,
        "flat_s": flat_s,
        "rows": n_inv,
        "model_would_take_inverted": count_inverted,
        # r13 byte rule (the live router) — must agree with the count
        # proxy at every swept point (uniform partition sizes here)
        "byte_rule_takes_inverted": byte_inverted,
    }
    assert byte_inverted == count_inverted, rec
    res["sweep"].append(rec)
    print(json.dumps(rec), flush=True)
    results[KEY] = res
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)

shutil.rmtree(tmp, ignore_errors=True)
print("done", flush=True)
