#!/usr/bin/env python
"""Round-11 probe: tiered vs always-full auto-compaction at sf10, in
the SMALL-BATCH regime (1k-doc micro-batches on a 450k-doc compacted
base — the 100 TB shape, where per-batch data is a sliver of the
corpus).

The round-10 policy answers every segment-count trip with a FULL
corpus rewrite — at this batch:base ratio that is pure overhead: the
debt criteria (_full_compact_due) never justify a rewrite, so the
tiered policy should replace every one of those ~80 s compacts with a
batch-proportional minor merge while serve stays flat.

Modes (same seed copy, same batches; only the trigger policy differs):
- r10_full_at_16: ARTIFACT_MINOR_FANOUT=inf + BATCH_FRAC=0.0 — the
  round-10 behavior (full compact whenever any table reaches 16
  segments).
- tiered: round-11 defaults (minor merge at fanout 8; full only on
  debt, which this stream never accrues).

Records per-batch update_s, maintenance events with their own timers
(full / minor / fold), segment counts, and a serve sample every 8
batches. Results -> .scale_probe/results_minor_compact_r11.json.

Env: PROBE_BATCHES (default 34), PROBE_MODES, PROBE_FORCE=1.
sf10 documents are generated on demand with the exact scale_probe.py
recipe (100 key-shifted, word-permuted copies of sf0.1 documents).
Run with SPARK_GRAFT_DRIVER_MEM=32g.
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

SF_DIR = os.path.join(REPO, ".scale_probe", "sf10")
BASE = "/root/testdata/sf0.1"
N_BATCHES = int(os.environ.get("PROBE_BATCHES", "34"))
SERVE_EVERY = 8
OUT = os.path.join(REPO, ".scale_probe", "results_minor_compact_r11.json")


def ensure_sf10_documents() -> None:
    """documents-only sf10 synthesis, byte-identical to
    scripts/scale_probe.py's recipe (COPIES=100, position-salted word
    permutation) — the other tables aren't needed here."""
    dst = os.path.join(SF_DIR, "documents.parquet")
    if os.path.exists(dst):
        return
    import duckdb

    os.makedirs(SF_DIR, exist_ok=True)
    con = duckdb.connect()
    base_id = con.sql(
        f"SELECT max(doc_id) + 1 FROM '{BASE}/documents.parquet'"
    ).fetchone()[0]
    desc = con.sql(
        f"DESCRIBE SELECT * FROM '{BASE}/documents.parquet'"
    ).fetchall()
    parts = []
    for i in range(100):
        sel = []
        for cname, _ctype, *_ in desc:
            if cname == "doc_id":
                sel.append(f"doc_id + {i * base_id} AS doc_id")
            elif cname == "text" and i > 0:
                sel.append(
                    "array_to_string(list_transform(list_sort("
                    "list_transform(string_split(text, ' '), "
                    f"(w, j) -> {{'k': md5(w || '#{i}' || '@' || j), "
                    "'w': w})), s -> s.w), ' ') AS text"
                )
            else:
                sel.append(cname)
        parts.append(
            f"SELECT {', '.join(sel)} FROM '{BASE}/documents.parquet'"
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' (FORMAT PARQUET)"
    )
    n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"generated sf10 documents: {n} rows", flush=True)


ensure_sf10_documents()

spark = get_spark("minor_compact_probe")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
seed_docs = docs.filter(F.col("doc_id") % 10 != 0)
stream_docs = (
    docs.filter(F.col("doc_id") % 10 == 0)
    .withColumn("_b", F.pmod(F.xxhash64("doc_id"), F.lit(50)))
    .persist()
)
n_stream = stream_docs.count()
print(f"seed ~450k docs; stream {n_stream} docs over {N_BATCHES} batches",
      flush=True)

tmp = tempfile.mkdtemp(prefix="minor_probe_")
seed_path = os.path.join(tmp, "seed")
t0 = time.time()
st = DedupArtifacts.create(
    spark, seed_path, bucket_parts=1024, doc_parts=256, shingle_parts=1024
)
st.update(seed_docs.filter(F.col("doc_id") % 2 == 0))
st.update(seed_docs.filter(F.col("doc_id") % 2 == 1))
st.compact()
st.vacuum(min_age_s=0)
print(f"seed built: {time.time()-t0:.1f}s", flush=True)

results = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        results = json.load(f)

DEFAULTS = dict(
    fanout=P.ARTIFACT_MINOR_FANOUT,
    batch_frac=P.ARTIFACT_FULLCOMPACT_BATCH_FRAC,
)
MODES = {
    "r10_full_at_16": dict(fanout=10**9, batch_frac=0.0),
    "tiered": DEFAULTS,
}


def run(tag: str, fanout: int, batch_frac: float) -> dict:
    P.ARTIFACT_MINOR_FANOUT = fanout
    P.ARTIFACT_FULLCOMPACT_BATCH_FRAC = batch_frac
    mpath = os.path.join(tmp, tag)
    shutil.copytree(seed_path, mpath)
    ms = DedupArtifacts.load(spark, mpath)
    maint: list[dict] = []
    orig_compact, orig_minor, orig_fold = (
        ms.compact, ms.minor_compact, ms.fold_flips
    )

    def compact_timed():
        t0 = time.time()
        orig_compact()
        maint.append({"kind": "full", "s": round(time.time() - t0, 2)})

    def minor_timed(force=False):
        t0 = time.time()
        m = orig_minor(force=force)
        if m:
            maint.append(
                {"kind": "minor", "s": round(time.time() - t0, 2),
                 "merged": m}
            )
        return m

    def fold_timed():
        t0 = time.time()
        orig_fold()
        maint.append({"kind": "fold", "s": round(time.time() - t0, 2)})

    ms.compact, ms.minor_compact, ms.fold_flips = (
        compact_timed, minor_timed, fold_timed
    )
    batches, serves = [], []
    for b in range(N_BATCHES):
        batch = stream_docs.filter(F.col("_b") == b).drop("_b")
        n_maint = len(maint)
        t0 = time.time()
        stats = ms.update(batch, idempotency_token=("probe", b))
        dt = time.time() - t0
        segs = sum(len(ms._segments(t)) for t in ms.TABLES)
        row = {
            "batch": b,
            "docs": stats["docs"],
            "update_s": round(dt, 2),
            "segments_total": segs,
        }
        if len(maint) > n_maint:
            row["maint"] = maint[n_maint:]
        batches.append(row)
        print(f"  [{tag}] b{b}: {row}", flush=True)
        if (b + 1) % SERVE_EVERY == 0:
            t0 = time.time()
            n_pairs = ms.verified_pairs(min_jaccard=0.5).count()
            serves.append(
                {"after_batch": b, "serve_s": round(time.time() - t0, 2),
                 "pairs": n_pairs, "segments_total": segs}
            )
            print(f"  [{tag}] serve@{b}: {serves[-1]}", flush=True)
    upd = [x["update_s"] for x in batches]
    out = {
        "n_batches": N_BATCHES,
        "fanout": fanout,
        "batch_frac": batch_frac,
        "update_s_p50": sorted(upd)[len(upd) // 2],
        "update_s_max": max(upd),
        "update_s_sum": round(sum(upd), 1),
        "maint_full_s": round(
            sum(m["s"] for m in maint if m["kind"] == "full"), 1
        ),
        "maint_minor_s": round(
            sum(m["s"] for m in maint if m["kind"] == "minor"), 1
        ),
        "maint_fold_s": round(
            sum(m["s"] for m in maint if m["kind"] == "fold"), 1
        ),
        "n_full": sum(1 for m in maint if m["kind"] == "full"),
        "n_minor": sum(1 for m in maint if m["kind"] == "minor"),
        "n_fold": sum(1 for m in maint if m["kind"] == "fold"),
        "final_segments": batches[-1]["segments_total"],
        "serves": serves,
        "batches": batches,
    }
    shutil.rmtree(mpath, ignore_errors=True)
    return out


only = os.environ.get("PROBE_MODES")
try:
    for tag, kw in MODES.items():
        if only and tag not in only.split(","):
            continue
        if tag in results and not os.environ.get("PROBE_FORCE"):
            print(f"{tag}: already measured, skip", flush=True)
            continue
        print(f"=== {tag} ===", flush=True)
        results[tag] = run(tag, **kw)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(tag, "done:",
              {k: v for k, v in results[tag].items() if k != "batches"},
              flush=True)
finally:
    P.ARTIFACT_MINOR_FANOUT = DEFAULTS["fanout"]
    P.ARTIFACT_FULLCOMPACT_BATCH_FRAC = DEFAULTS["batch_frac"]
    shutil.rmtree(tmp, ignore_errors=True)
print("wrote", OUT)
