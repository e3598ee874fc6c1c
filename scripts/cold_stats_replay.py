#!/usr/bin/env python
"""Round-13 replay for VERDICT r12 "Next round" #1: prove the
serve-cost fold trigger on the DEGRADED stats path — a store re-opened
COLD on a bridged scheme (fakes3://, the CI object-store fake behind
the real FsspecRemote adapter) has no local parquet footers, so before
round 13 `_table_rows` returned None and `_fold_due` silently fell
back to the flat row constant. With commit-time row counts persisted
in the meta (store.py `_record_manifest` -> `seg_rows`), the cold
store must price the outstanding flips EXACTLY like the warm LocalFS
control.

Shape (fold_cost_replay lineage, scaled to a deterministic synthetic
drift corpus so every batch stages flips):

  corpus   40 docs in 5 batches of 8; wave-w phrase P_w appears in all
           docs d >= 8w, so each batch k >= 1 pushes wave k-1's phrase
           past the floor df cap (8) — guaranteed down-flips per batch
           while nd stays <= 40 (cap pinned at the floor)
  arms     LOCAL   one store object on a tmp dir, warm footers
           COLD    fakes3:// store; before EVERY batch the local
                   staging/cache mirror is wiped and the store
                   re-opened via DedupArtifacts.load (simulated
                   process restart: zero local footers, asserted)
  passes   observe  both trigger bounds at infinity — records the raw
                    per-batch (flip_rows, fold_cost_rows) series
           fire     ARTIFACT_FOLD_COST_ROWS set to the observe pass's
                    mid-series cost — records which batch folds

Done-criterion: the COLD arm's per-batch cost series is ELEMENT-WISE
EQUAL to LOCAL's (exact counts, not byte estimates), and the fire pass
folds at the SAME batch index ("within ~1 batch" is the bar; equality
is what exact persisted counts deliver).

Results append to .scale_probe/results_cold_stats.json.
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
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark import params as P  # noqa: E402
from lintdb_spark.operators.artifacts import DedupArtifacts  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402
from test_objectstore_quirks import FAKE  # noqa: E402  (registers fakes3://)

N_DOCS = 40
BATCH = 8
WAVE_WORDS = 10

spark = get_spark("cold_stats_replay")
spark.sparkContext.setLogLevel("ERROR")


def corpus():
    """Deterministic wave corpus: doc d carries every wave phrase
    P_w with 8w <= d plus a 4-token suffix shared by its group of 4
    (the surviving near-dup signal)."""
    rows = []
    for d in range(N_DOCS):
        words = []
        for w in range(d // BATCH + 1):
            words.extend(f"w{w}{c}" for c in "abcdefghij"[:WAVE_WORDS])
        g = d // 4
        words.extend([f"s{g}", f"t{g}", f"u{g}", f"v{g}"])
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


DOCS = corpus().cache()
DOCS.count()


def run_arm(arm: str, cost_bound: int) -> list[dict]:
    """One replay pass. arm='local' keeps one warm store object;
    arm='cold' wipes the fakes3 cache mirror and re-opens the store
    before EVERY batch."""
    P.ARTIFACT_FOLD_COST_ROWS = cost_bound
    P.ARTIFACT_AUTOCOMPACT_FLIP_ROWS = 10**15  # backstop out of reach
    if arm == "local":
        path = tempfile.mkdtemp(prefix="cold_stats_local_") + "/store"
    else:
        import uuid

        path = f"fakes3://probe-bucket/cold-stats-{uuid.uuid4().hex[:8]}"
    st = DedupArtifacts.create(spark, path)
    out = []
    for b in range(N_DOCS // BATCH):
        if arm == "cold" and b > 0:
            # simulated restart: no local footers survive
            shutil.rmtree(st.fs.cache_root, ignore_errors=True)
            st = DedupArtifacts.load(spark, path)
            for t in ("pair_stats", "pair_docs"):
                for seg, rels in st._meta.get("manifests", {}).get(t, {}).items():
                    for rel in rels:
                        assert (
                            st.fs.parquet_num_rows(f"{path}/{t}/{seg}/{rel}")
                            is None
                        ), "cold arm must have no local footers"
        lo, hi = b * BATCH, (b + 1) * BATCH
        t0 = time.time()
        r = st.update(
            DOCS.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
        rec = {
            "batch": b,
            "update_s": round(time.time() - t0, 2),
            "folded": bool(r.get("folded")),
            "flip_rows_live": int(st._meta.get("flip_rows_live", 0)),
            "fold_cost_rows": st._fold_cost_rows(),
            "pair_rows": st._table_rows("pair_stats"),
            "endpoint_rows": st._table_rows("pair_docs"),
        }
        out.append(rec)
        print(arm, json.dumps(rec), flush=True)
    if arm == "local":
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return out


defaults = (P.ARTIFACT_FOLD_COST_ROWS, P.ARTIFACT_AUTOCOMPACT_FLIP_ROWS)
res = {"n_docs": N_DOCS, "batch": BATCH}
try:
    FAKE.reset()
    res["observe_local"] = run_arm("local", 10**15)
    res["observe_cold"] = run_arm("cold", 10**15)
    series_l = [r["fold_cost_rows"] for r in res["observe_local"]]
    series_c = [r["fold_cost_rows"] for r in res["observe_cold"]]
    res["cost_series_equal"] = series_l == series_c
    assert res["cost_series_equal"], (series_l, series_c)
    # threshold at the mid-series cost: both arms must fold the same batch
    mid = sorted(c for c in series_l if c)[len([c for c in series_l if c]) // 2]
    res["fire_threshold"] = int(mid)
    res["fire_local"] = run_arm("local", int(mid))
    res["fire_cold"] = run_arm("cold", int(mid))
    fl = [r["batch"] for r in res["fire_local"] if r["folded"]]
    fc = [r["batch"] for r in res["fire_cold"] if r["folded"]]
    res["first_fold_local"] = fl[0] if fl else None
    res["first_fold_cold"] = fc[0] if fc else None
    res["fold_batches_equal"] = fl == fc
    assert res["fold_batches_equal"], (fl, fc)
finally:
    P.ARTIFACT_FOLD_COST_ROWS, P.ARTIFACT_AUTOCOMPACT_FLIP_ROWS = defaults

out = os.path.join(REPO, ".scale_probe", "results_cold_stats.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
results = {}
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)
results["r13"] = res
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("PASS: cost series equal, fold batches equal", flush=True)
print(
    json.dumps(
        {
            k: res[k]
            for k in (
                "cost_series_equal",
                "fire_threshold",
                "first_fold_local",
                "first_fold_cold",
                "fold_batches_equal",
            )
        }
    ),
    flush=True,
)
