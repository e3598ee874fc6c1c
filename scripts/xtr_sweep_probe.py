#!/usr/bin/env python
"""Round-13 instrument for VERDICT r12 "Next round" #7: is the golden
XTR Success@10 gap (0.90 vs the PLAID cascade's 0.9812) intrinsic to
XTR's token-retrieval approximation at the default knob, or a
recoverable tuning issue?

Sweep `nearest_tokens_to_fetch` (k') over the SAME golden clustered
fixture and exact-MaxSim top-10 truth the bench gate uses (BENCH-4c
shape: 32 queries x 8 q-tokens over 1000 docs x 4 tokens = 4000 corpus
tokens). At k' = all corpus tokens every (doc, q_token) similarity is
retrieved, no score is imputed, and XTR == exact MaxSim by
construction (Success@10 = 1.0) — so the sweep reads as a convergence
curve: where it crosses the cascade's 0.98 tells whether the default
k'=64 undersizes retrieval for this fixture, and the wall times tell
what the recovery costs.

Context from the paper (Lee et al. 2023): XTR trains the scorer to
concentrate positive-passage tokens inside the top-k' retrieval; at
INFERENCE they use k'=40_000 on corpus-scale token sets. An untrained
(geometry-only) fixture at k'=64 over 4000 tokens retrieves 64/4000 =
1.6% of tokens per q-token; the equivalent retrieval fraction of the
paper's setting is corpus-relative, so the sweep also reports
k'/corpus_tokens.

Results append to .scale_probe/results_xtr_sweep.json; SCALE.md §13
derives from it.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.cache import release  # noqa: E402
from lintdb_spark.golden import golden_fixture  # noqa: E402
from lintdb_spark.operators import scoring  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402

SWEEP = [
    int(x)
    for x in os.environ.get(
        "PROBE_KP_SWEEP", "16,32,64,128,192,256,384,512,1024,4000"
    ).split(",")
]

spark = get_spark("xtr_sweep_probe")
spark.sparkContext.setLogLevel("ERROR")

g_dt, g_cents, g_queries = golden_fixture(spark)
g_dt = g_dt.persist()
g_queries = g_queries.persist()
n_corpus_tokens = g_dt.count()
n_q = g_queries.select("qid").distinct().count()

# exact MaxSim top-10 truth (identical to bench BENCH-4b)
g_exact = (
    g_queries.join(g_dt)
    .select(
        "qid",
        "doc_id",
        "q_id",
        F.aggregate(
            F.zip_with("vec", "qvec", lambda x, y: x * y),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("ip"),
    )
    .groupBy("qid", "doc_id", "q_id")
    .agg(F.max("ip").alias("best"))
    .groupBy("qid", "doc_id")
    .agg(F.sum("best").alias("score"))
)
w = Window.partitionBy("qid").orderBy(
    F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
)
g_exact_topk = (
    g_exact.withColumn("rn", F.row_number().over(w))
    .filter(F.col("rn") <= 10)
    .select("qid", "doc_id")
    .persist()
)
g_exact_topk.count()

g_qids = g_queries.select("qid").distinct()
pool = g_dt.crossJoin(g_qids).select("qid", "doc_id", "token_idx", "vec")

res = {
    "corpus_tokens": int(n_corpus_tokens),
    "queries": int(n_q),
    "sweep": [],
}
for kp in SWEEP:
    t0 = time.time()
    g_xtr = scoring.batch_xtr_topk(
        pool, g_queries, k=10, nearest_tokens_to_fetch=kp
    )
    hits = g_xtr.join(g_exact_topk, ["qid", "doc_id"]).count()
    release(g_xtr)
    rec = {
        "kp": kp,
        "kp_frac_of_corpus": round(kp / n_corpus_tokens, 4),
        "success_at_10": round(hits / (n_q * 10), 4),
        "wall_s": round(time.time() - t0, 2),
    }
    res["sweep"].append(rec)
    print(json.dumps(rec), flush=True)

out = os.path.join(REPO, ".scale_probe", "results_xtr_sweep.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
results = {}
if os.path.exists(out):
    with open(out) as f:
        results = json.load(f)
results["r13"] = res
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("done", flush=True)
