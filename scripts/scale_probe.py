#!/usr/bin/env python
"""One-order-of-magnitude scale probe: synthesize sf1 (10x sf0.1) and
time the headline registry queries at both scales, recording per-query
scaling exponents (alpha in t ~ size^alpha; alpha <= ~1 = linear or
better, the 100 TB design claim).

Synthesis: 10 key-shifted copies of every fact table; dims
(region/nation) copied once. Copy 0 is byte-identical to sf0.1. To
keep workload STATISTICS comparable instead of creating 10x exact
duplicates (which would change the dedup/near-dup workload, not just
its size):
- documents.text is deterministically word-PERMUTED per copy (sort
  words by md5(word || copy || position) — position-salted so repeated
  words don't collapse into runs), so cross-copy shingle overlap is
  low while length/vocab distributions are preserved;
- embeddings are deterministically jittered per copy, so cosine
  near-dup rates stay in the same regime.

Usage: python scripts/scale_probe.py [--gen-only | --run-only]
Writes the timing table to stdout; paste/merge into SCALE.md.
Data lands in .scale_probe/sf1 (gitignored, ~150 MB).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BASE = "/root/testdata/sf0.1"
# COPIES=100 + SCALE_PROBE_LABEL=sf10 gives a second order of
# magnitude on the same protocol
COPIES = int(os.environ.get("SCALE_PROBE_COPIES", "10"))
LABEL = os.environ.get("SCALE_PROBE_LABEL", "sf1")
OUT = os.path.join(REPO, ".scale_probe", LABEL)

# key families shared across tables: (table, column) -> family
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
FAMILY_SOURCE = {  # family -> (table, column) that defines the base
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
DIMS = ["region", "nation"]


def generate():
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    bases = {
        fam: con.sql(
            f"SELECT max({col}) + 1 FROM '{BASE}/{tbl}.parquet'"
        ).fetchone()[0]
        for fam, (tbl, col) in FAMILY_SOURCE.items()
    }
    for tbl in DIMS:
        con.sql(
            f"COPY (SELECT * FROM '{BASE}/{tbl}.parquet') TO "
            f"'{OUT}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    for tbl, cols in SHIFTS.items():
        parts = []
        # schema is identical across copies — fetch once, not per copy
        desc = con.sql(f"DESCRIBE SELECT * FROM '{BASE}/{tbl}.parquet'").fetchall()
        for i in range(COPIES):
            sel = []
            for cname, ctype, *_ in desc:
                if cname in cols:
                    sel.append(f"{cname} + {i * bases[cols[cname]]} AS {cname}")
                elif tbl == "documents" and cname == "text" and i > 0:
                    # per-copy deterministic word PERMUTATION: the sort
                    # key is salted with the word POSITION, so repeated
                    # words do NOT collapse into runs (a plain per-word
                    # key sorts duplicates adjacent, which manufactures
                    # shared trigrams across copies and inflated the
                    # near-dup graph ~200x in the first probe run)
                    sel.append(
                        "array_to_string(list_transform(list_sort("
                        "list_transform(string_split(text, ' '), "
                        f"(w, j) -> {{'k': md5(w || '#{i}' || '@' || j), 'w': w}})), "
                        "s -> s.w), ' ') AS text"
                    )
                elif tbl == "embeddings" and cname == "embedding" and i > 0:
                    # deterministic per-copy jitter, same regime
                    sel.append(
                        "CAST(list_transform(embedding, "
                        f"x -> x + ((hash(CAST(x * 100000 AS BIGINT) + {i}) % 100) "
                        "/ 1000.0 - 0.05)) AS FLOAT[]) AS embedding"
                    )
                else:
                    sel.append(cname)
            parts.append(f"SELECT {', '.join(sel)} FROM '{BASE}/{tbl}.parquet'")
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/{tbl}.parquet' "
            "(FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{tbl}.parquet'").fetchone()[0]
        print(f"generated {tbl}: {n} rows", file=sys.stderr)


def run():
    from lintdb_spark.queries import REGISTRY
    from lintdb_spark.session import get_spark
    import bench

    spark = get_spark("lintdb_spark_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in bench.HEADLINE]
    res_path = os.path.join(REPO, ".scale_probe", f"results_{LABEL}.json")
    results = {}
    if os.path.exists(res_path):  # resume across runs
        results = json.load(open(res_path))
    for sf_dir, label in ((BASE, "sf0.1"), (OUT, LABEL)):
        t_all = results.setdefault(label, {})
        for n in names:
            if t_all.get(n) is not None:
                continue
            try:
                t = time.time()
                REGISTRY[n](spark, sf_dir).count()  # warm (builds session caches)
                warm = time.time() - t
                best = 1e9
                for _ in range(2):
                    t = time.time()
                    REGISTRY[n](spark, sf_dir).count()
                    best = min(best, time.time() - t)
                t_all[n] = round(best, 3)
                print(f"{label} {n}: {t_all[n]} (warm pass {warm:.1f})",
                      file=sys.stderr, flush=True)
            except Exception as exc:  # noqa: BLE001 — record and continue
                t_all[n] = None
                print(f"ERR {label} {n}: {exc!r}", file=sys.stderr, flush=True)
            json.dump(results, open(res_path, "w"))
        print(f"{label} total: "
              f"{round(sum(v for v in t_all.values() if v), 1)}s",
              file=sys.stderr, flush=True)
    rows = []
    for n in names:
        a, b = results["sf0.1"].get(n), results[LABEL].get(n)
        alpha = (
            round(math.log(max(b, 1e-3) / max(a, 1e-3)) / math.log(COPIES), 2)
            if a is not None and b is not None  # 0.0 is a valid timing
            else None
        )
        rows.append((n, a, b, alpha))
    print(json.dumps({"rows": rows}))
    print(f"\n| query | sf0.1 s | {LABEL} s | alpha |")
    print("|---|---|---|---|")
    for n, a, b, alpha in sorted(
        rows, key=lambda r: -r[3] if r[3] is not None else 9  # None rows last
    ):
        print(f"| {n} | {a} | {b} | {alpha} |")


if __name__ == "__main__":
    if "--run-only" not in sys.argv:
        generate()
    if "--gen-only" not in sys.argv:
        run()
