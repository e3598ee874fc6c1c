#!/usr/bin/env python
"""Round-15 optimization probe: per-query isolated measurement + plan dump.

For every declared registry query (or the subset named on argv):
  - capture df.explain("formatted") to plans/<round>/<out>/<name>.txt (round via SPARK_GRAFT_PLAN_ROUND, default r16)
  - time REPS executions of .count() (the bench's timed action) and of
    the noop sink (guide §1.4 — computes every column, so it also
    prices the result projection that count() lets Catalyst prune)

Build hooks run first (untimed), mirroring bench.py's build/serve
split, so query timings measure serve cost, not cache builds.

Usage: python scripts/opt_probe.py <out_tag> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.queries import REGISTRY  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402

REPS = 3


def main() -> None:
    out_tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    names = sys.argv[2:] or list(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("opt_probe", cpus=cpus, shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda p: p, "id bigint"
    ).count()

    # build hooks (untimed), as bench.py does before timing queries
    from lintdb_spark.queries import (
        _model_meta,
        artifact_base_store_cached,
        artifact_store_cached,
        artifact_tenant_store_cached,
        capped_shingles_cached,
        doc_lengths_cached,
        doc_shingles_cached,
        dup_clusters_cached,
        facts_cached,
        ivf_bucketed,
        jaccard_pairs_cached,
        lsh_bucketed,
        minhash_wide_cached,
        query_tokens_cached,
        text_tf_cached,
        text_tokens_cached,
        verified_pairs_cached,
        vocab_stats_cached,
    )

    t0 = time.time()
    query_tokens_cached(spark, sf_dir).count()
    _model_meta(spark, sf_dir)
    facts_cached(spark, sf_dir)
    ivf_bucketed(spark, sf_dir).count()
    lsh_bucketed(spark, sf_dir).count()
    doc_shingles_cached(spark, sf_dir).count()
    capped_shingles_cached(spark, sf_dir).count()
    minhash_wide_cached(spark, sf_dir).count()
    jaccard_pairs_cached(spark, sf_dir).count()
    verified_pairs_cached(spark, sf_dir).count()
    dup_clusters_cached(spark, sf_dir).count()
    text_tokens_cached(spark, sf_dir).count()
    doc_lengths_cached(spark, sf_dir).count()
    text_tf_cached(spark, sf_dir).count()
    vocab, total, n_docs = vocab_stats_cached(spark, sf_dir)
    vocab.count(); total.count(); n_docs.count()
    artifact_store_cached(spark, sf_dir).signatures().count()
    artifact_base_store_cached(spark, sf_dir).signatures().count()
    artifact_tenant_store_cached(spark, sf_dir).signatures(tenant=1).count()
    print(f"builds: {time.time() - t0:.1f}s", flush=True)

    plan_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16"), out_tag)
    os.makedirs(plan_dir, exist_ok=True)
    results = {}
    for name in names:
        fn = REGISTRY.get(name)
        if fn is None:
            print(f"SKIP unknown {name}")
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            best_c = best_n = None
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, sf_dir).count()
                dt = time.time() - t0
                best_c = dt if best_c is None or dt < best_c else best_c
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best_n = dt if best_n is None or dt < best_n else best_n
            results[name] = {"count": round(best_c, 3), "noop": round(best_n, 3)}
            print(f"{name:32s} count={best_c:7.3f}  noop={best_n:7.3f}", flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": repr(exc)}
            print(f"{name:32s} ERR {exc!r}", flush=True)

    with open(os.path.join(plan_dir, "_timings.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
