#!/usr/bin/env python
"""Round-15 probe: quality_check section A/B — sequential success joins
(old) vs shared-materialized exact_topk + concurrent joins (new).

Interleaved N O N O ... reps on one session; verifies hit counts are
identical between the two layouts (same computation, same counts).

Usage: python scripts/quality_probe.py [reps]
"""
from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark import model  # noqa: E402
from lintdb_spark.operators import scoring  # noqa: E402
from lintdb_spark.queries import cascade_inputs  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("quality_probe", cpus=cpus, shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    cents, dt, ta = cascade_inputs(spark, sf_dir)
    n_quality = 32
    bq_small = model.batch_queries(spark, sf_dir, n_quality)
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )

    def build_frames():
        approx = scoring.batch_two_phase_topk(dt, ta, bq_small, cents)
        approx_hr = scoring.batch_two_phase_topk(
            dt, ta, bq_small, cents, n_probe=32, num_second_pass=400, k_top=32
        )
        exact = (
            bq_small.join(dt)
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
        exact_topk = (
            exact.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("qid", "doc_id")
            .persist()
        )
        return approx, approx_hr, exact_topk

    def run_old():
        t0 = time.time()
        approx, approx_hr, exact_topk = build_frames()
        hits = approx.join(exact_topk, ["qid", "doc_id"]).count()
        hits_hr = approx_hr.join(exact_topk, ["qid", "doc_id"]).count()
        exact_topk.unpersist()
        return time.time() - t0, hits, hits_hr

    def run_new():
        t0 = time.time()
        approx, approx_hr, exact_topk = build_frames()
        exact_topk.count()
        with ThreadPoolExecutor(max_workers=2) as qpool:
            f = qpool.submit(lambda: approx.join(exact_topk, ["qid", "doc_id"]).count())
            f_hr = qpool.submit(
                lambda: approx_hr.join(exact_topk, ["qid", "doc_id"]).count()
            )
            hits, hits_hr = f.result(), f_hr.result()
        exact_topk.unpersist()
        return time.time() - t0, hits, hits_hr

    olds, news = [], []
    ref = None
    for i in range(reps):
        dtn, h1, h2 = run_new()
        dto, h1o, h2o = run_old()
        assert (h1, h2) == (h1o, h2o), f"hit mismatch: new={h1},{h2} old={h1o},{h2o}"
        if ref is None:
            ref = (h1, h2)
        news.append(round(dtn, 3))
        olds.append(round(dto, 3))
        print(f"rep{i}: new={dtn:.3f} old={dto:.3f} hits={h1},{h2}", flush=True)
    print(f"OLD {olds} min={min(olds):.3f}")
    print(f"NEW {news} min={min(news):.3f}")
    print(f"hits identical across layouts: {ref}")
    spark.stop()


if __name__ == "__main__":
    main()
