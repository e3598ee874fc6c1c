#!/usr/bin/env python
"""Round-16 diagnostic: time one artifact seed+update in a session that
already carries the bench's cached relations — reproduces the in-bench
slowdown of the single-pass write that fresh-session probes don't show.

Usage: python scripts/_warm_session_probe.py [--cold]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.operators.artifacts import DedupArtifacts  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402


def main() -> None:
    cold = "--cold" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("warm_session_probe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    store = spark.sparkContext._jsc.sc().statusStore()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    if not cold:
        from lintdb_spark.queries import (
            capped_shingles_cached,
            doc_lengths_cached,
            doc_shingles_cached,
            dup_clusters_cached,
            facts_cached,
            ivf_bucketed,
            jaccard_pairs_cached,
            lsh_bucketed,
            minhash_wide_cached,
            text_tf_cached,
            text_tokens_cached,
            verified_pairs_cached,
            vocab_stats_cached,
        )

        t0 = time.time()
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
        print(f"cache builds: {time.time() - t0:.1f}s", flush=True)

    def njobs() -> int:
        return store.jobsList(None).size()

    tmp = tempfile.mkdtemp(prefix="warm_probe_")
    st = DedupArtifacts.create(spark, tmp + "/store")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    j0, t0 = njobs(), time.perf_counter()
    st.update(docs.filter(F.col("doc_id") % 2 == 0))
    print(f"seed:   {time.perf_counter() - t0:6.2f}s jobs={njobs() - j0}")
    batch = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .limit(500)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000_000)
    )
    j0, t0 = njobs(), time.perf_counter()
    st.update(batch)
    print(f"update: {time.perf_counter() - t0:6.2f}s jobs={njobs() - j0}")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
