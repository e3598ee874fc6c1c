#!/usr/bin/env python
"""Round-16 probe: Spark JOB COUNT and phase walls for the bench's
index_build scenario (Index.create + sidecars + add + docs count).

Job counts are load-insensitive; walls need a quiet box. Reps the add
on fresh store paths so each rep is a first commit, like the bench.

Usage: python scripts/index_add_probe.py [reps]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.index import Index  # noqa: E402
from lintdb_spark.index.quantizers import Binarizer  # noqa: E402
from lintdb_spark.index.schema import (  # noqa: E402
    DataType,
    FieldType,
    Schema,
    StoredField,
    TensorField,
)
from lintdb_spark.queries import cascade_inputs  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("index_add_probe", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    store = spark.sparkContext._jsc.sc().statusStore()

    def njobs() -> int:
        return store.jobsList(None).size()

    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    cents, dt, ta = cascade_inputs(spark, sf_dir)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ingest = (
        emb.groupBy(F.expr("vec_id div 4").alias("doc_id"))
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "embedding"))).alias("s"))
        .select(
            F.lit(0).cast("long").alias("tenant"),
            "doc_id",
            F.expr("transform(s, x -> x.embedding)").alias("emb"),
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("title"),
        )
    )
    C = np.asarray(
        [r["cvec"] for r in cents.orderBy("centroid_id").collect()],
        dtype=np.float32,
    )
    sample = np.asarray([r["vec"] for r in dt.limit(4000).collect()], dtype=np.float32)
    codes = (sample @ C.T).argmax(axis=1)

    for rep in range(reps):
        out = tempfile.mkdtemp(prefix="idx_add_probe_")
        schema = Schema(
            [
                TensorField(
                    "emb", dimensions=64, roles=[FieldType.COLBERT],
                    quantization="binarizer", num_centroids=0, nbits=2,
                ),
                StoredField("title", DataType.TEXT),
            ]
        )
        t_all = time.perf_counter()
        idx = Index.create(spark, os.path.join(out, "idx"), schema)
        idx.set_coarse_quantizer("emb", C)
        idx.quantizers["emb"] = Binarizer.train(sample - C[codes], 2)
        idx._save_sidecars()
        j0, t0 = njobs(), time.perf_counter()
        idx.add(ingest)
        j1, t1 = njobs(), time.perf_counter()
        nd = idx._docs().count()
        j2, t2 = njobs(), time.perf_counter()
        print(
            f"rep{rep}: add {t1 - t0:6.2f}s jobs={j1 - j0}; "
            f"docs_count {t2 - t1:5.2f}s jobs={j2 - j1}; "
            f"total {t2 - t_all:6.2f}s  n_docs={nd}"
        )
        import shutil

        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
