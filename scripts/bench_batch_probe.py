#!/usr/bin/env python
"""Focused repro of bench.py's BENCH-2 batch-search section (sf0.1 by
default) with several warm repetitions — separates a real serve-path
regression from box noise: bench.py records min-of-2, so one noisy rep
shifts the recorded qps. Round-10 instrument for the 636->547 q/s
question (VERDICT r09, What's wrong #3)."""
from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark import model  # noqa: E402
from lintdb_spark.index import Index, SearchOptions  # noqa: E402
from lintdb_spark.index.schema import (  # noqa: E402
    DataType,
    FieldType,
    Schema,
    StoredField,
    TensorField,
)
from lintdb_spark.queries import cascade_inputs  # noqa: E402
from lintdb_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NQ = int(os.environ.get("PROBE_NQ", "1000"))
REPS = int(os.environ.get("PROBE_REPS", "5"))

spark = get_spark("bench_batch_probe")
spark.sparkContext.setLogLevel("ERROR")
_warm = spark.range(64).groupBy((F.col("id") % 4).alias("g"))
_warm.applyInPandas(lambda p: p, "id bigint").count()

out = tempfile.mkdtemp(prefix="lintdb_batch_probe_")
cents, dt, ta = cascade_inputs(spark, SF)
schema = Schema(
    [
        TensorField(
            "emb", dimensions=64, roles=[FieldType.COLBERT],
            quantization="binarizer", num_centroids=0, nbits=2,
        ),
        StoredField("title", DataType.TEXT),
    ]
)
t0 = time.time()
idx = Index.create(spark, os.path.join(out, "idx"), schema)
emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
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
idx.set_coarse_quantizer("emb", np.asarray(
    [r["cvec"] for r in cents.orderBy("centroid_id").collect()], dtype=np.float32
))
sample = np.asarray([r["vec"] for r in dt.limit(4000).collect()], dtype=np.float32)
codes = (sample @ idx.centroids["emb"].T).argmax(axis=1)
from lintdb_spark.index.quantizers import Binarizer  # noqa: E402

idx.quantizers["emb"] = Binarizer.train(sample - idx.centroids["emb"][codes], 2)
idx._save_sidecars()
idx.add(ingest)
print(f"build: {time.time()-t0:.1f}s docs={idx._docs().count()}")

qrows = model.batch_queries(spark, SF, NQ).collect()
queries: dict[int, list] = {}
for r in qrows:
    queries.setdefault(r["qid"], []).append((r["q_id"], r["qvec"]))
qmats = {
    qid: np.asarray([v for _, v in sorted(toks)], dtype=np.float32)
    for qid, toks in queries.items()
}
opts = SearchOptions(n_probe=8, num_second_pass=64, centroid_score_threshold=0.0)

times = []
for i in range(REPS + 1):
    t0 = time.time()
    n = idx.search_batch(0, "emb", qmats, k=10, opts=opts).count()
    dt_s = time.time() - t0
    times.append(dt_s)
    tag = "cold" if i == 0 else f"warm{i}"
    print(f"{tag}: {dt_s:.3f}s  {NQ/dt_s:.0f} q/s  (rows={n})")
warm = times[1:]
print(
    f"SUMMARY nq={NQ} cold={times[0]:.3f}s "
    f"warm_min={min(warm):.3f}s ({NQ/min(warm):.0f} q/s) "
    f"warm_med={sorted(warm)[len(warm)//2]:.3f}s "
    f"warm_max={max(warm):.3f}s"
)

# round 11: price the FORCED cogroup fallback (the 100 TB serve path —
# blobs over the broadcast threshold) on the same batch. Bench-scale
# corpora never route here on their own, so an unmeasured fallback
# would be a latency-cliff candidate (VERDICT r10 #3).
cg_times = []
idx.force_cogroup = True
try:
    for i in range(REPS):
        t0 = time.time()
        n = idx.search_batch(0, "emb", qmats, k=10, opts=opts).count()
        dt_s = time.time() - t0
        cg_times.append(dt_s)
        print(f"cogroup{i}: {dt_s:.3f}s  {NQ/dt_s:.0f} q/s  (rows={n})")
finally:
    idx.force_cogroup = False
print(
    f"SUMMARY_COGROUP nq={NQ} "
    f"min={min(cg_times):.3f}s ({NQ/min(cg_times):.0f} q/s) "
    f"med={sorted(cg_times)[len(cg_times)//2]:.3f}s "
    f"max={max(cg_times):.3f}s "
    f"vs_blob_path={min(cg_times)/min(warm):.2f}x"
)
