#!/usr/bin/env python
"""Phase-level profile of a POINT (16-doc) DedupArtifacts.update() at
sf1 — instrument for the round-9 claim that update cost is ∝ batch.
The probe showed point updates growing 14 s (sf0.1) -> 30 s (sf1);
this breaks the update into its Spark phases to find what scales.

Reuses a persistent store at .scale_probe/artifact_sf1_store (seeded
once, mirroring artifact_probe.py's seed: two half-corpus updates +
compact + vacuum + one 1k-clone update).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from lintdb_spark.operators import dedup  # noqa: E402
from lintdb_spark.operators.artifacts import (  # noqa: E402
    _BUCKET_SCHEMA,
    _DF_SCHEMA,
    _PAIRSTAT_SCHEMA,
    _SHINGLE_SCHEMA,
    DedupArtifacts,
)
from lintdb_spark.session import get_spark  # noqa: E402
from lintdb_spark.tables import load_table  # noqa: E402

SF = os.environ.get("POINT_PROFILE_SF", os.path.join(REPO, ".scale_probe", "sf1"))
STORE = os.path.join(REPO, ".scale_probe", "artifact_sf1_store")

spark = get_spark("point_profile")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents").select("doc_id", "text")

if not os.path.exists(STORE):
    t0 = time.time()
    st = DedupArtifacts.create(spark, STORE, bucket_parts=1024, doc_parts=256)
    st.update(docs.filter(F.col("doc_id") % 2 == 0))
    st.update(docs.filter(F.col("doc_id") % 2 == 1))
    st.compact()
    st.vacuum(min_age_s=0)
    batch = docs.limit(1000).withColumn("doc_id", F.col("doc_id") + 1_000_000_000)
    st.update(batch)
    print(f"seed: {time.time()-t0:.1f}s")
else:
    st = DedupArtifacts.load(spark, STORE)

point = docs.limit(16).withColumn("doc_id", F.col("doc_id") + 2_000_000_000)


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label:40s} {time.time()-t0:7.2f}s  {r if r is not None else ''}",
          flush=True)
    return r


tenant = 0
# --- mirror the update() phases, timing each ------------------------
raw = point.persist()
dparts = t("dparts collect", lambda: [
    r["dpart"] for r in raw.select(st._dpart_col(F.col("doc_id")).alias("dpart"))
    .distinct().collect()])
known = st._known_doc_ids(tenant, dparts)
b = raw.join(known, "doc_id", "left_anti").persist()
t("known anti-join count", lambda: b.count())
sh = dedup.doc_shingles(b).persist()
t("shingles count", lambda: sh.count())
wide = dedup.minhash_wide(sh, st.num_perms).persist()
t("minhash count", lambda: wide.count())
new_b = (dedup.lsh_buckets_wide(wide, bands=st.lsh_bands, num_perms=st.num_perms)
         .withColumn("bpart", st._bpart_col(F.col("bucket"))).persist())
bparts = t("bparts collect", lambda: [
    r["bpart"] for r in new_b.select("bpart").distinct().collect()])
old_b = (st._read_t("buckets", _BUCKET_SCHEMA, tenant)
         .filter(F.col("bpart").isin([int(x) for x in bparts]))
         .select("band", "bucket", "doc_id"))
left = old_b.unionByName(new_b.select("band", "bucket", "doc_id"))
right = F.broadcast(new_b.select("band", "bucket", F.col("doc_id").alias("db")))
cand = (left.withColumnRenamed("doc_id", "da").join(right, ["band", "bucket"])
        .filter(F.col("da") != F.col("db"))
        .select(F.least("da", "db").alias("doc_a"),
                F.greatest("da", "db").alias("doc_b"))
        .distinct().persist())
t("cand pairs count", lambda: cand.count())
bdf = sh.groupBy("shingle").agg(F.count("*").cast("bigint").alias("df")).persist()
t("bdf count", lambda: bdf.count())

# --- pair_stats drift machinery -------------------------------------
nd_batch = sh.select("doc_id").distinct().count()
nd_old = st._nd_shingled(tenant)
cap_old = st._df_cap(nd_old, 0.2)
cap_new = st._df_cap(nd_old + nd_batch, 0.2)
print("caps:", cap_old, cap_new)

b_sparts = t("b_sparts collect", lambda: [
    r["spart"] for r in bdf.select(st._spart_col(F.col("shingle")).alias("spart"))
    .distinct().collect()])
print("n b_sparts:", len(b_sparts))


def stored_df(sparts):
    out = st._read_t("df", _DF_SCHEMA, tenant)
    if sparts is not None:
        out = out.filter(F.col("spart").isin([int(x) for x in sparts])
                         | F.col("spart").isNull())
    return out.groupBy("shingle").agg(F.sum("df").cast("bigint").alias("df"))


j = (bdf.withColumnRenamed("df", "d_add")
     .join(stored_df(b_sparts).withColumnRenamed("df", "df_old"), "shingle", "left")
     .select("shingle",
             F.coalesce("df_old", F.lit(0)).alias("df_old"),
             (F.coalesce("df_old", F.lit(0)) + F.coalesce("d_add", F.lit(0))
              ).alias("df_new")))
crossing = j.filter((F.col("df_old") > F.lit(float(cap_old)))
                    != (F.col("df_new") > F.lit(float(cap_new)))).select("shingle")
n_crossing = t("crossing count", lambda: crossing.count())

if n_crossing:
    aff = (st._read_t("shingles", _SHINGLE_SCHEMA, tenant)
           .join(crossing, "shingle", "left_semi").select("doc_id").distinct())
    t("aff count", lambda: aff.count())
    latest = st._pair_latest(tenant).filter(F.col("n_common") >= 1)
    t("pair_latest count", lambda: latest.count())
    stale = (latest.join(aff.withColumnRenamed("doc_id", "doc_a"), "doc_a",
                         "left_semi").select("doc_a", "doc_b")
             .unionByName(latest.join(aff.withColumnRenamed("doc_id", "doc_b"),
                                      "doc_b", "left_semi")
                          .select("doc_a", "doc_b")).distinct().persist())
    t("stale count", lambda: stale.count())

# end-to-end reference number (the real API call, fresh ids)
point2 = docs.limit(16).withColumn("doc_id", F.col("doc_id") + 3_000_000_000)
t("REAL update() end-to-end", lambda: st.update(point2)["pairs"])
t("REAL update() again", lambda: st.update(
    docs.limit(16).withColumn("doc_id", F.col("doc_id") + 4_000_000_000))["pairs"])
