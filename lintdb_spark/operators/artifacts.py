"""Incrementally-maintained dedup artifact store.

The expensive artifacts of a near-dup pipeline — per-doc shingle sets,
minhash signatures, document-frequency statistics, and LSH candidate
pairs — were session-scoped builds in earlier rounds (rebuilt from the
full corpus every run: 237 s at the sf10 probe). At 100 TB the artifact
build IS the pipeline cost, and the reference's own design is
incremental point updates on a live index (lintdb/index.cpp:481-510,
A5-A7). This store gives those artifacts the same build/serve + commit
discipline as the search Index: immutable per-batch segments published
by one atomic `_meta.json` flip (SegmentStore), updated per ingest
batch at a cost proportional to the NEW documents, not the corpus.

Exactness contract (why reads equal a from-scratch rebuild):

- signatures / shingles are pure per-document functions — a batch's
  rows never change, so per-batch segments union to exactly the
  full-corpus build.
- document frequencies are ADDITIVE: doc_shingles emits distinct
  (doc_id, shingle) and doc_ids never repeat across batches, so the
  per-batch df aggregates sum to the global df. The df CAP is applied
  at READ time with the current totals, so `capped_shingles()` is
  byte-equal to `df_capped_shingles()` over the full corpus no matter
  how ingestion was batched.
- candidate pairs: band collision is a pure function of two
  signatures, so committing each batch's new x (old ∪ new) collisions
  accumulates exactly the full bucket table's collision set — old x
  old pairs were committed by earlier batches. Jaccard VERIFICATION
  happens at read time against the current capped shingle sets (the
  df stop-set moves as the corpus grows, so verify-at-write would
  drift); `verified_pairs()` therefore equals `jaccard_verify_pairs`
  over the full corpus by construction.

Scale shape per update(): sign + band the BATCH (map-only over new
docs), one bucket join of the batch's buckets against the stored
bucket projection (bucket-bounded, never all-pairs), one vocab-sized
df aggregate of the batch. Nothing reprocesses old documents.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lintdb_spark import params
from lintdb_spark.index.store import SegmentStore
from lintdb_spark.operators import dedup

_SHINGLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shingle", T.StringType()),
    ]
)
_DF_SCHEMA = T.StructType(
    [
        T.StructField("shingle", T.StringType()),
        T.StructField("df", T.LongType()),
    ]
)
_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
    ]
)
_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


class DedupArtifacts(SegmentStore):
    """Persisted dedup artifacts with point-incremental maintenance.

    Tables (each a list of immutable per-batch segments):
      shingles    (doc_id, shingle)      raw distinct word-trigram sets
      signatures  (doc_id, m0..m{p-1})   minhash wide rows
      df          (shingle, df)          per-batch document frequencies
      cand_pairs  (doc_a, doc_b)         LSH band collisions, a < b
      simhash     (doc_id, simhash)      SimHash fingerprints (the
                                         second near-dup family, also
                                         a pure per-doc function)

    Meta carries `n_docs` (docs ingested) and `nd_shingled` (docs with
    >= 1 shingle — the df-cap denominator, matching
    df_capped_shingles' count_distinct semantics)."""

    TABLES = ["shingles", "signatures", "df", "cand_pairs", "simhash"]

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_perms: int | None = None,
        simhash_bits: int = 32,
    ):
        super().__init__(spark, path)
        self._meta = {
            "versions": {},
            "n_docs": 0,
            "nd_shingled": 0,
            "num_perms": int(num_perms or params.MINHASH_PERMS),
            "simhash_bits": int(simhash_bits),
        }

    # ---------------- lifecycle ----------------

    @classmethod
    def create(
        cls, spark: SparkSession, path: str, num_perms: int | None = None
    ) -> "DedupArtifacts":
        os.makedirs(path, exist_ok=False)
        store = cls(spark, path, num_perms)
        store._save_meta()
        return store

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "DedupArtifacts":
        import json

        store = cls(spark, path)
        with open(os.path.join(path, "_meta.json")) as f:
            store._meta = json.load(f)
        store._meta_stat = store._stat_meta()
        store._normalize_meta()
        return store

    def _all_tables(self) -> list[str]:
        return list(self.TABLES)

    def _normalize_meta(self) -> None:
        self._meta.setdefault("versions", {})
        self._meta.setdefault("n_docs", 0)
        self._meta.setdefault("nd_shingled", 0)
        self._meta.setdefault("num_perms", params.MINHASH_PERMS)
        self._meta.setdefault("simhash_bits", 32)

    @property
    def num_perms(self) -> int:
        return int(self._meta["num_perms"])

    @property
    def simhash_bits(self) -> int:
        return int(self._meta["simhash_bits"])

    # ---------------- write side ----------------

    def update(
        self,
        documents: DataFrame,
        idempotency_token: tuple[str, int] | None = None,
    ) -> dict:
        """Ingest one batch of NEW documents (doc_id, text): sign,
        band, and join against the stored corpus — cost proportional
        to the batch. One writer-locked commit publishes all four
        tables' new segments atomically; ``idempotency_token`` =
        (source_key, batch_id) rides in the same flip, so a streaming
        replay of a committed batch is a no-op (same contract as
        Index.add).

        doc_ids already present in the store are dropped (anti-join
        against stored signatures) — re-ingesting a batch is safe even
        without a token. Returns {"docs": n, "pairs": n}."""
        if idempotency_token is not None:
            key, bid = idempotency_token
            if int(bid) <= self._meta.get("stream_batches", {}).get(key, -1):
                return {"docs": 0, "pairs": 0, "replayed": True}
        with self._writer_lock():
            # the lock re-synced meta; re-check the replay watermark
            # against the LATEST committed state
            if idempotency_token is not None:
                key, bid = idempotency_token
                if int(bid) <= self._meta.get("stream_batches", {}).get(key, -1):
                    return {"docs": 0, "pairs": 0, "replayed": True}
            return self._update_locked(documents, idempotency_token)

    def _update_locked(self, documents: DataFrame, idempotency_token) -> dict:
        docs = documents.select("doc_id", "text")
        if self._segments("signatures"):
            docs = docs.join(
                self.signatures().select("doc_id"), "doc_id", "left_anti"
            )
        docs = docs.persist()
        try:
            n_new = docs.count()
            if n_new == 0:
                # still commit the replay token: an empty batch must
                # advance the watermark or the stream re-delivers it
                if idempotency_token is not None:
                    self._commit_segments([], stream_batch=idempotency_token)
                return {"docs": 0, "pairs": 0}

            sh = dedup.doc_shingles(docs).persist()
            wide = dedup.minhash_wide(sh, self.num_perms).persist()
            try:
                nd_batch = sh.select("doc_id").distinct().count()
                staged: list[tuple[str, str]] = []

                seg, p = self._stage_path("shingles")
                sh.write.mode("overwrite").parquet(p)
                staged.append(("shingles", seg))

                seg, p = self._stage_path("signatures")
                wide.write.mode("overwrite").parquet(p)
                staged.append(("signatures", seg))

                seg, p = self._stage_path("df")
                (
                    sh.groupBy("shingle")
                    .agg(F.count("*").cast("bigint").alias("df"))
                    .write.mode("overwrite")
                    .parquet(p)
                )
                staged.append(("df", seg))

                seg, p = self._stage_path("simhash")
                dedup.simhash(docs, bits=self.simhash_bits).write.mode(
                    "overwrite"
                ).parquet(p)
                staged.append(("simhash", seg))

                # new x (old ∪ new) band collisions. The batch side is
                # small — broadcast it so the stored-bucket projection
                # never shuffles (the whole-corpus side is a pure
                # in-row banding of the stored signature segments).
                new_b = dedup.lsh_buckets_wide(wide, num_perms=self.num_perms)
                all_b = new_b
                if self._segments("signatures"):
                    all_b = dedup.lsh_buckets_wide(
                        self.signatures(), num_perms=self.num_perms
                    ).unionByName(new_b)
                cand = (
                    all_b.withColumnRenamed("doc_id", "da")
                    .join(
                        F.broadcast(
                            new_b.withColumnRenamed("doc_id", "db")
                        ),
                        ["band", "bucket"],
                    )
                    .filter(F.col("da") != F.col("db"))
                    .select(
                        F.least("da", "db").alias("doc_a"),
                        F.greatest("da", "db").alias("doc_b"),
                    )
                    .distinct()
                    .persist()
                )
                try:
                    n_pairs = cand.count()
                    seg, p = self._stage_path("cand_pairs")
                    cand.write.mode("overwrite").parquet(p)
                    staged.append(("cand_pairs", seg))
                finally:
                    cand.unpersist()

                new_meta_extra = {
                    "n_docs": int(self._meta["n_docs"]) + n_new,
                    "nd_shingled": int(self._meta["nd_shingled"]) + nd_batch,
                }
                # ride the counters in the same atomic flip as the
                # segments: _commit_segments deep-copies self._meta, so
                # mutate first and restore on failure
                old_vals = {k: self._meta[k] for k in new_meta_extra}
                self._meta.update(new_meta_extra)
                try:
                    self._commit_segments(staged, stream_batch=idempotency_token)
                except BaseException:
                    self._meta.update(old_vals)
                    raise
                return {"docs": n_new, "pairs": n_pairs}
            finally:
                sh.unpersist()
                wide.unpersist()
        finally:
            docs.unpersist()

    def compact(self) -> None:
        """Consolidate every table's per-batch segments into ONE
        v<N> segment — a long-running stream appends one segment per
        micro-batch and every read unions one scan per segment, so
        periodic compaction (stream_artifacts' compact_every) keeps
        read cost flat. Semantics-preserving AND size-reducing: the
        df table pre-aggregates to one row per shingle (reads sum df
        segments anyway — vocab-sized after compaction instead of
        batches x vocab) and cand_pairs dedups. Same stage-then-flip
        protocol as Index.compact: readers of the old list are
        untouched, a crash before the flip changes nothing; run
        vacuum() afterwards to reclaim superseded dirs."""
        import copy

        with self._writer_lock():
            writers = {
                "shingles": self.shingles(),
                "signatures": self.signatures(),
                "df": self.shingle_df(),
                "cand_pairs": self.candidate_pairs(),
                "simhash": self.fingerprints(),
            }
            new_meta = copy.deepcopy(self._meta)
            segs = new_meta.setdefault("segments", {})
            man = new_meta.setdefault("manifests", {})
            for table, df in writers.items():
                if not self._segments(table):
                    continue
                new_v = self._version(table) + 1
                dst = self._table_path(table, new_v)
                df.write.mode("overwrite").parquet(dst)
                seg = f"v{new_v}"
                new_meta["versions"][table] = new_v
                segs[table] = [seg]
                man[table] = {seg: self._segment_manifest(dst)}
            self._save_meta(new_meta)
            self._meta = new_meta

    # ---------------- read side (exact vs from-scratch) ----------------

    def shingles(self) -> DataFrame:
        self._refresh_meta_if_stale()  # follow external commits
        return self._read("shingles", _SHINGLE_SCHEMA)

    def signatures(self) -> DataFrame:
        self._refresh_meta_if_stale()
        p = self.num_perms
        schema = T.StructType(
            [T.StructField("doc_id", T.LongType())]
            + [T.StructField(f"m{i}", T.LongType()) for i in range(p)]
        )
        return self._read("signatures", schema)

    def buckets(self, bands: int | None = None) -> DataFrame:
        """(doc_id, band, bucket) — pure in-row banding of the stored
        signature table; zero shuffle."""
        return dedup.lsh_buckets_wide(
            self.signatures(), bands=bands, num_perms=self.num_perms
        )

    def shingle_df(self) -> DataFrame:
        """(shingle, df) global document frequencies — sum of the
        per-batch aggregates (additive; see module docstring)."""
        return (
            self._read("df", _DF_SCHEMA)
            .groupBy("shingle")
            .agg(F.sum("df").cast("bigint").alias("df"))
        )

    def capped_shingles(self, max_df_frac: float | None = None) -> DataFrame:
        """Df-capped shingle table, equal to
        dedup.df_capped_shingles(self.shingles()) with the cap
        evaluated on the maintained statistics — the stop set costs a
        vocab-sized aggregate, never a corpus rescan."""
        max_df_frac = (
            params.JACCARD_MAX_DF_FRAC if max_df_frac is None else max_df_frac
        )
        self._refresh_meta_if_stale()
        nd = int(self._meta["nd_shingled"])
        cap = min(
            max(nd * max_df_frac, float(params.JACCARD_DF_FLOOR)),
            float(params.JACCARD_DF_CEIL),
        )
        stop = self.shingle_df().filter(F.col("df") > cap).select("shingle")
        return self.shingles().join(stop, "shingle", "left_anti")

    def fingerprints(self) -> DataFrame:
        """(doc_id, simhash) — the stored SimHash fingerprint table
        (pure per-doc, so per-batch segments union to the full-corpus
        simhash() exactly)."""
        self._refresh_meta_if_stale()
        return self._read("simhash", _SIMHASH_SCHEMA)

    def simhash_neardup(
        self, max_hamming: int = 3, bands: int = 4
    ) -> DataFrame:
        """(doc_a, doc_b, hamming) banded-Hamming near-dup pairs off
        the STORED fingerprints — pigeonhole-exact recall for
        max_hamming <= bands-1 (dedup.simhash_neardup_pairs)."""
        return dedup.simhash_neardup_pairs(
            fingerprints=self.fingerprints(),
            bits=self.simhash_bits,
            bands=bands,
            max_hamming=max_hamming,
        )

    def candidate_pairs(self) -> DataFrame:
        """(doc_a, doc_b) accumulated band collisions — exactly
        lsh_candidate_pairs(self.buckets()) (segments may overlap on a
        pair rediscovered by a later batch only if doc_ids repeated,
        which update() forbids — but distinct() anyway for safety)."""
        self._refresh_meta_if_stale()
        return self._read("cand_pairs", _PAIR_SCHEMA).distinct()

    def verified_pairs(
        self, min_jaccard: float = 0.5, min_overlap: int = 2
    ) -> DataFrame:
        """(doc_a, doc_b, n_common, jaccard) — the production near-dup
        pair set, verified at read time against the CURRENT capped
        shingle sets (so results always match a from-scratch
        jaccard_verify_pairs over the full corpus).

        The verify join is a once-per-SNAPSHOT cost (measured 141 s
        at the sf10 probe's 500k docs), so the result is persisted and
        keyed on (_meta_seq, knobs): repeated serves off an unchanged
        store are cache hits, and any committed update invalidates.
        This is the exactness trade made explicit — verify-at-write
        would be cheaper per snapshot but drifts as the df stop-set
        moves with corpus growth (module docstring)."""
        self._refresh_meta_if_stale()
        key = (getattr(self, "_meta_seq", 0), float(min_jaccard), int(min_overlap))
        cached = getattr(self, "_verified_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        df = dedup.jaccard_verify_pairs(
            self.capped_shingles(),
            None,
            min_jaccard=min_jaccard,
            min_overlap=min_overlap,
            candidates=self.candidate_pairs(),
        ).persist()
        if cached is not None:
            try:
                cached[1].unpersist(blocking=False)
            except Exception:  # noqa: BLE001 — best-effort
                pass
        self._verified_cache = (key, df)
        return df

    def cluster_map(
        self, min_jaccard: float = 0.5, min_overlap: int = 2
    ) -> DataFrame:
        """(doc_id, cluster_id) connected components over the verified
        pairs — pair maintenance is incremental; cluster formation
        re-runs over the pair set (pairs ≪ corpus, and labels are a
        global property a true incremental union would have to
        propagate anyway)."""
        return dedup.dup_clusters(
            self.verified_pairs(min_jaccard=min_jaccard, min_overlap=min_overlap)
        )

    def dedup_gate(self, documents: DataFrame) -> DataFrame:
        """Surviving doc_ids of an INCOMING batch after LSH collision
        against the stored corpus (cross-corpus dedup read path —
        dedup.cross_corpus_dedup off the maintained signatures)."""
        new_wide = dedup.minhash_wide(
            dedup.doc_shingles(documents.select("doc_id", "text")), self.num_perms
        )
        return dedup.cross_corpus_dedup(
            dedup.lsh_buckets_wide(new_wide, num_perms=self.num_perms),
            self.buckets(),
        )
