"""The Index: create / load / train / add / remove / update / merge /
search over parquet-backed tables — the Spark rebuild of the
reference's IndexIVF (lintdb/index.h:60-211).

Physical layout (SURVEY.md §7 target architecture):

    <path>/_schema.json                  — Schema (index.cpp:331-333)
    <path>/_meta.json                    — table versions + trained flag
    <path>/centroids/<field>.parquet     — IVF centroids (broadcastable)
    <path>/quantizers/<field>.json       — residual quantizer params
    <path>/docs/v<N>/                    — forward store, partitioned by
                                           tenant: scalars + per-colbert
                                           codes/residuals/num_tokens
                                           (roles Stored+Context, B7/B8)
    <path>/postings/<field>/v<N>/        — inverted store, partitioned by
                                           (tenant, centroid_id): key-only
                                           posting rows (B5; ColBERT
                                           postings carry no values,
                                           DocEncoder.cpp:107-130)

Design-for-scale notes:
- tenant is a partition column on every table -> structural tenant
  isolation AND pruning, the analogue of the reference's key-prefix
  layout (KeyBuilder.h:13-14).
- postings partitioned by centroid_id -> the IVF probe (`centroid_id
  IN probes`) is partition pruning, i.e. only n_probe/num_centroids of
  the inverted data is ever read — same asymptotics as opening n_probe
  RocksDB posting lists.
- EVERY mutation commits through _meta.json — a poor-man's Delta log.
  A table's live state is the list of SEGMENT directories recorded in
  meta["segments"][table]. add/merge stage each table's new rows into
  a fresh seg-<uuid> directory and only then flip the meta (one
  rename-atomic JSON write covering all tables at once); remove/update
  write one consolidated v<N> segment and point the list at it. A
  crash anywhere before the flip leaves orphan directories that no
  reader ever sees — a retry cannot duplicate rows (the crash-injection
  test asserts this). The reference gets the same guarantee from a
  single RocksDB WriteBatch (lintdb/invlists/IndexWriter.cpp:22-58).
- centroid matrices live in driver memory / broadcasts (num_centroids
  ~ sqrt(total tokens): 65536 x 128 fp32 = 32 MB at the reference's
  largest published config — BASELINE.md).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lintdb_spark.cache import tag_broadcasts, tag_cached
from lintdb_spark.index import coarse
from lintdb_spark.index.query import (
    AndQuery,
    MatchQuery,
    OrQuery,
    SearchOptions,
    TermQuery,
    VectorQuery,
)
from lintdb_spark.index.quantizers import (
    Binarizer,
    IdentityQuantizer,
    ProductQuantizer,
    quantizer_from_json,
    quantizer_to_json,
)
from lintdb_spark.index.schema import FieldType, QuantizerType, Schema
from lintdb_spark.index.store import SegmentStore


def _parse_byte_conf(value, default: int) -> int:
    """Parse a Spark byte-size conf value. Spark returns these as
    strings that may carry a unit suffix ('10485760b' — the stock
    default —, '64m', '1g', '10mb'); a plain int() would reject them
    and silently fall back, ignoring the user's configured threshold.
    '-1' (feature disabled) passes through as -1."""
    if value is None:
        return default
    s = str(value).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in "kmgt":
        mult = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}[s[-1]]
        s = s[:-1]
    try:
        # multiply BEFORE truncating: '1.5g' is 1.5 GiB, not 1 GiB
        return int(float(s) * mult)
    except ValueError:
        return default


def _tags_broadcasts(fn):
    """Wrap a serve entry point so every per-call broadcast it creates
    (via ``Index._bc``) is tagged onto the returned DataFrame for
    ``cache.release``. Only the OUTERMOST serve call owns the pending
    list — search() delegating to search_xtr() must not reset it; the
    outer wrapper tags the combined set on the frame it returns."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        tls = self._bcast_tls  # THREAD-local: the HTTP server runs
        # concurrent lock-free searches on one shared Index; shared
        # instance state here would cross-tag (and then prematurely
        # release) another request's broadcasts
        outer = getattr(tls, "pending", None) is None
        if outer:
            tls.pending = []
        try:
            out = fn(self, *args, **kwargs)
            if outer and tls.pending:
                tag_broadcasts(out, *tls.pending)
            return out
        except BaseException:
            # broadcasts created BEFORE the failure (e.g. bc_q built,
            # then a missing-field KeyError) would otherwise leak one
            # blob per failed request on a long-lived server — exactly
            # the leak this mechanism exists to prevent. Best-effort
            # unpersist, then re-raise.
            if outer:
                for b in tls.pending:
                    try:
                        b.unpersist(blocking=False)
                    except Exception:  # noqa: BLE001
                        pass
            raise
        finally:
            if outer:
                tls.pending = None

    return wrapper


_POSTINGS_CACHE_MAX = 64  # serve-postings LRU slots (fields x tenants)


class Index(SegmentStore):
    def __init__(self, spark: SparkSession, path: str, schema: Schema):
        super().__init__(spark, path)  # segment-store core (meta, locks)
        self.schema = schema
        self.centroids: dict[str, np.ndarray] = {}
        self.quantizers: dict[str, object] = {}
        self._meta = {"versions": {}, "trained": False}
        # per-call broadcast tracking: a THREAD-local list, non-None
        # only while that thread is inside a @_tags_broadcasts serve
        # entry point (see _bc); thread-local because the HTTP server
        # issues concurrent searches against one shared Index
        import threading

        self._bcast_tls = threading.local()
        # guards the _postings_serve LRU (lookup/insert/evict) against
        # concurrent server threads
        self._postings_cache_lock = threading.Lock()

    def _on_meta_reloaded(self) -> None:
        # an external commit may have RE-TRAINED (new centroid
        # matrices / quantizer params), not just added segments
        self._load_trained_sidecars()

    def _bc(self, obj):
        """Broadcast ``obj``, registering the handle with the current
        serve call (if any) so cache.release can unpersist it after the
        result is materialized. Broadcasts owned by session-lifetime
        caches (the serve-blob doc map) must use
        ``sparkContext.broadcast`` directly instead."""
        b = self.spark.sparkContext.broadcast(obj)
        pending = getattr(self._bcast_tls, "pending", None)
        if pending is not None:
            pending.append(b)
        return b

    # ---------------- lifecycle (A1-A3, A9) ----------------

    @classmethod
    def create(cls, spark: SparkSession, path: str, schema: Schema) -> "Index":
        """A1: fresh index — directory + schema sidecar, untrained
        quantizers (lintdb/index.cpp:60-74)."""
        idx = cls(spark, path, schema)
        idx.fs.makedirs(path, exist_ok=False)
        idx._save_sidecars()
        return idx

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Index":
        """A2: open existing index from sidecars (index.cpp:40-58)."""
        from lintdb_spark.index.fs import filesystem_for

        fs = filesystem_for(path)
        schema = Schema.from_json(
            fs.open_read(os.path.join(path, "_schema.json")).decode()
        )
        idx = cls(spark, path, schema)
        idx._storefs = fs  # reuse (shares the staged-FS cache dir)
        # stat BEFORE read (see DedupArtifacts.load): read-then-stat
        # could pair stale meta bytes with a concurrent commit's
        # identity, making the staleness check skip the reload and the
        # CAS meta flip silently erase that commit
        idx._meta_stat = idx._stat_meta()
        idx._meta = json.loads(fs.open_read(os.path.join(path, "_meta.json")))
        idx._normalize_meta()
        idx._load_trained_sidecars()
        return idx

    def _normalize_meta(self, meta: dict | None = None) -> None:
        # normalize once per (re)load: _version()/_rewrite_tables()
        # index _meta['versions'] directly, so a legacy add-only meta
        # without the key would load fine but KeyError on the first
        # mutation. super() also decodes the on-disk manifest coding.
        # Operates on `meta` (may be a not-yet-published dict from the
        # staleness refresh — see SegmentStore._normalize_meta).
        meta = self._meta if meta is None else meta
        super()._normalize_meta(meta)
        if "segments" not in meta:
            # pre-segment layout: each table's live data is its v<N>
            # dir. Enumerate the SCHEMA's tables — not versions.items():
            # an add-only legacy index never wrote versions at all
            # (implicit v0 dirs), and would otherwise load with no
            # segments registered, reading empty and letting vacuum()
            # delete the live v0 dirs as orphans.
            versions = meta.get("versions", {})
            tables = self._all_tables(self.schema)
            meta["segments"] = {
                t: [f"v{versions.get(t, 0)}"]
                for t in tables
                if self.fs.isdir(
                    os.path.join(self.path, t, f"v{versions.get(t, 0)}")
                )
            }

    def _load_trained_sidecars(self) -> None:
        """(Re)load centroids + quantizers from disk — shared by
        load() and the cross-process staleness refresh (an external
        RE-TRAIN commit changes these, not just the segment lists;
        scoring new postings against old centroid matrices would
        return garbage or IndexError)."""
        # rebuilt from SCRATCH each (re)load: an external commit that
        # deleted or renamed a field's sidecar must drop that field's
        # trained state here, not leave the reader serving it forever
        # (merging into copies of the old dicts did exactly that)
        import io

        new_c: dict[str, np.ndarray] = {}
        new_q: dict[str, object] = {}
        for fld in self.schema.colbert_fields():
            cpath = os.path.join(self.path, "centroids", f"{fld.name}.parquet")
            if self.fs.exists(cpath):
                pdf = pd.read_parquet(
                    io.BytesIO(self.fs.open_read(cpath))
                ).sort_values("centroid_id")
                new_c[fld.name] = np.vstack(pdf["vec"].to_numpy()).astype(np.float32)
            qpath = os.path.join(self.path, "quantizers", f"{fld.name}.json")
            if self.fs.exists(qpath):
                new_q[fld.name] = quantizer_from_json(
                    self.fs.open_read(qpath).decode()
                )
        # swap via two reference assignments AFTER every file read
        # succeeded: a concurrent search sees either the old dicts or
        # the new ones, never a half-reloaded dict (a search reading
        # centroids and quantizers across the swap boundary can still
        # mix generations for one request — the window is two adjacent
        # attribute reads; callers needing strict isolation should
        # serve from a per-request Index.load)
        self.centroids = new_c
        self.quantizers = new_q

    def copy_trained(self, path: str) -> "Index":
        """A3: clone trained state (centroids/quantizers) into a fresh
        writable index (index.cpp:76-90)."""
        idx = Index.create(self.spark, path, self.schema)
        idx.centroids = dict(self.centroids)
        idx.quantizers = dict(self.quantizers)
        idx._meta["trained"] = self._meta["trained"]
        idx._save_sidecars()
        return idx

    def _save_sidecars(self) -> None:
        """A9 save(): schema + meta + centroids + quantizer params
        (index.cpp:317-357). Heavy (rewrites centroid matrices) — used
        at create/train/set-quantizer time; the segment-commit hot path
        uses the meta-only _save_meta."""
        import io

        self.fs.write_atomic(
            os.path.join(self.path, "_schema.json"),
            self.schema.to_json().encode(),
        )
        self.fs.makedirs(os.path.join(self.path, "centroids"), exist_ok=True)
        self.fs.makedirs(os.path.join(self.path, "quantizers"), exist_ok=True)
        # sidecars first, each atomically, THEN the _meta.json flip:
        # the meta flip is the one commit point a cross-process reader
        # keys its staleness refresh on, so every byte the refresh will
        # reload must already be durable when the flip lands (flipping
        # first let a racing reader load OLD or torn centroid files and
        # pin them until the next commit)
        for name, C in self.centroids.items():
            buf = io.BytesIO()
            pd.DataFrame(
                {"centroid_id": np.arange(len(C)), "vec": list(C)}
            ).to_parquet(buf)
            self.fs.write_atomic(
                os.path.join(self.path, "centroids", f"{name}.parquet"),
                buf.getvalue(),
            )
        for name, q in self.quantizers.items():
            self.fs.write_atomic(
                os.path.join(self.path, "quantizers", f"{name}.json"),
                quantizer_to_json(q).encode(),
            )
        self._save_meta()

    # ---------------- table paths / segments ----------------

    def _all_tables(self, schema: Schema | None = None) -> list[str]:
        """Every table this schema materializes — THE single list
        load()'s legacy-migration and vacuum()'s orphan sweep both
        enumerate (a new table kind added in one place is covered by
        both)."""
        sch = schema or self.schema
        return (
            ["docs"]
            + [f"postings/{f.name}" for f in sch.colbert_fields()]
            + [f"postings_text/{f.name}" for f in sch.analyzed_text_fields()]
        )

    def _collect_doc_blobs(self, docs: DataFrame, codes_c, res_c, nt_c) -> dict:
        """Materialize the serve-blob map {doc_id: (codes, residual
        bytes, n_tokens)} on the driver. Arrow-batched toPandas when
        available (the blob table is the largest driver transfer in the
        serve path — measured 0.6 s vs 3.1 s for the row-at-a-time
        py4j collect on the sf10 corpus, 50k docs x 8 KB residuals);
        the conf is flipped only for this transfer and restored, and
        any Arrow failure (unsupported type change, disabled conf
        policy) falls back to collect()."""
        sel = docs.select("doc_id", codes_c, res_c, nt_c)
        key = "spark.sql.execution.arrow.pyspark.enabled"
        try:
            old = self.spark.conf.get(key, None)
            self.spark.conf.set(key, "true")
            try:
                pdf = sel.toPandas()
            finally:
                if old is None:
                    self.spark.conf.unset(key)
                else:
                    self.spark.conf.set(key, old)
            return {
                int(d): (np.asarray(c, dtype=np.int64), bytes(r), int(n))
                for d, c, r, n in zip(
                    pdf["doc_id"], pdf[codes_c], pdf[res_c], pdf[nt_c]
                )
            }
        except Exception:  # noqa: BLE001 — Arrow path is an optimization only
            return {
                int(r["doc_id"]): (
                    np.asarray(r[codes_c], dtype=np.int64),
                    bytes(r[res_c]),
                    int(r[nt_c]),
                )
                for r in sel.collect()
            }

    def _write_postings(self, postings: DataFrame, path: str) -> None:
        """THE vector-postings segment layout, shared by add / rewrite
        / merge. Directory-partitioned by TENANT only, with rows
        shuffled on (tenant, centroid_id) and sorted on centroid_id
        inside each file — so a tenant slice is a bounded number of
        well-sized files (~shuffle.partitions, re-split by
        maxRecordsPerFile) whose row groups carry centroid_id min/max
        stats. Earlier rounds dir-partitioned by (tenant, centroid_id):
        dir-level centroid pruning looked attractive, but every serve
        path reads through the _postings_serve tenant-slice cache
        (which clusters in memory), so the 8,000 centroid dirs bought
        nothing and cost the classic small-files problem — the sf10
        probe paid 6,183 file opens (and, pre-manifest, a 6,183-task
        listing job) on every cold start. One file per (task, tenant)
        is the 100 TB-correct shape: file count scales with cluster
        parallelism, not with num_centroids."""
        (
            postings.repartition("tenant", "centroid_id")
            .sortWithinPartitions("tenant", "centroid_id")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 5_000_000)
            .partitionBy("tenant")
            .parquet(self.fs.spark_write_path(path))
        )
        self.fs.publish(path)

    def _docs(self) -> DataFrame:
        return self._read("docs", self.schema.doc_spark_schema())

    def _postings(self, field: str) -> DataFrame:
        return self._read(
            f"postings/{field}",
            T.StructType(
                [
                    T.StructField("tenant", T.LongType()),
                    T.StructField("centroid_id", T.LongType()),
                    T.StructField("doc_id", T.LongType()),
                ]
            ),
        )

    def _text_postings(self, field: str) -> DataFrame:
        return self._read(
            f"postings_text/{field}",
            T.StructType(
                [
                    T.StructField("tenant", T.LongType()),
                    T.StructField("token", T.StringType()),
                    T.StructField("doc_id", T.LongType()),
                ]
            ),
        )

    # ---------------- train (A4) ----------------

    def train(self, docs_df: DataFrame, normalize: bool = True) -> None:
        """Per colbert field: k-means centroids over all token
        embeddings, then residual-quantizer training on a sqrt(n)-style
        driver sample (index.cpp:198-315). Commits sidecars + meta, so
        it serializes via the writer lock like every other mutator — a
        retrain racing a cross-process add must not lose the add's
        _meta.json update. The heavy k-means runs OUTSIDE the lock
        into locals; the lock covers only the install + sidecar
        commit (lock acquisition re-syncs meta from disk, which can
        rebuild self.centroids from sidecars — training into locals
        keeps that refresh from clobbering the new matrices)."""
        new_c: dict[str, np.ndarray] = {}
        new_q: dict[str, object] = {}
        for fld in self.schema.colbert_fields():
            k = fld.parameters.num_centroids
            if k <= 0:
                raise ValueError(f"field {fld.name}: num_centroids required to train")
            toks = docs_df.select(F.explode(F.col(fld.name)).alias("vec"))
            C = coarse.train_centroids(
                toks, k, max_iter=fld.parameters.num_iterations, normalize=normalize
            )
            new_c[fld.name] = C

            qkind = fld.parameters.quantization
            n_tokens = toks.count()
            sample_n = min(n_tokens, max(10_000, int(n_tokens**0.5)))
            frac = min(1.0, sample_n / max(n_tokens, 1))
            sample = np.asarray(
                toks.sample(fraction=frac, seed=42).limit(100_000).toPandas()["vec"].tolist(),
                dtype=np.float32,
            )
            codes = (sample @ C.T).argmax(axis=1)
            residuals = sample - C[codes]
            if qkind == QuantizerType.BINARIZER.value:
                new_q[fld.name] = Binarizer.train(residuals, fld.parameters.nbits)
            elif qkind == QuantizerType.PRODUCT.value:
                new_q[fld.name] = ProductQuantizer.train(
                    residuals,
                    fld.parameters.num_subquantizers,
                    nbits=fld.parameters.nbits or 8,
                )
            elif qkind == QuantizerType.FLOAT16.value:
                from lintdb_spark.index.quantizers import HalfQuantizer

                new_q[fld.name] = HalfQuantizer(fld.parameters.dimensions)
            else:
                new_q[fld.name] = IdentityQuantizer(fld.parameters.dimensions)
        with self._writer_lock():
            self.centroids.update(new_c)
            self.quantizers.update(new_q)
            self._meta["trained"] = True
            self._save_sidecars()

    def set_coarse_quantizer(self, field: str, centroids: np.ndarray) -> None:
        """A10: inject externally trained centroids (index.cpp:454-479).
        Lock-serialized for the same reason as train()."""
        with self._writer_lock():
            self.centroids[field] = np.asarray(centroids, dtype=np.float32)
            self._meta["trained"] = True
            self._save_sidecars()

    # ---------------- add / remove / update / merge (A5-A8) ----------------

    def _validate_ingest(self, docs_df: DataFrame) -> None:
        """B2 validateField: unknown/missing columns raise
        (DocProcessor.cpp:47-50, 200-207)."""
        expected = {f.name for f in self.schema.ingest_spark_schema().fields}
        got = set(docs_df.columns)
        if got != expected:
            raise ValueError(
                f"ingest schema mismatch: missing={sorted(expected - got)} unknown={sorted(got - expected)}"
            )

    def add(
        self,
        docs_df: DataFrame,
        idempotency_token: tuple[str, int] | None = None,
        auto_maintain: bool | None = None,
    ) -> None:
        """A5/B1: validate -> assign centroids -> encode residuals ->
        role fan-out -> STAGED multi-table append: every table's rows
        land in a fresh segment directory first, then one _meta.json
        flip publishes them all (the WriteBatch-atomicity analogue,
        IndexWriter.cpp:22-58). A crash mid-add leaves only invisible
        orphan segments — retrying cannot duplicate the batch.

        ``idempotency_token`` = (source_key, batch_id) makes REPLAYED
        batches no-ops: the token commits in the SAME meta flip as the
        segments, so a batch is either fully published with its token
        or neither — an at-least-once deliverer (foreachBatch re-runs
        the batch whenever anything after add() fails, including a
        post-add compaction) that replays an already-committed
        (source_key, batch_id) is skipped instead of appending
        duplicates. batch_ids must be monotonically increasing per
        source_key (Structured Streaming's contract)."""
        if not self._meta["trained"]:
            raise RuntimeError("index must be trained before add()")
        if idempotency_token is not None:
            key, bid = idempotency_token
            if int(bid) <= self._meta.get("stream_batches", {}).get(key, -1):
                return  # replay of a batch whose flip already committed
        self._validate_ingest(docs_df)
        # empty-batch detection moved INTO _add_encoded (round 16): the
        # old standalone docs_df.isEmpty() probe here was one full pass
        # over the un-persisted ingest lineage per add — at bench scale
        # the ingest aggregation ran once for the probe and again for
        # the cache fill. _add_encoded's persist+count now doubles as
        # the probe (0 rows -> return before any segment is staged, so
        # a zero-row micro-batch still commits nothing and never breaks
        # schema inference with a footerless segment).

        out = docs_df
        ingest_bcs = []  # centroid blobs the coarse UDFs broadcast;
        # add() is synchronous, so they are released in the outer
        # finally (a long-lived server must not leak one pair per
        # ingest — including when UDF construction itself fails
        # between fields, e.g. a missing quantizer sidecar)
        with self._writer_lock():
            # re-check the replay watermark UNDER the lock: the refresh
            # inside _writer_lock may have pulled a concurrent
            # process's commit of this very batch
            if idempotency_token is not None:
                key, bid = idempotency_token
                if int(bid) <= self._meta.get("stream_batches", {}).get(key, -1):
                    return
            try:
                return self._add_encoded(
                    out, ingest_bcs, idempotency_token, auto_maintain
                )
            finally:
                for b in ingest_bcs:
                    try:
                        b.unpersist(blocking=False)
                    except Exception:  # noqa: BLE001 — best-effort
                        pass

    def _add_encoded(
        self, out, ingest_bcs, idempotency_token, auto_maintain=None
    ) -> None:
        for fld in self.schema.colbert_fields():
            C = self.centroids[fld.name]
            q = self.quantizers[fld.name]
            assign = coarse.assign_udf(self.spark, C)
            enc = coarse.residual_encode_udf(self.spark, C, q)
            for u in (assign, enc):
                b = getattr(u, "_lintdb_bc", None)
                if b is not None:
                    ingest_bcs.append(b)
            # B2 validateField's value half (>= 1 token vector per doc,
            # non-NULL) is enforced INSIDE assign_udf: Catalyst extracts
            # Python UDFs into their own plan node below any projection,
            # so a plan-side assert_true cannot be ordered before the
            # UDF — the UDF itself raises the clear B2 error.
            out = (
                out.withColumn(f"{fld.name}__codes", assign(F.col(fld.name)))
                .withColumn(f"{fld.name}__residuals", enc(F.col(fld.name), F.col(f"{fld.name}__codes")))
                .withColumn(f"{fld.name}__num_tokens", F.size(F.col(fld.name)).cast("int"))
                .drop(fld.name)
            )

        # cache: the assign/encode UDF lineage feeds one docs write plus
        # one postings write per colbert/text field — without this every
        # action re-runs the broadcast matmuls over the full batch
        out = out.persist()
        staged: list[tuple[str, str]] = []
        try:
            # ONE count fills the cache AND is the empty-batch probe
            # (round 16, guide §1.2 step 1 — one pass instead of
            # three): previously the standalone isEmpty() ran the
            # ingest lineage once, and then the concurrently submitted
            # docs + postings writes EACH re-ran the encode lineage as
            # racing first fills of the persisted frame. Now the
            # lineage (ingest aggregation + assign/encode UDFs) runs
            # exactly once; every staged write below reads the cache.
            if out.count() == 0:
                return
            # the docs write plus one postings write per colbert/text
            # field are independent until the meta flip — overlap
            # them through the shared staging pool (round 12,
            # SegmentStore._run_writes; 1 = sequential). All plans
            # read the SAME persisted `out`, so concurrent first
            # materialization is at most duplicate cache fill, never
            # a different result.
            writes = []
            doc_cols = [f.name for f in self.schema.doc_spark_schema().fields]
            seg, p = self._stage_path("docs")
            writes.append(
                lambda df=out.select(*doc_cols), lp=p: df.write.mode(
                    "overwrite"
                )
                .partitionBy("tenant")
                .parquet(self.fs.spark_write_path(lp))
            )
            staged.append(("docs", seg))

            for fld in self.schema.colbert_fields():
                table = f"postings/{fld.name}"
                postings = (
                    out.select(
                        "tenant",
                        F.explode(F.col(f"{fld.name}__codes")).alias("centroid_id"),
                        "doc_id",
                    )
                    .distinct()
                )
                seg, p = self._stage_path(table)
                writes.append(
                    lambda df=postings, lp=p: self._write_postings(df, lp)
                )
                staged.append((table, seg))

            # analyzed TEXT fields -> token postings (inverted text
            # index, the KeyBuilder.h:264-267 text-posting analogue at
            # token level)
            from lintdb_spark.functions.text import analyze_standard

            for fld in self.schema.analyzed_text_fields():
                table = f"postings_text/{fld.name}"
                tp = (
                    out.select(
                        "tenant",
                        F.explode(analyze_standard(F.col(fld.name))).alias("token"),
                        "doc_id",
                    )
                    # one row per (token, doc) with its term frequency —
                    # same distinct keys as before, plus tf for the
                    # MatchQuery 'tf' scoring mode
                    .groupBy("tenant", "token", "doc_id")
                    .agg(F.count("*").cast("bigint").alias("tf"))
                )
                seg, p = self._stage_path(table)
                writes.append(
                    lambda df=tp, lp=p: df.write.mode("overwrite")
                    .partitionBy("tenant")
                    .parquet(self.fs.spark_write_path(lp))
                )
                staged.append((table, seg))
            self._run_writes(writes)
        finally:
            out.unpersist()
        self._commit_segments(staged, stream_batch=idempotency_token)
        # self-triggering tiered maintenance (round 11, shared
        # SegmentStore machinery — the artifact store has had the
        # always-full variant since round 10): a stream whose caller
        # never configured compact_every must not walk into the
        # segment-accretion serve cliff, and the answer to accretion
        # is the batch-proportional minor merge, not a corpus rewrite
        # per 16 micro-batches. Still under add()'s writer lock (the
        # re-entrant acquire); auto_compact=False opts out for
        # explicitly-managed indexes, and ``auto_maintain=False``
        # opts out for THIS call only (stream_ingest's explicit
        # cadence — a per-call override instead of a persistent
        # attribute mutation that would outlive the stream and leave
        # the object never self-maintaining, ADVICE r11).
        if auto_maintain is None or auto_maintain:
            self._auto_maintain()

    def remove(self, tenant: int, doc_ids: list[int]) -> None:
        """A6: delete postings + forward rows for ids — implemented as a
        version-bumped rewrite (Delta-DELETE analogue). The doc->centroid
        mapping (B6) is implicit in the codes column; posting deletion
        filters by doc_id within the tenant partition."""
        ids = set(int(i) for i in doc_ids)
        cond = (F.col("tenant") == tenant) & F.col("doc_id").isin(list(ids))
        self._remove_where(cond)

    def _remove_where(self, cond) -> None:
        """One version-bumped rewrite of every table excluding rows
        matching ``cond`` (an IN/equality predicate — pushes down to
        the parquet scan for point removals)."""
        self._rewrite_tables(lambda df: df.filter(~cond))

    def _remove_keys(self, keys_df: DataFrame) -> None:
        """Version-bumped rewrite of every table dropping rows whose
        (tenant, doc_id) appears in ``keys_df`` — the Delta
        MERGE-delete analogue, fully distributed: nothing is collected
        to the driver, so a bulk update with millions of keys is just a
        join. AQE picks broadcast-hash for small key sets (the common
        point-update case) and a shuffle join for genuinely bulk ones."""
        keys = keys_df.select("tenant", "doc_id").distinct()
        self._rewrite_tables(lambda df: df.join(keys, ["tenant", "doc_id"], "left_anti"))

    def _rewrite_tables(self, drop_rows) -> None:
        """Shared remove/update rewrite: apply ``drop_rows`` (DataFrame
        -> DataFrame) to every table, write the survivors to ONE new
        consolidated v<N> segment per table, then flip _meta.json once
        for all tables (readers of the old segment lists are
        unaffected; a crash before the flip changes nothing)."""
        with self._writer_lock():
            self._rewrite_tables_locked(drop_rows)

    def _rewrite_tables_locked(self, drop_rows) -> None:
        new_segs: dict[str, str] = {}
        docs = drop_rows(self._docs())
        new_v = self._version("docs") + 1
        _docs_path = self._table_path("docs", new_v)
        docs.write.mode("overwrite").partitionBy("tenant").parquet(
            self.fs.spark_write_path(_docs_path)
        )
        self.fs.publish(_docs_path)
        new_segs["docs"] = f"v{new_v}"

        for fld in self.schema.colbert_fields():
            table = f"postings/{fld.name}"
            p = drop_rows(self._postings(fld.name))
            new_v = self._version(table) + 1
            self._write_postings(p, self._table_path(table, new_v))
            new_segs[table] = f"v{new_v}"
        for fld in self.schema.analyzed_text_fields():
            table = f"postings_text/{fld.name}"
            if self._segments(table):
                p = drop_rows(self._text_postings(fld.name))
                new_v = self._version(table) + 1
                _tp_path = self._table_path(table, new_v)
                p.write.mode("overwrite").partitionBy("tenant").parquet(
                    self.fs.spark_write_path(_tp_path)
                )
                self.fs.publish(_tp_path)
                new_segs[table] = f"v{new_v}"
        # single commit point for every table — candidate meta built on
        # a copy, adopted only after the durable flip (see
        # _commit_segments)
        import copy

        new_meta = copy.deepcopy(self._meta)
        segs = new_meta.setdefault("segments", {})
        man = new_meta.setdefault("manifests", {})
        for table, seg in new_segs.items():
            new_meta["versions"][table] = int(seg[1:])
            segs[table] = [seg]
            # rewrite REPLACES the table's segment list, so the
            # manifest map is rebuilt (superseded entries pruned)
            man[table] = {}
            self._record_manifest(
                new_meta, table, seg, os.path.join(self.path, table, seg)
            )
        self._save_meta(new_meta)
        self._meta = new_meta

    def update(self, docs_df: DataFrame) -> None:
        """A7: remove + add (index.cpp:501-510), with the removal done
        as a distributed anti-join on (tenant, doc_id) — no driver-side
        collect anywhere in the path, so bulk updates scale to key sets
        that would OOM an IN-list.

        The cheap add() preconditions (trained index, ingest schema)
        are checked BEFORE the delete commits: otherwise a doomed add
        would leave the old rows already removed on bad input. A
        runtime failure mid-add (executor crash) can still land
        between the two flips — remove+add is two commits, exactly
        like the reference's sequential remove-then-add; re-running
        the update is the recovery."""
        if not self._meta["trained"]:
            raise RuntimeError("index must be trained before add()")
        self._validate_ingest(docs_df)
        self._remove_keys(docs_df)
        self.add(docs_df)

    def _minor_schema(self, table: str):
        """Pin the empty-union fallback's type for every index table
        (ADVICE r11): a minor-merge group whose segments all fall
        through to the listing read and yield no frames (legacy
        no-manifest segments with missing or footerless dirs) reaches
        _read_uncached's createDataFrame([], schema) — None there
        raises inside add()'s commit path. Real (non-empty) reads
        still infer from the files, so columns added later (e.g.
        text-posting tf) are unaffected."""
        if table == "docs":
            return self.schema.doc_spark_schema()
        if table.startswith("postings_text/"):
            return T.StructType(
                [
                    T.StructField("tenant", T.LongType()),
                    T.StructField("token", T.StringType()),
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("tf", T.LongType()),
                ]
            )
        if table.startswith("postings/"):
            return T.StructType(
                [
                    T.StructField("tenant", T.LongType()),
                    T.StructField("centroid_id", T.LongType()),
                    T.StructField("doc_id", T.LongType()),
                ]
            )
        return None

    def _minor_write(self, table: str, df, path: str) -> None:
        """Merged-segment layout per table kind, identical to the
        batch segments add() stages: vector postings go through THE
        shared postings writer; docs and text postings are
        tenant-partitioned parquet."""
        if table.startswith("postings/"):
            self._write_postings(df, path)
        else:
            df.write.mode("overwrite").partitionBy("tenant").parquet(
                self.fs.spark_write_path(path)
            )
            self.fs.publish(path)

    def compact(self) -> None:
        """Consolidate every table's segment list into ONE v<N>
        segment (the Delta OPTIMIZE / RocksDB manual-compaction
        analogue — the reference gets this implicitly from RocksDB's
        background LSM compaction; a segmented parquet layout needs it
        explicit). Streaming/micro-batch ingest accretes one staged
        segment per add(), and every read unions one scan per segment
        — after N small adds a search pays N scan branches and the
        per-file footer overhead. Compaction is the same
        read-survivors -> write-one-segment -> single-meta-flip
        rewrite remove/update already use, with nothing dropped;
        readers of the old segment list are untouched, and a crash
        before the flip changes nothing. Run vacuum() afterwards (age
        guard permitting) to reclaim the superseded segment dirs."""
        self._rewrite_tables(lambda df: df)

    def get_mapping(self, tenant: int, doc_id: int, field: str | None = None) -> list[int]:
        """C10 doc->centroid mapping lookup (RocksdbInvertedList.cpp:
        98-118): sorted distinct centroid ids of the doc's tokens,
        read from the codes column (B6's mapping is implicit here)."""
        field = field or self.schema.colbert_fields()[0].name
        rows = (
            self._docs()
            .filter((F.col("tenant") == tenant) & (F.col("doc_id") == doc_id))
            .select(F.explode(F.col(f"{field}__codes")).alias("c"))
            .distinct()
            .collect()
        )
        return sorted(r["c"] for r in rows)

    def merge(self, other: "Index") -> None:
        """A8: bulk-append another index's tables. Requires identical
        trained state — centroids AND residual quantizers (the
        reference documents the same constraint: merging across
        different trained state is unsafe, index.cpp:512-535; a
        different quantizer here would silently mis-decode the other
        index's residual blobs)."""
        from lintdb_spark.index.quantizers import quantizer_to_json

        for name, C in self.centroids.items():
            if name not in other.centroids or not np.allclose(C, other.centroids[name]):
                raise ValueError("merge requires identical centroids")
        for name, q in self.quantizers.items():
            oq = other.quantizers.get(name)
            if oq is None or quantizer_to_json(q) != quantizer_to_json(oq):
                raise ValueError(f"merge requires identical quantizers (field {name})")
        with self._writer_lock():
            staged: list[tuple[str, str]] = []
            seg, p = self._stage_path("docs")
            other._docs().write.mode("overwrite").partitionBy("tenant").parquet(
                self.fs.spark_write_path(p)
            )
            staged.append(("docs", seg))
            for fld in self.schema.colbert_fields():
                table = f"postings/{fld.name}"
                seg, p = self._stage_path(table)
                self._write_postings(other._postings(fld.name), p)
                staged.append((table, seg))
            for fld in self.schema.analyzed_text_fields():
                table = f"postings_text/{fld.name}"
                if other._segments(table):
                    seg, p = self._stage_path(table)
                    other._text_postings(fld.name).write.mode("overwrite").partitionBy(
                        "tenant"
                    ).parquet(self.fs.spark_write_path(p))
                    staged.append((table, seg))
            self._commit_segments(staged)

    # ---------------- search (C1-C9, D1-D8) ----------------

    def _postings_serve(self, field: str, tenant: int) -> DataFrame:
        """Serve-side postings slice (centroid_id, doc_id) for one
        tenant, PERSISTED and keyed on the committed snapshot — the
        Spark analogue of the reference keeping posting lists hot in
        RocksDB's block cache (RocksdbInvertedList reads hit RAM after
        first touch). Re-reading the partitioned parquet per serve
        call paid a many-file scan every batch (194 tasks over 6183
        partition dirs at the sf10 probe — file-open overhead, not
        data); warm batches drop that entirely. The cached columnar
        form keeps per-batch min/max stats and is clustered on
        centroid_id below, so single-query probe filters
        (centroid_id IN ...) skip non-probed batches in memory —
        cache-side partition pruning.

        Scale contract: persist() is MEMORY_AND_DISK with LRU
        eviction, so hot tenants' slices stay resident and cold ones
        spill — never a correctness risk. The entry map itself is
        LRU-capped (_POSTINGS_CACHE_MAX slots) so a server fielding
        thousands of tenants doesn't accrete unbounded persisted
        lineage; any commit (local or external via the staleness
        refresh) bumps _meta_seq and the next serve rebuilds.

        Thread safety: the multi-threaded server shares one Index, so
        lookup/insert/evict run under a lock — without it two threads
        missing on the same key both persist a slice and the loser's
        frame leaks until ContextCleaner GC, and concurrent
        move_to_end/popitem corrupt the OrderedDict. Building the
        DataFrame under the lock is cheap: persist() is lazy, no job
        runs until a caller triggers an action outside the lock."""
        with self._postings_cache_lock:
            cache = getattr(self, "_postings_serve_cache", None)
            if cache is None:
                from collections import OrderedDict

                cache = self._postings_serve_cache = OrderedDict()
            key = (field, int(tenant))
            seq = getattr(self, "_meta_seq", 0)
            slot = cache.get(key)
            if slot is not None and slot[0] == seq:
                cache.move_to_end(key)
                return slot[1]
            n_parts = self.spark.sparkContext.defaultParallelism
            df = (
                self._postings(field)
                .filter(F.col("tenant") == int(tenant))
                .select("centroid_id", "doc_id")
                .repartition(n_parts, "centroid_id")
                .sortWithinPartitions("centroid_id")
                .persist()
            )
            if slot is not None:
                try:
                    slot[1].unpersist(blocking=False)
                except Exception:  # noqa: BLE001 — best-effort
                    pass
            cache[key] = (seq, df)
            cache.move_to_end(key)
            while len(cache) > _POSTINGS_CACHE_MAX:
                _, old = cache.popitem(last=False)
                try:
                    old[1].unpersist(blocking=False)
                except Exception:  # noqa: BLE001 — best-effort
                    pass
            return df

    def _top_centroids(self, field: str, qtok: np.ndarray, opts: SearchOptions) -> list[int]:
        """C6/C7 KnnNearestCentroids (KnnNearestCentroids.cpp:38-110):
        each token nominates its top k_top_centroids; a centroid's score
        is the max over ONLY those nominations (a score outside a
        token's top-k never contributes); non-positive scores dropped;
        top n_probe survive. Delegates to the batched implementation so
        single-query and batch serve can never drift."""
        return [c for _, c in self._top_centroids_batch(field, {0: qtok}, opts)]

    def _top_centroids_batch(
        self, field: str, qmats: dict[int, np.ndarray], opts: SearchOptions
    ) -> list[tuple[int, int]]:
        """Probe selection for a WHOLE query batch in a few vectorized
        numpy passes — returns [(qid, centroid_id), ...] in per-query
        rank order. The per-query Python loop this replaces was the
        single largest cost of the warm sf10 batch (measured 5.8 s of
        the 8.6 s wall for 1000 x 8-token queries at 8000 centroids —
        driver-side and single-threaded, it dwarfed the distributed
        cascade it fed).

        Selection semantics are IDENTICAL to the sequential form (the
        declarative twin ann.top_centroids and the oracle pin them):
        float64 scores, per-token nomination ranked on round(score, 6)
        with ascending-centroid_id tie-breaks, per-query centroid score
        = max over its nominations' RAW scores, positives only, top
        n_probe by (round(high, 6) desc, centroid_id asc). Tie-breaks
        survive vectorization exactly: rounded scores live on the 1e-6
        grid, so rint(r6 * 1e6) is an exact integer image of r6, and
        the composite integer key ``K6 * M + (M - 1 - cid)`` is a
        strict total order equal to (r6 desc, cid asc) — argpartition
        over it selects precisely the stable-argsort head, with no
        float-boundary ambiguity.

        Memory: queries are processed in ~64 MB score-matrix chunks, so
        a 10k-query batch never materializes a (total_tokens x M)
        matrix."""
        C = self.centroids[field].astype(np.float64)
        M = C.shape[0]
        k_top = min(max(opts.k_top_centroids, 1), M)
        cid_tail = (M - 1 - np.arange(M, dtype=np.int64))[None, :]
        qids = list(qmats)
        chunk_tokens = max(1, (64 << 20) // (8 * max(M, 1)))
        out: list[tuple[int, int]] = []
        i = 0
        while i < len(qids):
            j, tok = i, 0
            while j < len(qids) and (
                tok == 0 or tok + np.asarray(qmats[qids[j]]).shape[0] <= chunk_tokens
            ):
                tok += np.asarray(qmats[qids[j]]).shape[0]
                j += 1
            chunk_q = qids[i:j]
            i = j
            Qall = np.concatenate(
                [np.asarray(qmats[q], dtype=np.float64) for q in chunk_q], axis=0
            )
            scores = Qall @ C.T  # (tok, M)
            # rint(x * 1e6) == rint(round(x, 6) * 1e6): numpy's round
            # IS scale-rint-unscale, so the integer image is computed
            # directly without materializing the rounded matrix
            key = np.rint(scores * 1e6).astype(np.int64) * M + cid_tail
            nom = np.argpartition(-key, k_top - 1, axis=1)[:, :k_top]
            vals = np.take_along_axis(scores, nom, axis=1)
            pos = 0
            for q in chunk_q:
                t = np.asarray(qmats[q]).shape[0]
                c_ids = nom[pos : pos + t].ravel()
                v = vals[pos : pos + t].ravel()
                pos += t
                order = np.argsort(c_ids, kind="stable")
                c_s, v_s = c_ids[order], v[order]
                uniq, first = np.unique(c_s, return_index=True)
                high = np.maximum.reduceat(v_s, first)
                m = high > 0
                # final ranking uses Python round() like the sequential
                # form always did (candidate sets are <= n_tok * k_top
                # entries — negligible)
                ranked = sorted(
                    zip(uniq[m].tolist(), high[m].tolist()),
                    key=lambda e: (-round(float(e[1]), 6), e[0]),
                )
                out.extend((int(q), int(c)) for c, _ in ranked[: opts.n_probe])
        return out

    def _plaid_udf(self, field: str, qtok: np.ndarray, threshold: float):
        """D3/D4 codes-only stage-1 scorer (plaid.cpp:38-95): per query
        token max centroid score over the doc's unique codes, sum over
        query tokens; centroids scoring below threshold (for all query
        tokens) are skipped."""
        C = self.centroids[field]
        qc = qtok.astype(np.float32) @ C.T  # (n_tok, k)
        bc = self._bc(qc)
        thr = float(threshold)

        @F.pandas_udf(T.DoubleType())
        def plaid(codes: pd.Series) -> pd.Series:
            m = bc.value
            if len(codes) == 0:
                return pd.Series(np.empty(0, dtype=np.float64))
            # vectorized: one gather + segment-max (reduceat) across
            # the whole Arrow batch; duplicate codes within a doc don't
            # change a per-token max, so the reference's unique() is
            # unnecessary. The threshold prunes, never disables: a
            # below-threshold centroid column becomes -inf for every
            # query token (reference score_documents_by_codes skips
            # such codes, plaid.cpp:39-63), and a doc with no surviving
            # column scores 0.
            code_arrs = [np.asarray(c, dtype=np.int64) for c in codes]
            lens = np.fromiter(
                (len(c) for c in code_arrs), dtype=np.int64, count=len(code_arrs)
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            M = m[:, np.concatenate(code_arrs)]
            if thr > 0.0:
                M = np.where(M.max(axis=0, keepdims=True) >= thr, M, -np.inf)
            s = np.maximum.reduceat(M, starts, axis=1).sum(axis=0)
            s = np.where(np.isfinite(s), s, 0.0)
            return pd.Series(s.astype(np.float64))

        return plaid

    def _maxsim_udf(self, field: str, qtok: np.ndarray, normalize: bool = True):
        """D6 stage-2 exact MaxSim (plaid.cpp:119-185 +
        Scorer.cpp:11-63): decode residuals -> reconstruct tokens
        (centroid + residual) -> L2-normalize (plaid.h:56's flag) ->
        sum_q max_d <q, d>."""
        C = self.centroids[field]
        q = self.quantizers[field]
        bc_q = self._bc(qtok.astype(np.float32))
        bc_c = self._bc(C)

        @F.pandas_udf(T.DoubleType())
        def maxsim(codes: pd.Series, residuals: pd.Series, num_tokens: pd.Series) -> pd.Series:
            Q = bc_q.value
            CC = bc_c.value
            if len(codes) == 0:
                return pd.Series(np.empty(0, dtype=np.float64))
            # vectorized like the batch cascade: residual blobs are
            # token-major fixed-row-size, so ONE concatenated decode +
            # one (n_q_tok x total_tokens) matmul + segment-max
            # (reduceat) scores the whole Arrow batch — no per-doc
            # Python loop. Segments are non-empty (validateField
            # rejects empty tensors).
            nts = num_tokens.to_numpy().astype(np.int64)
            toks = q.decode(b"".join(residuals), int(nts.sum())) + CC[
                np.concatenate([np.asarray(c, dtype=np.int64) for c in codes])
            ]
            if normalize:
                norms = np.linalg.norm(toks, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                toks = toks / norms
            starts = np.zeros(len(nts), dtype=np.int64)
            np.cumsum(nts[:-1], out=starts[1:])
            out = np.maximum.reduceat(Q @ toks.T, starts, axis=1).sum(axis=0)
            return pd.Series(out.astype(np.float64))

        return maxsim

    def _maxsim_adc_udf(self, field: str, qtok: np.ndarray):
        """D11 stage-2 MaxSim via PQ ADC lookup tables — the working
        version of the reference's vestigial InvertedListScanner +
        PQDistanceTables path (PQDistanceTables.cpp:10-43,
        InvertedListScanner.h:14-81): per query token an (m, 2^nbits)
        inner-product table over the PQ sub-codebooks; a doc token's
        score is <q, centroid> (the 'precomputed distance') plus the
        m table lookups for its code bytes — never reconstructing
        floats. Equals _maxsim_udf(normalize=False) exactly (up to
        float association); skips the dim-wide decode+matmul, so
        stage-2 work drops from O(n_q*dim) to O(n_q*m) per doc token.
        IP-only, like the reference (PQDistanceTables.cpp:18)."""
        from lintdb_spark.index.quantizers import ProductQuantizer

        q = self.quantizers[field]
        if not isinstance(q, ProductQuantizer):
            raise ValueError("use_adc requires a ProductQuantizer field")
        Q = np.asarray(qtok, dtype=np.float32)
        # q x centroid precomputed distances + per-query ADC tables,
        # both tiny: (n_q, n_centroids) and (n_q, m, 2^nbits)
        bc_pre = self._bc(Q @ self.centroids[field].T)
        bc_tab = self._bc(q.inner_prod_tables(Q))

        @F.pandas_udf(T.DoubleType())
        def maxsim_adc(
            codes: pd.Series, residuals: pd.Series, num_tokens: pd.Series
        ) -> pd.Series:
            pre = bc_pre.value  # (n_q, n_centroids)
            tab = bc_tab.value  # (n_q, m, k)
            n_q, m, ksub = tab.shape
            if len(codes) == 0:
                return pd.Series(np.empty(0, dtype=np.float64))
            nts = num_tokens.to_numpy().astype(np.int64)
            total = int(nts.sum())
            pqcodes = q.unpack_codes(b"".join(residuals), total)  # (N, m)
            cents = np.concatenate([np.asarray(c, dtype=np.int64) for c in codes])
            # scores (n_q, N): centroid part is a gather of pre's
            # columns; residual part accumulates the m per-subquantizer
            # table lookups one at a time — a single (n_q, N, m)
            # fancy-index would peak at m x the necessary memory
            S = pre[:, cents].copy()
            for i in range(m):
                S += tab[:, i, :][:, pqcodes[:, i]]
            starts = np.zeros(len(nts), dtype=np.int64)
            np.cumsum(nts[:-1], out=starts[1:])
            out = np.maximum.reduceat(S, starts, axis=1).sum(axis=0)
            return pd.Series(out.astype(np.float64))

        return maxsim_adc

    @staticmethod
    def _analyze_text(text: str) -> list[str]:
        """Driver-side twin of functions.text.analyze_standard."""
        from lintdb_spark.functions.text import analyze_standard_py

        return analyze_standard_py(text)

    def _match_scores(self, tenant: int, mq: MatchQuery) -> DataFrame:
        """(doc_id, mscore). 'any' scores distinct query tokens matched
        per doc; 'all' additionally keeps only docs matching every
        token; 'tf' scores the summed term frequency of matched tokens
        (postings built since the tf column carry it; older segments
        degrade to tf=1, i.e. 'any' semantics). The postings join is an
        inverted-index lookup: filter by tenant partition + token IN
        (...) predicate, then one aggregate per doc."""
        toks = sorted(set(self._analyze_text(mq.text)))
        p = self._text_postings(mq.field).filter(
            (F.col("tenant") == tenant) & F.col("token").isin(toks)
        )
        if mq.mode == "tf":
            # legacy segments (or whole tables) without the tf column
            # read as NULL -> degrade to tf=1 ('any' semantics) per row
            tf = F.coalesce(F.col("tf"), F.lit(1)) if "tf" in p.columns else F.lit(1)
            return (
                p.select("doc_id", "token", tf.alias("tf"))
                .groupBy("doc_id")
                .agg(F.sum("tf").cast("bigint").alias("mscore"))
            )
        p = p.select("doc_id", "token").distinct()
        agg = p.groupBy("doc_id").agg(F.count_distinct("token").alias("mscore"))
        if mq.mode == "all":
            agg = agg.filter(F.col("mscore") == len(toks))
        return agg

    def _scalar_predicate(self, node) -> F.Column:
        if isinstance(node, TermQuery):
            return F.col(node.field) == F.lit(node.value)
        if isinstance(node, AndQuery):
            preds = [self._scalar_predicate(c) for c in node.children]
            out = preds[0]
            for p in preds[1:]:
                out = out & p
            return out
        if isinstance(node, OrQuery):
            preds = [self._scalar_predicate(c) for c in node.children]
            out = preds[0]
            for p in preds[1:]:
                out = out | p
            return out
        raise TypeError(f"not a scalar node: {node}")

    @staticmethod
    def _vector_nodes(node) -> list:
        if isinstance(node, VectorQuery):
            return [node]
        if isinstance(node, (AndQuery, OrQuery)):
            out = []
            for c in node.children:
                out.extend(Index._vector_nodes(c))
            return out
        return []

    def _stage1(self, node, tenant: int, docs: DataFrame, opts: SearchOptions) -> DataFrame:
        """Compile a query-tree node into a stage-1 (doc_id, s1) frame —
        the DataFrame analogue of the reference's DocIterator tree
        (QueryNode.cpp:15-121) with SUM score combination
        (NaryScoringMethod default, scoring_methods.cpp:60-97):

        - Term/Match: presence scores (D1: 1.0 per matched term; match
          scores by distinct matched tokens).
        - Vector: candidates from probed posting lists with codes-only
          PLAID score (C2 + D3) — the OR-across-probed-lists semantics.
        - And: INNER join of children on doc_id, scores summed. A vector
          child therefore restricts to probed candidates — the
          reference's *approximate* AND (index_test.cpp:197-321).
        - Or: union of children, dedup by doc_id, scores summed
          (OrIterator heap-merge analogue, DocIterator.cpp:237-322).
        """
        if isinstance(node, TermQuery):
            return docs.filter(self._scalar_predicate(node)).select(
                "doc_id", F.lit(1.0).alias("s1")
            )
        if isinstance(node, MatchQuery):
            return self._match_scores(tenant, node).select(
                "doc_id", F.col("mscore").cast("double").alias("s1")
            )
        if isinstance(node, VectorQuery):
            qtok = np.asarray(node.query_tokens, dtype=np.float32)
            probes = self._top_centroids(node.field, qtok, opts)
            cand_ids = (
                self._postings_serve(node.field, tenant)
                .filter(F.col("centroid_id").isin(probes))
                .select("doc_id")
                .distinct()
            )
            plaid = self._plaid_udf(node.field, qtok, opts.centroid_score_threshold)
            return (
                docs.join(cand_ids, "doc_id")
                .select("doc_id", plaid(F.col(f"{node.field}__codes")).alias("s1"))
            )
        if isinstance(node, AndQuery):
            frames = [self._stage1(c, tenant, docs, opts) for c in node.children]
            out = frames[0]
            for i, f2 in enumerate(frames[1:], 1):
                out = out.join(
                    f2.withColumnRenamed("s1", f"_s{i}"), "doc_id"
                ).withColumn("s1", F.col("s1") + F.col(f"_s{i}")).drop(f"_s{i}")
            return out
        if isinstance(node, OrQuery):
            frames = [self._stage1(c, tenant, docs, opts) for c in node.children]
            out = frames[0]
            for f2 in frames[1:]:
                out = out.unionByName(f2)
            return out.groupBy("doc_id").agg(F.sum("s1").alias("s1"))
        raise TypeError(f"unsupported query node {node}")

    @_tags_broadcasts
    def search(
        self,
        tenant: int,
        query,
        k: int = 10,
        opts: SearchOptions | None = None,
    ) -> DataFrame:
        """C1-C9/D1-D8: full query lifecycle (QueryExecutor.cpp:14-71)
        for ARBITRARY Term/Match/Vector/And/Or trees. Returns (doc_id,
        score, <stored fields>) ordered by score desc, doc_id asc.

        If the tree contains vector nodes, stage-1 scores feed the
        num_second_pass cut and stage-2 reranks by the SUM of exact
        MaxSim over EVERY vector node — consistent with the tree's
        stage-1 SUM combination (NaryScoringMethod,
        scoring_methods.cpp:60-97). With one vector node (the only
        shape the reference can express — it wires a single
        ColBERTScorer per query, index.cpp:390) this is exact parity;
        multi-vector trees extend the same semantics. Trees without
        vector nodes keep the stage-1 boolean score as final."""
        self._refresh_meta_if_stale()
        opts = opts or SearchOptions()
        if opts.scoring_method == "xtr":
            if not isinstance(query, VectorQuery):
                raise NotImplementedError(
                    "scoring_method='xtr' supports bare VectorQuery trees"
                )
            return self.search_xtr(
                tenant, query.field, np.asarray(query.query_tokens), k=k, opts=opts
            )
        if opts.scoring_method != "plaid":
            raise ValueError(f"unknown scoring_method: {opts.scoring_method!r}")
        docs = self._docs().filter(F.col("tenant") == tenant)
        vecs = self._vector_nodes(query)
        stage1 = self._stage1(query, tenant, docs, opts)

        if opts.expected_id >= 0:
            # debug parity with the reference's expected_id trace
            # (SearchOptions.h:24-26): report the doc's stage-1 fate
            import logging

            eid = int(opts.expected_id)
            hit = stage1.filter(F.col("doc_id") == eid).select("s1").collect()
            logging.getLogger("lintdb_spark.index").info(
                "expected_id %d: %s",
                eid,
                f"stage-1 candidate, s1={hit[0]['s1']:.6f}"
                if hit
                else "NOT a stage-1 candidate (outside probed posting "
                "lists or filtered out)",
            )

        if not vecs:
            out = stage1.join(docs, "doc_id").withColumn("score", F.col("s1"))
            return self._with_metadata(out, k)

        survivors = (
            stage1.orderBy(F.col("s1").desc(), F.col("doc_id").asc())
            .limit(opts.num_second_pass)
            .join(docs, "doc_id")
        )
        if opts.expected_id >= 0:
            import logging

            eid = int(opts.expected_id)
            surv_hit = survivors.filter(F.col("doc_id") == eid).count()
            logging.getLogger("lintdb_spark.index").info(
                "expected_id %d: %s num_second_pass=%d cut",
                eid,
                "survived" if surv_hit else "ELIMINATED by",
                opts.num_second_pass,
            )
        out = survivors
        from lintdb_spark.index.quantizers import ProductQuantizer

        for i, vec in enumerate(vecs):
            # D11 routing: ADC decomposes the UNnormalized IP only, and
            # needs PQ codes; auto-on exactly under those conditions
            adc_ok = not opts.normalize and isinstance(
                self.quantizers[vec.field], ProductQuantizer
            )
            use_adc = adc_ok if opts.use_adc is None else opts.use_adc
            if use_adc and not adc_ok:
                raise ValueError(
                    "use_adc requires a ProductQuantizer field and normalize=False"
                )
            if use_adc:
                maxsim = self._maxsim_adc_udf(
                    vec.field, np.asarray(vec.query_tokens, dtype=np.float32)
                )
            else:
                maxsim = self._maxsim_udf(
                    vec.field,
                    np.asarray(vec.query_tokens, dtype=np.float32),
                    normalize=opts.normalize,
                )
            out = out.withColumn(
                f"_ms{i}",
                maxsim(
                    F.col(f"{vec.field}__codes"),
                    F.col(f"{vec.field}__residuals"),
                    F.col(f"{vec.field}__num_tokens"),
                ),
            )
        total = F.col("_ms0")
        for i in range(1, len(vecs)):
            total = total + F.col(f"_ms{i}")
        out = out.withColumn("score", total).drop(
            *[f"_ms{i}" for i in range(len(vecs))]
        )
        return self._with_metadata(out, k)

    @_tags_broadcasts
    def search_xtr(
        self,
        tenant: int,
        field: str,
        query_tokens: np.ndarray,
        k: int = 10,
        opts: SearchOptions | None = None,
    ) -> DataFrame:
        """D9/D10 XTR scoring over the real index — the working
        version of the reference's dead `ScoringMethod` seam
        (`SearchOptions.h:34-35` ships the `nearest_tokens_to_fetch`
        knob; `scoring/Scorer.h:59` is the commented-out XTRScorer).

        Retrieval pool = IVF candidates (probed posting lists), which
        is the scale approximation of the paper's global token
        retrieval; candidates' tokens are decoded ONCE into rows by an
        Arrow-batched mapInPandas, and everything after — per-q-token
        top-k' cut, missing-similarity imputation, sum, top-k — is the
        declarative `operators.scoring.xtr_topk` plan (JVM-side
        windows/aggregations). Exact-twin property: with n_probe
        covering all centroids and a lossless quantizer this equals
        xtr_topk on the raw corpus (tested)."""
        self._refresh_meta_if_stale()
        from lintdb_spark.operators import scoring as _scoring

        opts = opts or SearchOptions()
        Q = np.asarray(query_tokens, dtype=np.float32)
        codes_c, res_c, nt_c = (
            f"{field}__codes",
            f"{field}__residuals",
            f"{field}__num_tokens",
        )
        probes_df = self.spark.createDataFrame(
            [(int(c),) for c in self._top_centroids(field, Q, opts)],
            "centroid_id long",
        )
        cand_ids = (
            self._postings_serve(field, tenant)
            .join(F.broadcast(probes_df), "centroid_id")
            .select("doc_id")
            .distinct()
        )
        cand = cand_ids.join(
            self._docs().filter(F.col("tenant") == tenant), "doc_id"
        ).select("doc_id", codes_c, res_c, nt_c)
        decoded = self._decoded_token_rows(field, cand, normalize=opts.normalize)
        q_df = self.spark.createDataFrame(
            [(j, [float(x) for x in Q[j]]) for j in range(len(Q))],
            "q_id long, qvec array<double>",
        )
        topk = _scoring.xtr_topk(
            decoded, q_df, k=k, nearest_tokens_to_fetch=opts.nearest_tokens_to_fetch
        )
        # same return contract as search(): (doc_id, score, <stored>)
        stored = [
            f.name for f in self.schema.scalar_fields() if f.has_role(FieldType.STORED)
        ]
        if not stored:
            return topk
        return tag_cached(
            topk.join(
                self._docs()
                .filter(F.col("tenant") == tenant)
                .select("doc_id", *stored),
                "doc_id",
            )
            .select("doc_id", "score", *stored)
            .orderBy(F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()),
            topk,
        )

    def _decoded_token_rows(
        self, field: str, cand: DataFrame, normalize: bool = True
    ) -> DataFrame:
        """Decode candidate docs' quantized tokens into per-token rows
        (doc_id, token_idx, vec), L2-normalized when ``normalize`` (the
        plaid.h:56 flag — honored here so the XTR paths score the same
        reconstructions SearchOptions.normalize selects on the plaid
        path) — ONE Arrow-batched mapInPandas; everything downstream
        stays declarative. ``cand`` must carry (doc_id,
        <field>__codes, __residuals, __num_tokens)."""
        codes_c, res_c, nt_c = (
            f"{field}__codes",
            f"{field}__residuals",
            f"{field}__num_tokens",
        )
        quant = self.quantizers[field]
        bc_c = self._bc(self.centroids[field])

        def decode_tokens(batches):
            # residual blobs are token-major fixed-row-size, so ONE
            # concatenated decode + one gather + one normalize covers
            # the whole Arrow batch — no per-doc Python loop (same
            # vectorization as the cascade's stage-2 rerank above)
            for pdf in batches:
                CC = bc_c.value
                nts = pdf[nt_c].to_numpy(dtype=np.int64)
                total = int(nts.sum())
                if total == 0:
                    yield pd.DataFrame({"doc_id": [], "token_idx": [], "vec": []})
                    continue
                codes = np.concatenate(
                    [np.asarray(c, dtype=np.int64) for c in pdf[codes_c]]
                )
                toks = quant.decode(b"".join(pdf[res_c]), total) + CC[codes]
                if normalize:
                    norms = np.linalg.norm(toks, axis=1, keepdims=True)
                    norms[norms == 0] = 1.0
                    toks = toks / norms
                toks = toks.astype(np.float64)
                starts = np.cumsum(nts) - nts
                yield pd.DataFrame(
                    {
                        "doc_id": np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), nts),
                        "token_idx": np.arange(total, dtype=np.int64)
                        - np.repeat(starts, nts),
                        "vec": list(toks),
                    }
                )

        return cand.mapInPandas(
            decode_tokens, "doc_id long, token_idx long, vec array<double>"
        )

    @_tags_broadcasts
    def search_batch_xtr(
        self,
        tenant: int,
        field: str,
        queries: dict[int, np.ndarray],
        k: int = 10,
        opts: SearchOptions | None = None,
        doc_filter=None,
    ) -> DataFrame:
        """Batched XTR over the real index: per-qid IVF probes select
        each query's retrieval pool, every candidate doc's tokens are
        decoded ONCE (distinct-doc decode, then fanned back out to the
        qids probing it), and scoring runs as the single declarative
        ``scoring.batch_xtr_topk`` plan. Same (qid, doc_id, rank,
        score, <stored>) contract as the PLAID batch cascade."""
        self._refresh_meta_if_stale()
        from lintdb_spark.operators import scoring as _scoring

        opts = opts or SearchOptions()
        qmats = {int(qid): np.asarray(q, dtype=np.float32) for qid, q in queries.items()}
        codes_c, res_c, nt_c = (
            f"{field}__codes",
            f"{field}__residuals",
            f"{field}__num_tokens",
        )
        probe_rows = self._top_centroids_batch(field, qmats, opts)
        probes_df = self.spark.createDataFrame(
            pd.DataFrame(probe_rows, columns=["qid", "centroid_id"]).astype("int64"),
            "qid long, centroid_id long",
        )
        cand_ids = (
            self._postings_serve(field, tenant)
            .join(F.broadcast(probes_df), "centroid_id")
            .select("qid", "doc_id")
            .distinct()
        )
        docs = self._docs().filter(F.col("tenant") == tenant)
        if doc_filter is not None:
            docs = docs.join(
                self._filter_doc_ids(tenant, doc_filter), "doc_id", "left_semi"
            )
        uniq = cand_ids.select("doc_id").distinct().join(
            docs.select("doc_id", codes_c, res_c, nt_c), "doc_id"
        )
        cand_tokens = self._decoded_token_rows(
            field, uniq, normalize=opts.normalize
        ).join(cand_ids, "doc_id")
        # pandas -> Arrow fast path (the tuple-list route serializes
        # row-by-row via py4j: ~4M floats per 1000-query batch)
        queries_df = self.spark.createDataFrame(
            pd.DataFrame(
                [
                    (qid, j, q[j].astype(np.float64))
                    for qid, q in qmats.items()
                    for j in range(len(q))
                ],
                columns=["qid", "q_id", "qvec"],
            ),
            "qid long, q_id long, qvec array<double>",
        )
        topk = _scoring.batch_xtr_topk(
            cand_tokens,
            queries_df,
            k=k,
            nearest_tokens_to_fetch=opts.nearest_tokens_to_fetch,
        )
        stored = [
            f.name for f in self.schema.scalar_fields() if f.has_role(FieldType.STORED)
        ]
        if not stored:
            return topk
        return tag_cached(
            topk.join(docs.select("doc_id", *stored), "doc_id").select(
                "qid", "doc_id", "rank", "score", *stored
            ),
            topk,
        )

    def _filter_doc_ids(self, tenant: int, node) -> DataFrame:
        """Compile an arbitrary scalar/Match boolean tree into a doc_id
        DataFrame (Term -> filtered scan, Match -> inverted-index
        semi-join, And -> intersection, Or -> union). Used by
        search_batch's doc_filter so Match works at ANY depth of the
        tree, not just top-level."""
        if isinstance(node, MatchQuery):
            return self._match_scores(tenant, node).select("doc_id")
        if isinstance(node, TermQuery):
            return (
                self._docs()
                .filter((F.col("tenant") == tenant) & self._scalar_predicate(node))
                .select("doc_id")
            )
        if isinstance(node, AndQuery):
            out = self._filter_doc_ids(tenant, node.children[0])
            for c in node.children[1:]:
                out = out.join(self._filter_doc_ids(tenant, c), "doc_id", "left_semi")
            return out
        if isinstance(node, OrQuery):
            out = self._filter_doc_ids(tenant, node.children[0])
            for c in node.children[1:]:
                out = out.unionByName(self._filter_doc_ids(tenant, c))
            return out.distinct()
        raise TypeError(
            f"doc_filter supports Term/Match/And/Or nodes only, got {type(node).__name__}"
        )

    @_tags_broadcasts
    def search_batch(
        self,
        tenant: int,
        field: str,
        queries: dict[int, np.ndarray],
        k: int = 10,
        opts: SearchOptions | None = None,
        doc_filter=None,
    ) -> DataFrame:
        """Batch VECTOR search: N queries through ONE plan against the
        index tables — the Spark-native upgrade over the reference's
        per-query loop (QueryExecutor.cpp:14-71 re-opens posting lists
        per query; here the postings scan is shared and every per-query
        step is keyed by qid).

        queries: {qid: (n_tokens, dim) float32}. ``doc_filter`` is an
        optional boolean node tree (Term/Match/And/Or, Match allowed at
        any depth) applied to the candidates of EVERY query — BENCH-3
        filtered search in batch form, with the reference's
        approximate-AND semantics. Returns (qid, doc_id, rank, score,
        <stored fields>).

        Scale shape (no per-qid broadcast state): probes are computed
        driver-side on the in-memory centroid matrix (a |queries| x
        num_centroids matmul) and shipped as a small DataFrame; the
        postings scan prunes to the union of probed partitions; the
        whole two-phase cascade (PLAID -> num_second_pass cut ->
        residual decode -> exact MaxSim -> top-k) runs in ONE
        COGROUPED applyInPandas by qid — each query's tokens flow to
        its group through the shuffle, so per-executor memory is one
        group (that query's candidates + one query matrix),
        independent of batch size. The only broadcast is the centroid
        matrix itself (~32 MB at the reference's largest config).

        Physical strategy (the batch analogue of Spark's broadcast-vs-
        shuffle join selection, decided by a column-pruned size
        estimate against autoBroadcastJoinThreshold):

        - doc blobs fit the broadcast threshold -> ship the blob table
          ONCE per executor and shuffle only the (qid, doc_id) pairs;
          the cascade runs as mapInPandas over qid partitions with
          queries + blobs read from broadcasts (zero blob shuffle).
        - else -> the cogrouped path: one qid shuffle carrying each
          candidate's codes+residuals to its group. Per-executor
          memory stays ONE group (that query's candidates), bounded
          regardless of corpus size — the 100 TB path. One shuffle
          stage beats three for any batch where candidates-per-query
          is within ~100x of num_second_pass (measured 1.8x faster
          end-to-end at bench scale); for corpora where probe pruning
          still yields millions of candidates per query, the
          declarative twin ``scoring.batch_two_phase_topk`` keeps
          stage-1 codes-only and joins residual rows for survivors
          alone — same semantics, shuffle-lean."""
        self._refresh_meta_if_stale()
        opts = opts or SearchOptions()
        if opts.scoring_method == "xtr":
            return self.search_batch_xtr(
                tenant, field, queries, k=k, opts=opts, doc_filter=doc_filter
            )
        if opts.scoring_method != "plaid":
            raise ValueError(f"unknown scoring_method: {opts.scoring_method!r}")
        qmats = {int(qid): np.asarray(q, dtype=np.float32) for qid, q in queries.items()}
        quant = self.quantizers[field]
        codes_c, res_c, nt_c = (
            f"{field}__codes",
            f"{field}__residuals",
            f"{field}__num_tokens",
        )

        # driver-side frames go through pandas -> Arrow (fast path; the
        # tuple-list route serializes row-by-row via py4j)
        probe_rows = self._top_centroids_batch(field, qmats, opts)
        probes_df = self.spark.createDataFrame(
            pd.DataFrame(probe_rows, columns=["qid", "centroid_id"]).astype("int64"),
            "qid long, centroid_id long",
        )
        # serve-cache key SNAPSHOT taken BEFORE the docs plan below is
        # built: if a concurrent commit lands in between, we at worst
        # cache the NEW state's blobs under the OLD key (refreshed on
        # the next call) — reading the seq after building the plan
        # could cache the OLD state's blobs under the NEW key, serving
        # stale results until the next mutation
        cache_key = (tenant, field, getattr(self, "_meta_seq", 0))
        cand_ids = (
            self._postings_serve(field, tenant)
            .join(F.broadcast(probes_df), "centroid_id")
            .select("qid", "doc_id")
            .distinct()
        )
        docs = self._docs().filter(F.col("tenant") == tenant)
        if doc_filter is not None:
            docs = docs.join(
                self._filter_doc_ids(tenant, doc_filter), "doc_id", "left_semi"
            )

        n_parts = self.spark.sparkContext.defaultParallelism
        bc_c = self._bc(self.centroids[field])
        thr = float(opts.centroid_score_threshold)
        nsp = int(opts.num_second_pass)
        kk = int(k)
        # D11 routing, mirroring search(): ADC decomposes the
        # UNnormalized IP only and needs PQ codes; auto-on exactly
        # under those conditions. The same SearchOptions must score
        # identically through search() and search_batch().
        from lintdb_spark.index.quantizers import ProductQuantizer

        adc_ok = not opts.normalize and isinstance(quant, ProductQuantizer)
        use_adc = adc_ok if opts.use_adc is None else opts.use_adc
        if use_adc and not adc_ok:
            raise ValueError(
                "use_adc requires a ProductQuantizer field and normalize=False"
            )
        normalize = bool(opts.normalize)

        _EMPTY = {
            "qid": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }

        def score_group(qid, Q, doc_ids, code_arrs, blobs, nts):
            # per-qid full cascade: PLAID codes-only (plaid.cpp:65-95)
            # -> num_second_pass cut -> residual decode + exact MaxSim
            # (plaid.cpp:119-185, Scorer.cpp:11-63) -> top-k
            CC = bc_c.value
            qc = Q @ CC.T  # (n_tok, num_centroids)

            # stage 1, vectorized: one gather + segment-max
            # (np.maximum.reduceat) over every candidate's tokens at
            # once — no per-doc Python loop. Duplicate centroid ids
            # within a doc don't change the per-token max, so the
            # reference's unique() is unnecessary here. Docs always
            # have >=1 token (validateField rejects empty tensors), so
            # every reduceat segment is non-empty.
            lens = np.fromiter(
                (len(c) for c in code_arrs), dtype=np.int64, count=len(code_arrs)
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            M = qc[:, np.concatenate(code_arrs)]
            if thr > 0.0:
                # a centroid column contributes only if its best query-
                # token score clears the threshold (plaid.cpp:78-84); a
                # doc with no surviving column scores 0
                M = np.where(M.max(axis=0, keepdims=True) >= thr, M, -np.inf)
            s1 = np.maximum.reduceat(M, starts, axis=1).sum(axis=0)
            s1 = np.where(np.isfinite(s1), s1, 0.0)
            surv = np.lexsort((doc_ids, -s1))[:nsp]

            # stage 2, vectorized: all survivors' packed residuals are
            # token-major fixed-size rows, so one concatenated decode +
            # one (n_q_tok x total_tokens) matmul + segment-max scores
            # the whole second pass. In the ADC configuration the
            # decode+matmul is replaced by qc-gather + table lookups
            # (qc IS the precomputed <q, centroid> matrix).
            nts_s = nts[surv]
            cents_s = np.concatenate([code_arrs[i] for i in surv])
            starts2 = np.zeros(len(surv), dtype=np.int64)
            np.cumsum(nts_s[:-1], out=starts2[1:])
            if use_adc:
                tab = quant.inner_prod_tables(Q)  # (n_q, m, ksub)
                n_q, m, ksub = tab.shape
                pqcodes = quant.unpack_codes(
                    b"".join(blobs[i] for i in surv), int(nts_s.sum())
                )
                # accumulate per subquantizer: O(n_q x N) peak memory
                # instead of the (n_q, N, m) fancy-index intermediate
                S = qc[:, cents_s].copy()
                for i in range(m):
                    S += tab[:, i, :][:, pqcodes[:, i]]
            else:
                toks = quant.decode(
                    b"".join(blobs[i] for i in surv), int(nts_s.sum())
                ) + CC[cents_s]
                if normalize:
                    norms = np.linalg.norm(toks, axis=1, keepdims=True)
                    norms[norms == 0] = 1.0
                    toks = toks / norms
                S = Q @ toks.T
            s2 = np.maximum.reduceat(S, starts2, axis=1).sum(axis=0)
            keep = np.lexsort((doc_ids[surv], -s2))[:kk]
            return pd.DataFrame(
                {
                    "qid": np.full(len(keep), qid, dtype=np.int64),
                    "doc_id": doc_ids[surv][keep],
                    "rank": np.arange(1, len(keep) + 1, dtype=np.int64),
                    "score": s2[keep],
                }
            )

        # ---- physical strategy selection, the batch analogue of
        # Spark's broadcast-vs-shuffle join choice ----
        # The qid-cogroup path ships every candidate's codes+residual
        # blobs through the shuffle (bounded per-executor memory: one
        # group at a time — the 100 TB path). When the WHOLE doc blob
        # table fits the broadcast threshold, shipping it once to each
        # executor and shuffling only the tiny (qid, doc_id) pairs is
        # strictly cheaper. The estimate reads only the num_tokens
        # column (column-pruned scan): tokens * (code bytes + 8B
        # centroid id) + per-doc overhead.
        # Serve-state reuse: the size estimate (one aggregate job) and
        # the doc-blob broadcast (full collect + re-broadcast) depend
        # only on the committed index state for UNFILTERED calls — a
        # server fielding per-request batches on an unchanged index
        # must not re-pay them per call. Keyed on (tenant, field,
        # _meta_seq) snapshotted above; any committed mutation bumps
        # _meta_seq. Filtered calls bypass the cache entirely: absent
        # map entries ARE the filter, so a filtered map must never be
        # reused.
        cached = getattr(self, "_serve_blob_cache", None)
        if cached is not None and cached[0] != cache_key:
            # stale entry (a commit bumped _meta_seq): evict NOW, not
            # lazily on the next broadcast-path build — if the grown
            # corpus routes every future call down the cogroup path,
            # the replace branch below never runs and the old doc-blob
            # broadcast (the largest serve object) would stay resident
            # for the process lifetime
            try:
                cached[2].unpersist(blocking=False)
            except Exception:  # noqa: BLE001 — best-effort
                pass
            self._serve_blob_cache = cached = None
        est_bytes = bc_docs = None
        if doc_filter is None and cached is not None and cached[0] == cache_key:
            _, est_bytes, bc_docs = cached
        if est_bytes is None:
            est_row = docs.agg(
                F.sum(nt_c).alias("toks"), F.count("*").alias("nd")
            ).collect()[0]
            tok_total = int(est_row["toks"] or 0)
            est_bytes = tok_total * (quant.code_size + 8) + int(est_row["nd"]) * 128
        bcast_max = _parse_byte_conf(
            self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None),
            default=32 * 1024 * 1024,
        )

        # force_cogroup (bench/ops knob, default off): route down the
        # cogrouped 100 TB fallback even when the blobs would fit the
        # broadcast threshold — the fallback must be MEASURABLE at any
        # corpus size (an unmeasured fallback is a latency cliff
        # candidate), and an operator can pin it when executor memory
        # is tighter than the threshold suggests.
        force_cg = bool(getattr(self, "force_cogroup", False))
        if est_bytes <= bcast_max and not force_cg:
            if bc_docs is None:
                doc_map = self._collect_doc_blobs(docs, codes_c, res_c, nt_c)
                # filtered maps are per-call (never cached) -> track
                # for release; unfiltered maps are owned by the serve
                # cache, freed by its unpersist-on-replace
                bc_docs = (
                    self._bc(doc_map)
                    if doc_filter is not None
                    else self.spark.sparkContext.broadcast(doc_map)
                )
                if doc_filter is None:
                    # re-read the LIVE slot, not the snapshot from the
                    # top of the call: a concurrent thread racing a
                    # commit may have installed a different-key entry
                    # in between, and blindly overwriting would both
                    # drop its broadcast without unpersist and pin our
                    # stale key
                    prev = getattr(self, "_serve_blob_cache", None)
                    if prev is None or prev[0] == cache_key:
                        if prev is not None and prev[2] is not bc_docs:
                            try:
                                # unpersist, NOT destroy: executors drop
                                # their cached copies (the memory that
                                # matters) but a concurrent request still
                                # mid-job on the old broadcast can lazily
                                # refetch it — destroy() would fail that
                                # request's tasks
                                prev[2].unpersist(blocking=False)
                            except Exception:  # noqa: BLE001 — best-effort
                                pass
                        self._serve_blob_cache = (cache_key, est_bytes, bc_docs)
                    else:
                        # someone installed a newer snapshot: keep
                        # theirs, and track OUR blob for release with
                        # this call (lazy refetch keeps us correct if
                        # executors drop it before our job finishes)
                        pending = getattr(self._bcast_tls, "pending", None)
                        if pending is not None:
                            pending.append(bc_docs)
            bc_q = self._bc(qmats)

            def serve(batches):
                dm = bc_docs.value
                qm = bc_q.value

                def score_pdf(pdf):
                    outs = []
                    for qid_val, grp in pdf.groupby("qid", sort=False):
                        ents = [
                            (d, dm[d]) for d in grp["doc_id"].to_numpy() if d in dm
                        ]
                        # absent map entries = docs removed by doc_filter
                        # (the broadcast map IS the filter) or deleted
                        if not ents:
                            continue
                        dids = np.fromiter(
                            (d for d, _ in ents), dtype=np.int64, count=len(ents)
                        )
                        outs.append(
                            score_group(
                                int(qid_val),
                                qm[int(qid_val)],
                                dids,
                                [e[0] for _, e in ents],
                                np.array([e[1] for _, e in ents], dtype=object),
                                np.fromiter(
                                    (e[2] for _, e in ents),
                                    dtype=np.int64,
                                    count=len(ents),
                                ),
                            )
                        )
                    return outs

                # Arrow batches are capped (arrow.maxRecordsPerBatch) and do
                # NOT respect group boundaries: one qid's candidate rows can
                # straddle batches, and scoring each fragment independently
                # would emit duplicate ranks over partial candidate sets.
                # Rows arrive qid-contiguous (sortWithinPartitions below), so
                # hold back each batch's FINAL qid until a different qid (or
                # end of partition) proves the group complete. Held memory is
                # bounded by one group — the same bound the cogroup path has.
                pending = None
                for pdf in batches:
                    if pending is not None:
                        pdf = pd.concat([pending, pdf], ignore_index=True)
                        pending = None
                    if len(pdf) == 0:
                        continue
                    tail = pdf["qid"].to_numpy() == pdf["qid"].iloc[-1]
                    pending = pdf[tail]
                    outs = score_pdf(pdf[~tail]) if (~tail).any() else []
                    if outs:
                        yield pd.concat(outs)
                if pending is not None and len(pending):
                    outs = score_pdf(pending)
                    if outs:
                        yield pd.concat(outs)

            topk = (
                cand_ids.repartition(n_parts, "qid")
                .sortWithinPartitions("qid")
                .mapInPandas(serve, "qid long, doc_id long, rank long, score double")
            )
        else:
            cand = cand_ids.join(
                docs.select("doc_id", codes_c, res_c, nt_c), "doc_id"
            )
            # explicit qid partitioning ahead of the cogroup: the
            # Python cascade is CPU-bound per group, and AQE (which
            # only sees bytes) would coalesce a small batch's shuffle
            # into few partitions, serializing the groups. A user
            # repartition is AQE-exempt and the cogroup reuses it.
            cand = cand.repartition(n_parts, "qid")
            queries_df = self.spark.createDataFrame(
                pd.DataFrame(
                    [
                        (qid, j, tok.astype(np.float32))
                        for qid, q in qmats.items()
                        for j, tok in enumerate(q)
                    ],
                    columns=["qid", "q_id", "qvec"],
                ),
                "qid long, q_id long, qvec array<float>",
            )
            queries_part = queries_df.repartition(n_parts, "qid")

            def cascade(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
                if left.empty or right.empty:
                    return pd.DataFrame(_EMPTY)
                Q = np.vstack(
                    right.sort_values("q_id")["qvec"].to_numpy()
                ).astype(np.float32)
                return score_group(
                    int(left["qid"].iloc[0]),
                    Q,
                    left["doc_id"].to_numpy(),
                    [np.asarray(c, dtype=np.int64) for c in left[codes_c]],
                    left[res_c].to_numpy(),
                    left[nt_c].to_numpy().astype(np.int64),
                )

            topk = (
                cand.groupBy("qid")
                .cogroup(queries_part.groupBy("qid"))
                .applyInPandas(
                    cascade, "qid long, doc_id long, rank long, score double"
                )
            )
        stored = [
            f.name for f in self.schema.scalar_fields() if f.has_role(FieldType.STORED)
        ]
        if not stored:
            return topk
        return tag_cached(
            topk.join(docs.select("doc_id", *stored), "doc_id").select(
                "qid", "doc_id", "rank", "score", *stored
            ),
            topk,
        )

    def prewarm(self, tenant: int = 0, field: str | None = None) -> None:
        """Build the serve-state caches a COLD first batch would
        otherwise pay inline — the server-startup step every real
        deployment runs (the reference's analogue is RocksDB opening
        its table readers at Index construction, index.cpp:40-58).

        One tiny search_batch per vector field drives the REAL serve
        path end to end, so everything the first user batch needs is
        resident afterwards: the persisted postings slice
        (_postings_serve), the doc-blob size estimate + broadcast
        (_serve_blob_cache), the centroid matrices, and the JVM's
        codegen/Arrow lanes for the cascade plan. Measured at the sf10
        probe: the first 1000-query batch drops from ~17-20 s to
        warm-path latency (~4 s), with prewarm itself costing the
        difference at load time — where a serving deployment wants it
        (scripts/serve_profile.py records both)."""
        self._refresh_meta_if_stale()
        fields = (
            [field]
            if field is not None
            else [f.name for f in self.schema.colbert_fields()]
        )
        for f in fields:
            cents = self.centroids.get(f)
            if cents is None:
                continue
            dim = int(cents.shape[1])
            q = {-1: np.zeros((1, dim), dtype=np.float32)}
            try:
                self.search_batch(tenant, f, q, k=1).collect()
            except Exception:  # noqa: BLE001 — prewarm is best-effort
                pass

    def _with_metadata(self, scored: DataFrame, k: int) -> DataFrame:
        """C9: order, truncate, project stored fields (index.cpp:407-449)."""
        stored = [
            f.name for f in self.schema.scalar_fields() if f.has_role(FieldType.STORED)
        ]
        return (
            scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
            .select("doc_id", "score", *stored)
        )
