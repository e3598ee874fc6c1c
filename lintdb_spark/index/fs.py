"""Filesystem layer for the segment store (object-store readiness).

SegmentStore's commit protocol needs a dozen small filesystem
primitives (atomic meta flip, O_EXCL lockfile, walk/exists/stat,
vacuum's listing + delete) plus a bridge for Spark's parquet I/O.
Round 8 isolated the two read-side primitives (_fs_walk/_fs_exists);
this module completes the seam: every python-side touch goes through a
``StoreFS`` implementation chosen by the store path's scheme
(``filesystem_for``), so the protocol runs unchanged against a
non-local filesystem.

Implementations:

- ``LocalFS`` — the default; plain ``os`` calls, Spark reads/writes
  the same paths directly (identity bridge).
- ``MemoryFS`` — a process-global in-memory byte store serving the
  ``mem://`` scheme: the non-local test double (no extra deps). Pure
  metadata + bytes; object-store semantics (files only, directories
  implied) with the three protocol primitives the local backend gets
  from POSIX implemented under one lock: ``write_atomic`` (the meta
  flip — an object store uses a conditional put), ``create_exclusive``
  (the writer lock — a real deployment uses a lock service or
  If-None-Match put), and per-path version counters for ``stat_id``
  (commit detection without inodes).
- ``StagedFS`` — pairs a remote byte store with a local staging/cache
  directory for the Spark side: writers stage parquet locally and
  ``publish`` uploads the segment's files; readers ``spark_read_path``
  a segment root, which downloads its files once (segments are
  immutable after commit, so the cache never goes stale) and returns
  the local mirror for Spark to scan. This is the local-cache-tier
  pattern; a production deployment on a Hadoop-supported scheme
  (s3a://, abfs://, gs://) would instead let Spark read and write the
  object store DIRECTLY and use only the protocol primitives here —
  the data plane needs no staging when the JVM has a connector. The
  staged bridge exists for schemes Spark cannot reach (mem://,
  fsspec-only filesystems) and for exercising the full lifecycle in
  tests.
- ``FsspecRemote`` — adapts any ``fsspec`` AbstractFileSystem as the
  remote side of ``StagedFS`` (import-gated; fsspec is optional).

Scale note: protocol files are KB-sized and per-commit, so these
python-side primitives are never on the data path; the 100 TB data
plane is Spark's own parquet I/O.
"""

from __future__ import annotations

import os
import posixpath
import re
import shutil
import tempfile
import threading
import time


class ConditionalPutConflict(OSError):
    """A conditional put (write_if_match) found the object changed
    since the caller last observed it — the caller's view is stale and
    its write was NOT applied. The commit protocol surfaces this as a
    loud lost-update error instead of silently overwriting the other
    writer's commit."""


class LocalFS:
    """Default backend: the local filesystem, identity Spark bridge."""

    # POSIX directories carry a real mtime of their own — vacuum's
    # tree-age check may fall back to it for trees with no datable
    # files (object-store schemes report synthetic dir times and must
    # never, see SegmentStore.vacuum)
    real_dir_mtimes = True

    # ---- metadata / protocol ----
    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def walk(self, root: str):
        return os.walk(root)

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def open_read(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_atomic(self, path: str, data: bytes) -> None:
        """tmp + fsync + rename — rename-atomicity is what the commit
        protocol rests on locally (an object store uses a conditional
        put instead)."""
        import uuid

        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        try:
            with open(tmp, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def create_exclusive(self, path: str, data: bytes) -> None:
        """O_EXCL create — raises FileExistsError if present."""
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, data)
        finally:
            os.close(fd)

    def unlink(self, path: str) -> None:
        os.unlink(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def parquet_num_rows(self, path: str) -> int | None:
        """Row count from the parquet footer — a driver-side metadata
        read, no Spark job. None when the footer is unreadable."""
        try:
            import pyarrow.parquet as pq

            return int(pq.ParquetFile(path).metadata.num_rows)
        except Exception:  # noqa: BLE001 — stats feed estimates only
            return None

    def utime(self, path: str) -> None:
        os.utime(path)

    def stat_id(self, path: str):
        """Commit-identity triple of a file, or None if missing. The
        inode matters locally: os.replace swaps it every commit, so
        two commits inside one mtime quantum stay distinguishable."""
        try:
            st = os.stat(path)
            return (st.st_mtime_ns, st.st_size, st.st_ino)
        except OSError:
            return None

    # ---- Spark bridge (identity) ----
    def spark_write_path(self, logical: str) -> str:
        return logical

    def staged_local_path(self, logical: str) -> str:
        """Side-effect-free twin of spark_write_path: WHERE the staged
        local bytes of ``logical`` live, without creating directories
        or invalidating the publish memo — for read-only passes over a
        freshly staged segment (e.g. footer row counts)."""
        return logical

    def locally_staged(self, logical: str) -> bool:
        """May a commit-time manifest walk trust staged_local_path's
        bytes as the COMPLETE segment? Locally always: the "mirror"
        IS the segment (identity bridge) — there is no partial-
        download hazard."""
        return True

    def publish(self, logical: str) -> None:
        pass

    def spark_read_path(self, logical: str) -> str:
        return logical


class MemoryFS:
    """Process-global in-memory byte store for the ``mem://`` scheme.

    Object-store semantics: only files exist; directories are implied
    by prefixes (plus explicit markers so makedirs(exist_ok=False) can
    refuse a second create() on the same store path). All mutation is
    under one lock, which IS the atomicity the protocol primitives
    need. Per-path monotonic version counters stand in for inodes in
    ``stat_id``."""

    _instance: "MemoryFS | None" = None
    _instance_lock = threading.Lock()

    @classmethod
    def instance(cls) -> "MemoryFS":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def __init__(self) -> None:
        self._lock = threading.RLock()
        # path -> (bytes, mtime, version)
        self._files: dict[str, tuple[bytes, float, int]] = {}
        self._dirs: set[str] = set()
        self._ver = 0

    @staticmethod
    def _norm(path: str) -> str:
        return path.rstrip("/")

    def _children(self, path: str) -> set[str]:
        p = self._norm(path) + "/"
        out = set()
        for f in list(self._files) + list(self._dirs):
            if f.startswith(p):
                out.add(f[len(p):].split("/", 1)[0])
        return out

    # ---- metadata / protocol ----
    def exists(self, path: str) -> bool:
        with self._lock:
            p = self._norm(path)
            return p in self._files or p in self._dirs or bool(self._children(p))

    def isdir(self, path: str) -> bool:
        with self._lock:
            p = self._norm(path)
            return p in self._dirs or bool(self._children(p))

    def listdir(self, path: str) -> list[str]:
        with self._lock:
            return sorted(self._children(path))

    def walk(self, root: str):
        with self._lock:
            r = self._norm(root)
            # a missing root walks as nothing, like os.walk
            if r not in self._dirs and not self._children(r):
                return
            stack = [r]
            out = []
            while stack:
                d = stack.pop()
                kids = sorted(self._children(d))
                dirs = [k for k in kids if posixpath.join(d, k) not in self._files]
                files = [k for k in kids if posixpath.join(d, k) in self._files]
                out.append((d, dirs, files))
                stack.extend(posixpath.join(d, k) for k in reversed(dirs))
        yield from out

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        with self._lock:
            p = self._norm(path)
            if not exist_ok and self.exists(p):
                raise FileExistsError(p)
            self._dirs.add(p)

    def open_read(self, path: str) -> bytes:
        with self._lock:
            ent = self._files.get(self._norm(path))
            if ent is None:
                raise FileNotFoundError(path)
            return ent[0]

    def write_atomic(self, path: str, data: bytes) -> None:
        with self._lock:
            self._ver += 1
            self._files[self._norm(path)] = (data, time.time(), self._ver)

    # real object stores expose compare-and-swap puts (S3
    # If-Match/If-None-Match, GCS x-goog-if-generation-match, Azure
    # ETag conditions) — this is the semantics the meta-flip needs off
    # POSIX, and MemoryFS models it exactly so the protocol is testable
    # without cloud credentials
    supports_cas = True

    def write_if_match(self, path: str, data: bytes, expected) -> None:
        """Whole-object conditional put: write only if the object's
        current stat_id equals ``expected`` (None = must not exist).
        Raises ConditionalPutConflict otherwise — the caller's view is
        stale and nothing was written. Atomic under the store lock,
        which is exactly what a real object store's If-Match gives."""
        with self._lock:
            cur = self.stat_id(path)
            if cur != (tuple(expected) if expected is not None else None):
                raise ConditionalPutConflict(
                    f"conditional put of {path} lost: expected "
                    f"{expected}, found {cur}"
                )
            self._ver += 1
            self._files[self._norm(path)] = (data, time.time(), self._ver)

    def create_exclusive(self, path: str, data: bytes) -> None:
        with self._lock:
            p = self._norm(path)
            if p in self._files:
                raise FileExistsError(path)
            self._ver += 1
            self._files[p] = (data, time.time(), self._ver)

    def unlink(self, path: str) -> None:
        with self._lock:
            p = self._norm(path)
            if p not in self._files:
                raise FileNotFoundError(path)
            del self._files[p]

    def rename(self, src: str, dst: str) -> None:
        with self._lock:
            s = self._norm(src)
            if s not in self._files:
                raise FileNotFoundError(src)
            self._files[self._norm(dst)] = self._files.pop(s)

    def rmtree(self, path: str) -> None:
        with self._lock:
            p = self._norm(path)
            pref = p + "/"
            for f in [f for f in self._files if f == p or f.startswith(pref)]:
                del self._files[f]
            self._dirs -= {d for d in self._dirs if d == p or d.startswith(pref)}

    def getmtime(self, path: str) -> float:
        with self._lock:
            p = self._norm(path)
            ent = self._files.get(p)
            if ent is not None:
                return ent[1]
            if p in self._dirs or self._children(p):
                return 0.0
            raise OSError(f"no such path: {path}")

    def getsize(self, path: str) -> int:
        with self._lock:
            ent = self._files.get(self._norm(path))
            if ent is None:
                raise OSError(f"no such file: {path}")
            return len(ent[0])

    def utime(self, path: str) -> None:
        with self._lock:
            p = self._norm(path)
            ent = self._files.get(p)
            if ent is None:
                raise OSError(f"no such file: {path}")
            self._files[p] = (ent[0], time.time(), ent[2])

    def stat_id(self, path: str):
        with self._lock:
            ent = self._files.get(self._norm(path))
            if ent is None:
                return None
            data, mtime, ver = ent
            return (int(mtime * 1e9), len(data), ver)


class StagedFS:
    """Spark bridge over a remote byte store: parquet is staged in (and
    served from) a local cache directory; ``publish`` uploads a staged
    segment's files, ``spark_read_path`` downloads a committed
    segment's files once. Every protocol primitive delegates to the
    remote — the remote is the source of truth, the cache is disposable
    (segments are immutable after commit, so cached files never go
    stale; the one mutable file, _meta.json, never passes through the
    cache)."""

    def __init__(self, remote, cache_root: str | None = None) -> None:
        import atexit

        self.remote = remote
        if cache_root is None:
            cache_root = tempfile.mkdtemp(prefix="lintdb_spark_fscache_")
            # we own this tempdir: reclaim the segment mirrors at
            # process exit (a long-lived process re-loading stores
            # would otherwise leak one corpus mirror per store object)
            atexit.register(shutil.rmtree, cache_root, ignore_errors=True)
        self.cache_root = cache_root
        # segment roots already uploaded by this process — segments are
        # immutable, so a second publish of the same root (e.g. the
        # writer's stage + the commit's manifest point) can no-op.
        # spark_write_path() invalidates a root's entry: a RE-staged
        # root (compact/rewrite retry reusing a version-keyed path)
        # must re-publish its new bytes.
        self._published: set[str] = set()

    # ---- delegation ----
    def __getattr__(self, name):
        # protocol primitives fall through to the remote byte store
        return getattr(self.remote, name)

    def rmtree(self, path: str) -> None:
        # vacuum deletes a segment: drop the remote subtree AND its
        # local cache mirror (disposable, but don't leak disk)
        self.remote.rmtree(path)
        local = self._local(path)
        if os.path.isdir(local):
            shutil.rmtree(local, ignore_errors=True)

    # ---- Spark bridge ----
    def _local(self, logical: str) -> str:
        rel = logical.replace("://", "/").lstrip("/")
        return os.path.join(self.cache_root, rel)

    def spark_write_path(self, logical: str) -> str:
        local = self._local(logical)
        os.makedirs(os.path.dirname(local), exist_ok=True)
        # a re-stage of the same root (version-keyed paths can be
        # reused by a compact/rewrite retry) must re-publish
        self._published.discard(logical)
        return local

    def staged_local_path(self, logical: str) -> str:
        """Side-effect-free path mapper: where ``logical``'s staged
        bytes live locally. Unlike spark_write_path this neither
        mkdirs nor discards the publish memo — a read-only metadata
        pass over an already-published segment must not force a full
        re-upload at the next publish()."""
        return self._local(logical)

    def locally_staged(self, logical: str) -> bool:
        """True only for roots THIS PROCESS staged and published: the
        local mirror of such a root is complete by construction (the
        writer put every file). Roots this process merely READ may
        have a PARTIAL mirror (an interrupted spark_read_path), so a
        commit-time manifest walk must never trust them (ADVICE r12
        — build_manifests over a partially downloaded segment would
        silently drop the missing leaves from every future read)."""
        return logical in self._published

    def parquet_num_rows(self, path: str) -> int | None:
        """Footer row count from the LOCAL staged/cached copy only —
        never a remote read (a footer fetch per maintenance trip would
        put ranged GETs on the commit path). None when this process
        has no local bytes for the file; callers estimate from
        segments they do know (or fall back entirely)."""
        local = self._local(path)
        if not os.path.exists(local):
            return None
        try:
            import pyarrow.parquet as pq

            return int(pq.ParquetFile(local).metadata.num_rows)
        except Exception:  # noqa: BLE001 — stats feed estimates only
            return None

    def publish(self, logical: str) -> None:
        """Upload every file staged locally for ``logical``, REPLACING
        whatever the remote holds under it — a version-keyed path can
        be re-staged by a compact/rewrite retry, and Spark's part-file
        names differ between attempts, so an additive upload would
        leave both attempts' files in place and a manifest walk would
        double-count. Idempotent per staging (memoized until the next
        spark_write_path of the same root) and a no-op when nothing is
        staged locally (re-manifests of already-remote segments)."""
        if logical in self._published:
            return
        local = self._local(logical)
        if not os.path.isdir(local):
            return
        self.remote.rmtree(logical)
        for wr, _dirs, files in os.walk(local):
            for f in files:
                src = os.path.join(wr, f)
                rel = os.path.relpath(src, local)
                with open(src, "rb") as fh:
                    self.remote.write_atomic(
                        posixpath.join(logical, rel), fh.read()
                    )
        self._published.add(logical)

    def spark_read_path(self, logical: str) -> str:
        local = self._local(logical)
        for wr, _dirs, files in self.remote.walk(logical):
            rel_dir = posixpath.relpath(wr, logical) if wr != logical else ""
            for f in files:
                dst = os.path.join(local, rel_dir, f) if rel_dir else os.path.join(local, f)
                if os.path.exists(dst):
                    continue  # immutable segments: cache hit
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                with open(dst, "wb") as fh:
                    fh.write(self.remote.open_read(posixpath.join(wr, f)))
        return local


def _is_transient(exc: BaseException) -> bool:
    """Classify a backend error as TRANSIENT (throttling / 5xx /
    timeout — retry is correct) vs SEMANTIC (missing object,
    precondition failed — retry would mask real state). Backends
    surface throttling heterogeneously, so match both a numeric
    ``status``/``code``/``response_code`` attribute and the classic
    marker strings (S3 SlowDown/ThrottlingException, GCS
    rateLimitExceeded, generic 429/5xx). Conflict-shaped errors
    (failed precondition / If-Match refusal) are checked FIRST and
    never transient: write_if_match/create_exclusive must map them to
    ConditionalPutConflict/FileExistsError, not retry them (ADVICE
    r13). Numeric markers must stand alone — not embedded in a longer
    number, identifier, or path segment ('.../run-429/...',
    'part-00503.parquet') — so a semantic error whose message merely
    CONTAINS such digits can't masquerade as throttling."""
    if isinstance(exc, (FileNotFoundError, FileExistsError)):
        return False
    for attr in ("status", "code", "response_code", "status_code"):
        v = getattr(exc, attr, None)
        if isinstance(v, int):
            if v in (409, 412):
                return False
            if v == 429 or 500 <= v <= 599:
                return True
    s = f"{type(exc).__name__}: {exc}".lower()
    if any(
        m in s
        for m in (
            "precondition",
            "if-match",
            "if-none-match",
            "etag mismatch",
            "conditionnotmet",
            "conflict",
        )
    ) or re.search(r"(?<![\w/.\-])(409|412)(?![\w\-/])(?!\.[\w/.\-])", s):
        # same strict standalone-number rule as the transient match
        # below (ADVICE r14): an incidental 'run-412' path segment in
        # an otherwise-transient message must not force non-transient
        return False
    if any(
        m in s
        for m in (
            "slowdown",
            "slow down",
            "throttl",
            "ratelimit",
            "rate limit",
            "timed out",
            "timeout",
            "connection reset",
        )
    ):
        return True
    # standalone status number; a trailing '.' is allowed when it is
    # sentence punctuation ('... returned 503.') but not when it
    # continues an identifier/path ('part-00503.parquet', 'v503.2')
    # — ADVICE r14
    return (
        re.search(r"(?<![\w/.\-])(429|5\d\d)(?![\w\-/])(?!\.[\w/.\-])", s)
        is not None
    )


class FsspecRemote:
    """Adapt an fsspec AbstractFileSystem as a StagedFS remote. Only
    constructed when fsspec is importable (filesystem_for).

    Every backend call runs through a retry-with-backoff seam
    (``_retry``): transient failures (throttling, 5xx, timeouts — see
    ``_is_transient``) are retried up to ``retry_attempts`` times with
    exponential backoff, semantic errors (missing object, failed
    precondition) propagate immediately. Retrying is safe for every op
    here because each is idempotent at the object level: reads and
    stats are pure, puts are whole-object (a retried put re-writes the
    same bytes), deletes tolerate already-gone, and the CAS put's
    precondition re-evaluates on retry (a conflict is SEMANTIC and
    never retried).

    ATOMICITY REQUIREMENTS — which primitives the commit protocol
    needs atomic on a real backend (asserted by the quirk suite's op
    trace, test_objectstore_quirks):

    - ``write_atomic``: whole-object put (readers see old or new
      bytes, never torn) — native on all object stores. The meta flip
      is this put (or the CAS variant below). NO rename anywhere on
      the commit path.
    - ``create_exclusive``: put-if-absent. Real exclusion needs a
      conditional put (If-None-Match) — provided via put_if_match on
      CAS backends; without it the exists+put emulation is
      best-effort (documented single-writer limitation).
    - ``write_if_match``: conditional put keyed on a BACKEND-NATIVE
      tag (ETag / generation). Locally fabricated tags degrade to a
      plain put (see below).
    - ``rename``: needed only by the writer lock's stale-takeover and
      NOT required atomic — with copy+delete semantics, concurrent
      claimants serialize on the delete (at most one claims), and the
      subsequent create_exclusive is the actual exclusion point.
    """

    # transient-failure retry knobs (instance attrs so tests and
    # embedders tune without globals): attempts include the first try;
    # backoff is retry_base_s * 2^i per retry
    retry_attempts = 5
    retry_base_s = 0.05

    def __init__(self, fs, strip_scheme: bool = False) -> None:
        self.fs = fs
        self.strip = strip_scheme

    def _p(self, path: str) -> str:
        return path.split("://", 1)[1] if self.strip and "://" in path else path

    def _retry(self, fn):
        """Run one backend call, retrying transient failures with
        exponential backoff; the last failure propagates (no backoff
        sleep is wasted after the final attempt, and retry_attempts is
        clamped to >= 1 so misconfiguration can't raise a bare None).

        Lost-success responses (a put that LANDS but whose response is
        lost to a transient failure) make a retried CONDITIONAL put
        collide with this writer's own freshly-written object; the
        conditional-put callers disambiguate that conflict by reading
        the object back and comparing bytes (_readback_equals) — see
        create_exclusive / write_if_match."""
        attempts = max(1, int(self.retry_attempts))
        for i in range(attempts):
            try:
                return fn()
            except Exception as exc:  # noqa: BLE001 — classified below
                if not _is_transient(exc) or i == attempts - 1:
                    raise
                time.sleep(float(self.retry_base_s) * (2**i))

    def exists(self, path):
        return self._retry(lambda: self.fs.exists(self._p(path)))

    def isdir(self, path):
        return self._retry(lambda: self.fs.isdir(self._p(path)))

    def listdir(self, path):
        return [
            posixpath.basename(p.rstrip("/"))
            for p in self._retry(lambda: self.fs.ls(self._p(path)))
        ]

    def walk(self, root):
        # fsspec yields protocol-STRIPPED roots ('bucket/store/...'),
        # while every caller compares/joins walked paths against the
        # scheme-ful logical root (manifest relpaths, StagedFS cache
        # mirroring) — re-anchor each yielded dir onto the root the
        # caller passed. The listing is materialized INSIDE the retry:
        # a transient failure mid-iteration restarts the whole walk
        # instead of yielding a silently truncated tree.
        base = str(
            self.fs._strip_protocol(root)
            if hasattr(self.fs, "_strip_protocol")
            else self._p(root)
        ).rstrip("/")
        anchor = root.rstrip("/")
        entries = self._retry(lambda: list(self.fs.walk(self._p(root))))
        for wr, dirs, files in entries:
            wr = str(wr).rstrip("/")
            suffix = wr[len(base):] if wr.startswith(base) else ""
            yield anchor + suffix, dirs, files

    def makedirs(self, path, exist_ok=False):
        self._retry(
            lambda: self.fs.makedirs(self._p(path), exist_ok=exist_ok)
        )

    def open_read(self, path):
        def _read():
            with self.fs.open(self._p(path), "rb") as f:
                return f.read()

        return self._retry(_read)

    def write_atomic(self, path, data):
        # fsspec writes are whole-object puts — atomic per object on
        # real object stores (readers see old or new, never torn);
        # a retried put re-writes the same bytes (idempotent)
        def _write():
            with self.fs.open(self._p(path), "wb") as f:
                f.write(data)

        self._retry(_write)

    def _readback_equals(self, path, data) -> bool:
        """Lost-success disambiguation for conditional puts (ADVICE
        r13): a put that LANDS but whose response is lost to a
        transient failure makes the retry collide with this writer's
        own object — the conflict then reads back as EXACTLY our
        bytes, which no genuinely lost race can produce (lock payloads
        carry a unique token; meta payloads differ per commit). Bytes
        equal = our put succeeded; anything else (different bytes,
        object gone, read failure) = treat the conflict as real."""
        try:
            return self.open_read(path) == data
        except Exception:  # noqa: BLE001 — any read failure = not ours
            # broader than OSError on purpose (ADVICE r14): fsspec
            # backends raise ValueError/KeyError-shaped errors on
            # reads (memory-style filesystems especially); an escaping
            # exception here would replace the intended
            # FileExistsError/ConditionalPutConflict classification
            # with an unrelated read error. Any failure to read back
            # exactly our bytes means the conflict stands.
            return False

    def create_exclusive(self, path, data):
        # best-effort: object stores need a conditional put / lock
        # service for true exclusivity; single-writer deployments are
        # unaffected (documented limitation of the lockfile protocol
        # off POSIX). On a CAS-capable backend the put-if-absent IS
        # exclusive (expected tag None = object must not exist).
        if self.supports_cas:
            try:
                self._retry(
                    lambda: self.fs.put_if_match(self._p(path), data, None)
                )
                return
            except OSError as exc:
                if _is_transient(exc):  # retries exhausted, NOT a
                    raise  # precondition refusal — don't mislabel
                if self._readback_equals(path, data):
                    return  # our earlier attempt landed (lost success)
                raise FileExistsError(path) from exc
        if self.exists(path):
            raise FileExistsError(path)
        self.write_atomic(path, data)

    @property
    def supports_cas(self) -> bool:
        """True when the wrapped filesystem exposes a conditional put
        (``put_if_match(path, data, etag)`` — e.g. S3
        If-Match/If-None-Match, GCS generation preconditions surfaced
        by a backend). SegmentStore._save_meta then turns commit races
        the lockfile emulation cannot exclude into loud
        ConditionalPutConflict errors instead of silent lost
        updates."""
        return hasattr(self.fs, "put_if_match")

    def write_if_match(self, path, data, expected):
        """Compare-and-swap put: ``expected`` is the stat_id tuple the
        writer last observed ((mtime_ns, size, tag)) or None for
        put-if-absent; only the TAG component is the precondition —
        and ONLY when it is the backend's own ETag. A tag stat_id
        fabricated locally (the ``md5!`` content hash, used when
        info() exposes no ETag) is NOT something the backend can
        verify: sending it as If-Match matches only where ETag ==
        content-md5 (single-part S3) and would brick every meta flip
        after the first elsewhere (ADVICE r12) — so fabricated tags
        degrade to a plain atomic put. True CAS protection requires
        backend-native tags; without them the lockfile protocol is
        the only writer exclusion (the documented pre-CAS posture)."""
        tag = expected[2] if expected else None
        if isinstance(tag, str) and tag.startswith("md5!"):
            self.write_atomic(path, data)
            return
        try:
            self._retry(
                lambda: self.fs.put_if_match(self._p(path), data, tag)
            )
        except OSError as exc:
            if _is_transient(exc):  # retries exhausted — a backend
                raise  # outage, not a lost commit race
            if self._readback_equals(path, data):
                return  # our earlier attempt landed (lost success)
            raise ConditionalPutConflict(
                f"conditional put of {path} refused: {exc}"
            ) from exc

    def unlink(self, path):
        self._retry(lambda: self.fs.rm_file(self._p(path)))

    def rename(self, src, dst):
        self._retry(lambda: self.fs.mv(self._p(src), self._p(dst)))

    def rmtree(self, path):
        try:
            self._retry(lambda: self.fs.rm(self._p(path), recursive=True))
        except FileNotFoundError:
            pass

    def getmtime(self, path):
        info = self._retry(lambda: self.fs.info(self._p(path)))
        # fsspec backends disagree on the key: 'mtime' (local, sftp),
        # 'LastModified' (s3), 'created' (memory). A backend that
        # reports NONE of them must read as FRESH (now), never as
        # epoch-old: age checks gate destructive paths — a 0.0 here
        # made a freshly held writer lock look instantly stale (any
        # contender steals it) and collapsed vacuum's grace period to
        # zero (superseded segments deleted under in-flight readers).
        m = (
            info.get("mtime")
            or info.get("LastModified")
            or info.get("created")
        )
        if m is None:
            return time.time()
        return m.timestamp() if hasattr(m, "timestamp") else float(m)

    def getsize(self, path):
        # some backends report size=None (HTTP/SFTP-style info) —
        # surface UNKNOWN as None, never 0: the maintenance debt check
        # routes on byte ratios, and a coerced 0 either reinstates the
        # full-rewrite-per-trip cliff (base reads 0) or disables debt
        # compaction forever (batch reads 0). _tier_bytes treats None
        # as "skip byte-ratio routing this trip".
        sz = self._retry(lambda: self.fs.info(self._p(path))).get("size")
        return None if sz is None else int(sz)

    def utime(self, path):
        # touch by rewrite — only used to refresh the writer lock
        self.write_atomic(path, self.open_read(path))

    def stat_id(self, path):
        """Commit identity for the staleness guard. ETag when the
        backend provides one (object stores); otherwise a content hash
        — the file this guards (_meta.json) is KB-sized and the
        alternative (coarse mtime + size alone) misses two same-length
        commits inside one mtime quantum, exactly the hazard
        LocalFS.stat_id's inode component exists to prevent."""
        try:
            info = self._retry(lambda: self.fs.info(self._p(path)))
        except FileNotFoundError:
            return None
        m = self.getmtime(path)
        tag = info.get("ETag") or info.get("etag")
        if not tag:
            import hashlib

            # fabricated locally — marked so write_if_match knows the
            # backend cannot verify it as an If-Match precondition
            tag = "md5!" + hashlib.md5(self.open_read(path)).hexdigest()
        # size may be None (HTTP/SFTP-style info) — identity still
        # works off mtime+tag; 0 here is a tuple component, not a
        # routing input like getsize's
        return (int(m * 1e9), int(info.get("size") or 0), tag)


_CACHE_BASE: str | None = None
_CACHE_LOCK = threading.Lock()


def _shared_cache_root(store_path: str) -> str:
    """One cache mirror per (process, store path): repeated
    Index.load / DedupArtifacts.load of the same non-local store reuse
    downloaded segments (immutable, so sharing is safe) instead of
    mirroring the corpus once per store OBJECT. The base tempdir is
    reclaimed at process exit."""
    import atexit
    import hashlib

    global _CACHE_BASE
    with _CACHE_LOCK:
        if _CACHE_BASE is None:
            _CACHE_BASE = tempfile.mkdtemp(prefix="lintdb_spark_fscache_")
            atexit.register(shutil.rmtree, _CACHE_BASE, ignore_errors=True)
    d = os.path.join(
        _CACHE_BASE, hashlib.md5(store_path.encode()).hexdigest()[:16]
    )
    os.makedirs(d, exist_ok=True)
    return d


# embedder/test extension point: scheme -> factory(path) -> StoreFS.
# Lets a deployment plug a custom backend (e.g. an fsspec-style object
# store with conditional puts) without fsspec's global registry; the
# CI-style object-store quirk suite registers its fake here.
_SCHEME_FACTORIES: dict = {}


def register_scheme(scheme: str, factory) -> None:
    _SCHEME_FACTORIES[scheme] = factory


def filesystem_for(path: str):
    """Pick the StoreFS for a store path by scheme: plain paths (and
    file://) get LocalFS; mem:// gets the in-memory test double behind
    a staging bridge; registered custom schemes get their factory;
    any other scheme needs fsspec installed and gets its filesystem
    behind the same bridge. Hadoop-supported schemes on a real
    cluster should prefer direct Spark I/O — see module docstring."""
    if "://" not in path:
        return LocalFS()
    scheme = path.split("://", 1)[0]
    if scheme in _SCHEME_FACTORIES:
        return _SCHEME_FACTORIES[scheme](path)
    if scheme == "file":
        return LocalFS()
    if scheme == "mem":
        return StagedFS(MemoryFS.instance(), _shared_cache_root(path))
    try:
        import fsspec
    except ImportError as exc:  # pragma: no cover - env without fsspec
        raise ValueError(
            f"store path scheme {scheme!r} needs the optional fsspec "
            "package (pip install fsspec) or a mem:// / local path"
        ) from exc
    return StagedFS(
        FsspecRemote(fsspec.filesystem(scheme)), _shared_cache_root(path)
    )
