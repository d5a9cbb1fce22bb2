"""Durable Analytical Object — the analogue of ``chdb.durable`` (SURVEY §1.1).

Reference semantics (chdb/durable/__init__.py:1-27, object.py:47-351,
namespace.py:20-60): an addressable, **single-writer** engine whose
authoritative state lives in storage you own. A ``head.json`` holds the
lease (owner, instance, generation, expiry) and the manifest (base
checkpoint + WAL segment list + seq). Every commit is a compare-and-set on
the head — the CAS *is* the fence: a stale writer's etag no longer matches
and its commit raises instead of clobbering the new writer's state.
``flush()`` cuts a WAL segment (the RPO boundary); ``checkpoint()`` folds
base+WAL into a fresh base; restore = base + WAL replay.

Spark-first mapping: the object's engine is a :class:`chdb_spark.stateful.
Session` (tables are parquet under the object's working dir), the WAL
records the SQL statements applied since the last checkpoint, and a
checkpoint is a copy of the session directory (tables + session manifest).
The Backend abstraction keeps the same three primitives the reference needs
(``get_with_etag`` / ``put`` / ``replace_if_match``); the local-folder
implementation here does CAS with an exclusive lock file + content etag,
which is exactly the contract S3 conditional-PUT (If-Match) provides at
cloud scale. ``Namespace.scan`` fans a query across many objects.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import tempfile
import time
import uuid
from typing import Iterable, Optional

_HEAD = "head.json"


class DurableError(Exception):
    pass


class LeaseError(DurableError):
    pass


# ---------------------------------------------------------------------------
# backend: 3 primitives, CAS on etag (reference backends/, object.py:95-107)
# ---------------------------------------------------------------------------


class LocalBackend:
    """Folder-backed object store with etag CAS.

    etag = sha1 of content; ``replace_if_match`` takes an exclusive lock
    file, re-reads, compares etags, atomically replaces. On S3/GCS the same
    method maps to a conditional PUT (If-Match / x-goodput-generation) —
    the rest of the durable machinery is backend-agnostic.
    """

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    @staticmethod
    def _etag(data: bytes) -> str:
        return hashlib.sha1(data).hexdigest()

    def get_with_etag(self, key: str):
        try:
            with open(self._p(key), "rb") as fh:
                data = fh.read()
        except FileNotFoundError:
            return None, None
        return data, self._etag(data)

    def put(self, key: str, data: bytes) -> None:
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)

    def replace_if_match(self, key: str, data: bytes, etag: Optional[str]):
        """CAS: write ``data`` iff the stored etag matches; returns the new
        etag or None on mismatch (the fencing signal)."""
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        lock = path + ".lock"
        for _ in range(200):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                time.sleep(0.01)
        else:
            raise DurableError(f"could not acquire lock for {key}")
        try:
            current, cur_etag = self.get_with_etag(key)
            if current is not None and cur_etag != etag:
                return None
            if current is None and etag is not None:
                return None
            self.put(key, data)
            return self._etag(data)
        finally:
            os.close(fd)
            os.remove(lock)

    def copy_tree_in(self, key_prefix: str, local_dir: str) -> None:
        dst = self._p(key_prefix)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(local_dir, dst)

    def copy_tree_out(self, key_prefix: str, local_dir: str) -> None:
        src = self._p(key_prefix)
        if os.path.exists(local_dir):
            shutil.rmtree(local_dir)
        shutil.copytree(src, local_dir)


def make_backend(url: str) -> LocalBackend:
    """URL → backend. ``file://...`` or a plain path → LocalBackend;
    s3:// / gs:// / az:// raise until an object-store client is wired in
    (the reference gates those behind optional deps the same way,
    chdb/durable/backends/)."""
    if url.startswith("file://"):
        return LocalBackend(url[7:])
    if re.match(r"^[a-z0-9]+://", url):
        raise DurableError(
            f"backend scheme not available in this environment: {url!r} "
            "(only file:// or local paths here; S3/GCS need their clients)"
        )
    return LocalBackend(url)


def validate_oid(oid: str) -> str:
    if not oid or not re.match(r"^[A-Za-z0-9._/-]{1,200}$", oid) or ".." in oid:
        raise DurableError(f"invalid object id: {oid!r}")
    return oid


# ---------------------------------------------------------------------------
# durable object (reference object.py:47-351)
# ---------------------------------------------------------------------------


class DurableObject:
    def __init__(
        self,
        oid: str,
        backend: LocalBackend,
        *,
        owner: Optional[str] = None,
        read_only: bool = False,
        lease_ttl: float = 60.0,
        spark=None,
    ):
        import math

        validate_oid(oid)
        if not (lease_ttl > 0) or not math.isfinite(lease_ttl):
            raise ValueError("lease_ttl must be a positive, finite number of seconds")
        self.oid = oid
        self.backend = backend
        self.owner = owner or uuid.uuid4().hex[:8]
        self.read_only = read_only
        self.ttl = lease_ttl
        self._spark = spark
        safe = re.sub(r"[^A-Za-z0-9._-]", "_", oid)[:64] or "obj"
        self._work = tempfile.mkdtemp(prefix=f"dao-{safe}-")
        self.session = None
        self.base: Optional[str] = None
        self.wal: list[str] = []
        self.seq = 0
        self.generation = 0
        self._head_etag: Optional[str] = None
        self._buf: list[str] = []
        self._lease_expires = 0.0
        self._instance = uuid.uuid4().hex

    def _key(self, key: str) -> str:
        return f"{self.oid}/{key}"

    def _now(self) -> float:
        return time.time()

    def _head_body(self, now: float, released: bool = False) -> bytes:
        return json.dumps(
            {
                "lease": {
                    "owner": self.owner,
                    "instance": self._instance,
                    "generation": self.generation,
                    "expires_at": now if released else now + self.ttl,
                },
                "manifest": {"base": self.base, "wal": self.wal, "seq": self.seq},
            }
        ).encode()

    def _write_head(self) -> None:
        """CAS-commit the head; a stale etag means another writer owns the
        object now (reference object.py:95-107 — 'the CAS IS the fence')."""
        now = self._now()
        new_etag = self.backend.replace_if_match(
            self._key(_HEAD), self._head_body(now), self._head_etag
        )
        if new_etag is None:
            raise LeaseError(f"fenced: object {self.oid} was taken by another writer")
        self._head_etag = new_etag
        self._lease_expires = now + self.ttl

    def _start_session(self) -> None:
        from chdb_spark.stateful import Session

        self.session = Session(os.path.join(self._work, "state"), spark=self._spark)

    # -- lifecycle ---------------------------------------------------------
    def open(self, force: bool = False) -> "DurableObject":
        data, etag = self.backend.get_with_etag(self._key(_HEAD))
        if data is None:
            if self.read_only:
                raise DurableError(f"object {self.oid} does not exist")
            self.generation = 1
            self._head_etag = None
            self._write_head()
            self._start_session()
            return self
        head = json.loads(data)
        lease = head.get("lease", {})
        if (
            not self.read_only
            and not force
            and lease.get("expires_at", 0) > self._now()
            and lease.get("instance") != self._instance
        ):
            raise LeaseError(
                f"object {self.oid} is held by {lease.get('owner')!r} "
                f"until {lease.get('expires_at')}"
            )
        m = head.get("manifest", {})
        self.base, self.wal, self.seq = m.get("base"), list(m.get("wal") or []), m.get("seq", 0)
        self.generation = lease.get("generation", 0) + (0 if self.read_only else 1)
        self._head_etag = etag
        if not self.read_only:
            self._write_head()  # take the lease (CAS fences racing openers)
        self._restore()
        return self

    def _restore(self) -> None:
        """base copy + WAL replay (reference object.py:214-237)."""
        state_dir = os.path.join(self._work, "state")
        if self.base is not None:
            self.backend.copy_tree_out(self._key(self.base), state_dir)
        self._start_session()
        for wal_key in self.wal:
            data, _ = self.backend.get_with_etag(self._key(wal_key))
            if data is None:
                raise DurableError(f"missing WAL segment {wal_key}")
            for line in data.decode().splitlines():
                if line.strip():
                    self.session.query(json.loads(line)["sql"])

    # -- query / write ------------------------------------------------------
    def query(self, sql: str, fmt: str = "DataFrame"):
        return self.session.query(sql, fmt)

    def execute(self, sql: str) -> None:
        if self.read_only:
            raise DurableError("object opened read-only")
        self.session.query(sql)
        self._buf.append(sql)
        # renew before expiry so a long-lived writer isn't fenced mid-flight
        if self._now() >= self._lease_expires - self.ttl * 0.25:
            self._write_head()

    # -- durability ---------------------------------------------------------
    def flush(self) -> Optional[str]:
        """Cut a WAL segment + CAS the head (RPO boundary,
        reference object.py:277-306)."""
        if self.read_only or not self._buf:
            return None
        new_seq = self.seq + 1
        key = f"wal/{self.generation}-{new_seq}-{uuid.uuid4().hex[:8]}.jsonl"
        payload = "\n".join(json.dumps({"sql": s}) for s in self._buf).encode()
        self.backend.put(self._key(key), payload)
        prev_seq, prev_wal = self.seq, list(self.wal)
        self.seq, self.wal = new_seq, prev_wal + [key]
        try:
            self._write_head()
        except Exception:
            self.seq, self.wal = prev_seq, prev_wal
            raise
        self._buf = []
        return key

    def checkpoint(self) -> str:
        """Fold base+WAL into a fresh base; truncate the WAL
        (reference object.py:307-347). The base is a full copy of the
        session directory (tables are parquet + the session manifest)."""
        if self.read_only:
            raise DurableError("object opened read-only")
        self.flush()
        # make sure every table's files + manifest are current on disk
        self.session._snapshot()
        new_seq = self.seq + 1
        key = f"checkpoints/{self.generation}-{new_seq}-{uuid.uuid4().hex[:8]}"
        self.backend.copy_tree_in(self._key(key), os.path.join(self._work, "state"))
        prev = (self.seq, self.base, list(self.wal))
        self.seq, self.base, self.wal = new_seq, key, []
        try:
            self._write_head()
        except Exception:
            self.seq, self.base, self.wal = prev
            raise
        return key

    def suspend(self) -> None:
        """Persist buffered writes without releasing the lease
        (reference durable/object.py:348-349: suspend == flush)."""
        self.flush()

    def close(self) -> None:
        if self.session is None:
            return
        if not self.read_only:
            self.flush()
            # release the lease (expires immediately) so the next writer can
            # open without waiting out the TTL — reference close() = flush +
            # release (object.py:351)
            try:
                new_etag = self.backend.replace_if_match(
                    self._key(_HEAD),
                    self._head_body(self._now(), released=True),
                    self._head_etag,
                )
                if new_etag is not None:
                    self._head_etag = new_etag
            except DurableError:
                pass  # fenced by a newer writer — nothing to release
        self.session.close()
        self.session = None
        shutil.rmtree(self._work, ignore_errors=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# namespace (reference namespace.py:20-60)
# ---------------------------------------------------------------------------


class Namespace:
    """A prefix full of durable objects: ``open``, ``destroy``, ``scan``."""

    def __init__(self, url: str, *, owner: Optional[str] = None, spark=None):
        self.backend = make_backend(url)
        self.owner = owner
        self._spark = spark

    def open(
        self,
        oid: str,
        *,
        read_only: bool = False,
        force: bool = False,
        lease_ttl: float = 60.0,
    ) -> DurableObject:
        obj = DurableObject(
            oid,
            self.backend,
            owner=self.owner,
            read_only=read_only,
            lease_ttl=lease_ttl,
            spark=self._spark,
        )
        return obj.open(force=force)

    def destroy(self, oid: str, *, force: bool = False) -> None:
        validate_oid(oid)
        path = self.backend._p(oid)
        if not os.path.exists(path):
            return
        if not force:
            data, _ = self.backend.get_with_etag(f"{oid}/{_HEAD}")
            if data is not None:
                lease = json.loads(data).get("lease", {})
                if lease.get("expires_at", 0) > time.time():
                    raise LeaseError(f"object {oid} lease still active; use force=True")
        shutil.rmtree(path)

    def scan(self, sql: str, ids: Iterable[str], fmt: str = "pandas"):
        """Run one query against each object (read-only restore) —
        reference namespace.py:52. Returns [(oid, result), ...]."""
        out = []
        for oid in ids:
            with self.open(oid, read_only=True) as obj:
                out.append((oid, obj.query(sql, fmt)))
        return out
