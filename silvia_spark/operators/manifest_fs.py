"""Filesystem adapters for the snapshot-manifest commit protocol.

The protocol (operators/manifest_table.py) needs exactly four
non-trivial primitives beyond plain read/list/delete:

1. ``put_if_absent``  — the version CLAIM. POSIX: ``open(..., "x")``
   (O_CREAT|O_EXCL). Object store: conditional put (S3
   ``If-None-Match: *``, GCS ``ifGenerationMatch=0``).
2. ``put_atomic``     — the POINTER write. POSIX: write-temp +
   ``os.rename`` (readers never see a partial pointer). Object store: a
   plain PUT — per-object atomicity is the store's own guarantee.
3. ``move_in``        — ADOPT a staged file under its commit-unique
   name. POSIX: ``os.rename``. Object store: copy + delete (no atomic
   rename exists; safe here because the destination name is
   commit-unique and invisible until the manifest lands).
4. ``locked``         — serialize pointer flips and vacuum triage.
   POSIX: ``fcntl.flock`` (released by the OS on process death). Object
   store: a LEASE object taken with ``put_if_absent`` and expired by
   age (the standard conditional-put mutex; a crashed holder's lease
   times out instead of wedging the table).

Everything else the protocol does is plain GET/LIST/DELETE/HEAD-mtime,
which every store has. ``ObjectStoreSimFS`` below implements the
object-store contract ON local disk — deliberately refusing the three
POSIX crutches (no O_EXCL claims, no rename-as-commit, no flock) — so
the protocol tests can prove the commit/usurpation/vacuum semantics
survive on conditional-put + lease alone. It is a semantics simulator,
not an S3 client: wiring a real boto3/GCS client means implementing
this same interface with the store's conditional-put headers.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from contextlib import contextmanager


class LocalFS:
    """POSIX adapter — the default. Atomicity comes from O_EXCL,
    rename, and flock."""

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def put_if_absent(self, path: str, data: str) -> bool:
        """Create-exclusive claim; False when the path already exists
        (the CAS-failure signal). Data is fully written before the name
        wins: "x" creates the inode atomically, and claim files are
        only trusted after this returns True."""
        try:
            with open(path, "x", encoding="utf-8") as f:
                f.write(data)
            return True
        except FileExistsError:
            return False

    def put_atomic(self, path: str, data: str) -> None:
        tmp = os.path.join(os.path.dirname(path),
                           f".{os.path.basename(path)}-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(data)
        os.rename(tmp, path)

    def move_in(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def remove(self, path: str) -> None:
        os.remove(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)

    def rmdir_if_empty(self, path: str) -> None:
        if not os.listdir(path):
            os.rmdir(path)

    @contextmanager
    def locked(self, root: str):
        import fcntl

        with open(os.path.join(root, ".flip_lock"), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            yield


class ObjectStoreSimFS(LocalFS):
    """Object-store SEMANTICS on local disk: no O_EXCL claims, no
    rename-as-commit, no flock — only conditional put, per-object
    atomic PUT, copy+delete, and an age-expired lease. Used by the
    protocol tests to prove the commit path needs nothing POSIX.

    ``_cas_guard`` serializes the exists-check+write window that a real
    store's conditional-put evaluates server-side; it is simulator
    plumbing (standing in for the store's own atomicity), not a lock
    the PROTOCOL relies on — the protocol only sees the boolean.
    """

    LEASE_TTL_SEC = 30.0

    def __init__(self):
        import threading

        self._cas_guard = threading.Lock()

    def put_if_absent(self, path: str, data: str) -> bool:
        with self._cas_guard:  # the store's server-side If-None-Match
            if os.path.exists(path):
                return False
            with open(path, "w", encoding="utf-8") as f:
                f.write(data)
            return True

    def put_atomic(self, path: str, data: str) -> None:
        # A real store's PUT replaces the object atomically — that is
        # the STORE's native guarantee (S3/GCS), not something the
        # protocol asks the client to build. Reproducing that guarantee
        # on a local disk requires temp+replace; this is simulator
        # plumbing standing in for the server, same as _cas_guard — the
        # protocol itself never requests a rename.
        tmp = f"{path}.put-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(data)
        os.replace(tmp, path)

    def move_in(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)  # no rename on an object store
        os.remove(src)

    @contextmanager
    def locked(self, root: str):
        """Lease-object mutex: take ``.flip_lease`` via conditional
        put; a holder that died is detected by lease age (TTL) and the
        lease is broken with delete+retake. Spin briefly — flips are
        microseconds, vacuum sweeps are the long pole."""
        lease = os.path.join(root, ".flip_lease")
        token = uuid.uuid4().hex
        while True:
            if self.put_if_absent(lease, token):
                break
            try:
                if time.time() - self.mtime(lease) > self.LEASE_TTL_SEC:
                    # expired holder: break the lease and re-contend
                    # (delete is idempotent; two breakers race to the
                    # conditional put, one wins)
                    try:
                        self.remove(lease)
                    except FileNotFoundError:
                        pass
                    continue
            except FileNotFoundError:
                continue  # released between our put and our mtime probe
            time.sleep(0.002)
        try:
            yield
        finally:
            # release only OUR lease: a TTL-breaker may have re-issued
            # it to someone else while we overstayed
            try:
                if self.read_text(lease) == token:
                    self.remove(lease)
            except FileNotFoundError:
                pass
