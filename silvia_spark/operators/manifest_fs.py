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
this same interface with the store's conditional-put headers
(``s3_fs.py`` is that port, env-gated).

Porting notes — lease vs fencing (r09 advice): a lease is NOT mutual
exclusion against a STALLED holder. A holder paused past the TTL (GC,
SIGSTOP, VM migration) has its lease broken and another holder admitted,
yet it resumes and executes the rest of its critical section. The one
write whose loss of exclusion corrupts the table is the POINTER write
(a regressed ``_current`` hides committed data), so that write is
FENCED. The simulator fences on the lease token (check + write are one
atomic step under the server-stand-in guard); a real S3 cannot
condition a PUT on ANOTHER object's etag, so there the fencing token is
the POINTER's own generation: one GET yields value + etag, a write
at/behind the read value refuses, and the PUT conditions on that same
read's etag (``s3_fs.py``) — either way, a stalled holder's late write
can never regress the pointer (the Chubby/ZooKeeper fencing-token
discipline, adapted to what each store can express).
Vacuum's DELETE sweep under a broken lease is benign by the protocol's
own invariants: every path it deletes was either unreferenced by all
retained manifests at triage (still true later — manifests are
immutable and new commits only reference freshly adopted,
grace-protected files) or belonged to a retired snapshot; the one
delete that could race a live commit (an aged ahead-of-pointer claim)
is re-checked by that committer's post-flip ``_claim_survived``. The
''protocol needs nothing POSIX'' claim is therefore scoped: crash AND
stall failures are covered for the pointer, crash failures for
everything else.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from contextlib import contextmanager


class LeaseLost(RuntimeError):
    """Raised by a FENCED write when the caller's lease was broken
    between acquisition and the write: a live-but-stalled holder (GC
    pause, suspended process) that missed heartbeats past the TTL must
    NOT execute its pointer write after another holder took over —
    doing so would regress ``_current`` and hide committed data. The
    fenced write is the object-store analogue of a fencing token: the
    write happens conditionally on the lease still being ours, in the
    same server-side atomic step (r09 advice finding)."""


class LocalFS:
    """POSIX adapter — the default. Atomicity comes from O_EXCL,
    rename, and flock."""

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def put_if_absent(self, path: str, data: str) -> bool:
        """Create-exclusive claim; False when the path already exists
        (the CAS-failure signal). Content-atomic: the data is fully
        written to a hidden temp file first and the visible name is
        taken with os.link — exclusive like O_EXCL, but a concurrent
        reader (vacuum triage, a racing appender's _load_doc) can never
        observe a partially-written claim under the final name (open
        "x" + write exposed exactly that window — r09 review finding)."""
        if os.path.exists(path):
            # fast path for the contended-append loop: a lost claim
            # costs a stat, not a full payload write + link + unlink
            # (os.link below remains the authoritative exclusivity)
            return False
        tmp = os.path.join(os.path.dirname(path),
                           f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def put_atomic(self, path: str, data: str) -> None:
        tmp = os.path.join(os.path.dirname(path),
                           f".{os.path.basename(path)}-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(data)
        os.rename(tmp, path)

    def put_fenced(self, root: str, path: str, data: str,
                   claim_path: str | None = None) -> None:
        """Pointer write fenced against lease loss. On POSIX this is
        just ``put_atomic``: flock cannot be 'broken by age' — a stalled
        holder KEEPS the lock (the OS releases it only on process
        death), so the stalled-writer-after-takeover scenario is
        structurally impossible and no extra check is needed
        (``claim_path`` — the S3 adapter's post-write claim
        verification hook — is unused for the same reason: no vacuum
        can run while the flipper holds flock)."""
        self.put_atomic(path, data)

    def move_in(self, src: str, dst: str) -> None:
        os.rename(src, dst)
        # Vacuum's orphan grace is keyed to mtime, but rename PRESERVES
        # the staged file's write-time mtime: a commit whose Spark
        # staging stage ran longer than the grace window would adopt
        # files already past grace, and a concurrent vacuum could sweep
        # them before the manifest claim lands. Refreshing here makes
        # grace measure time-since-ADOPTION — the claim follows within
        # milliseconds (r09 advice finding). The object-store adapter
        # needs no equivalent: its copy creates the destination fresh.
        os.utime(dst, None)

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
        """Best-effort: adoption takes no lock, so a committer can drop
        a file into the dir between our listdir and rmdir (ENOTEMPTY) or
        another sweep can beat us to it (ENOENT) — both are fine
        outcomes, not errors."""
        try:
            if not os.listdir(path):
                os.rmdir(path)
        except OSError:
            pass

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
        # per-thread map root → lease token currently held by THIS
        # thread; put_fenced checks the on-store lease against it
        self._tls = threading.local()

    def put_if_absent(self, path: str, data: str) -> bool:
        with self._cas_guard:  # the store's server-side If-None-Match
            if os.path.exists(path):
                return False
            # objects become visible complete or not at all — the
            # store's own guarantee; put_atomic reproduces it locally
            self.put_atomic(path, data)
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
        os.remove(src)  # (the copy is born with a fresh mtime, so the
        #                 adoption-grace refresh is inherent here)

    def put_fenced(self, root: str, path: str, data: str,
                   claim_path: str | None = None) -> None:
        """Pointer write CONDITIONAL on the caller's lease still being
        its own — the fencing-token discipline a real store needs
        because a lease (unlike flock) can be broken by age while its
        holder is merely stalled. The lease-token check and the write
        are one server-side atomic step here (under ``_cas_guard``,
        standing in for S3's ``If-Match``-on-etag / GCS's
        ``ifGenerationMatch`` conditional PUT): a holder whose lease was
        broken — or re-issued to someone else — gets ``LeaseLost``
        instead of silently regressing the pointer."""
        held = getattr(self._tls, "held", {}).get(root)
        lease = os.path.join(root, ".flip_lease")
        with self._cas_guard:
            try:
                with open(lease, encoding="utf-8") as f:
                    current = f.read()
            except FileNotFoundError:
                current = None
            if held is None or current != held:
                raise LeaseLost(
                    f"lease under {root} is no longer ours (held="
                    f"{held!r}, store={current!r}): the critical "
                    "section outlived the TTL and another holder took "
                    "over — refusing the pointer write")
            tmp = f"{path}.put-{uuid.uuid4().hex}"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(data)
            os.replace(tmp, path)

    @contextmanager
    def locked(self, root: str):
        """Lease-object mutex: take ``.flip_lease`` via conditional
        put; a holder that died is detected by lease age (TTL) and the
        lease is broken with an age-rechecked delete. A LIVE holder
        renews the lease's mtime on a heartbeat (TTL/3) for as long as
        it holds the section, so a long vacuum sweep is never broken
        mid-deletion by a TTL that was sized for microsecond flips —
        only a holder that actually died stops renewing and ages out.
        Break and release both run under the CAS guard (the store's
        conditional-delete), so a breaker can never delete a lease that
        was renewed or re-issued after its age check."""
        import threading

        lease = os.path.join(root, ".flip_lease")
        token = uuid.uuid4().hex
        while True:
            if self.put_if_absent(lease, token):
                break
            with self._cas_guard:
                # atomic age-check + break: nothing can renew or
                # re-issue between the check and the delete
                try:
                    if (time.time() - os.path.getmtime(lease)
                            > self.LEASE_TTL_SEC):
                        os.remove(lease)
                except FileNotFoundError:
                    pass
            time.sleep(0.002)
        stop = threading.Event()

        def _beat():
            while not stop.wait(self.LEASE_TTL_SEC / 3):
                with self._cas_guard:
                    try:
                        with open(lease, encoding="utf-8") as f:
                            if f.read() != token:
                                return  # lost it; never touch again
                        os.utime(lease, None)
                    except FileNotFoundError:
                        return

        beat = threading.Thread(target=_beat, daemon=True)
        beat.start()
        if not hasattr(self._tls, "held"):
            self._tls.held = {}
        self._tls.held[root] = token
        try:
            yield
        finally:
            self._tls.held.pop(root, None)
            stop.set()
            beat.join(timeout=1.0)
            with self._cas_guard:
                # conditional delete: only OUR lease — a breaker may
                # have re-issued it while we overstayed a missed beat
                try:
                    with open(lease, encoding="utf-8") as f:
                        mine = f.read() == token
                    if mine:
                        os.remove(lease)
                except FileNotFoundError:
                    pass
