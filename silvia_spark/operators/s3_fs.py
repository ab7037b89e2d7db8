"""S3 adapter for the snapshot-manifest commit protocol — the real-
store port of the interface ``ObjectStoreSimFS`` (manifest_fs.py)
proves on local disk. Every primitive maps to the store's own
server-side guarantee:

- ``put_if_absent``  → PutObject ``If-None-Match: *`` (the version
  CLAIM; S3 conditional writes, GA since 2024 — MinIO/GCS-XML speak the
  same header).
- ``put_atomic``     → plain PutObject (per-object atomicity is the
  store's native guarantee; readers never see a torn object).
- ``put_fenced``     → GET the pointer (etag) + verify the lease is
  still ours + PutObject ``If-Match: <etag>`` (``If-None-Match: *`` for
  the first flip). S3 cannot condition a PUT on ANOTHER object's etag,
  so the fencing token here is the POINTER's own generation: a flip
  that landed after our lease broke changed the etag, and our
  conditional replace fails with 412 → ``LeaseLost`` instead of
  regressing ``_current``. This preserves the monotonic-pointer
  invariant under stalled holders — the exact gap the r09 advice named.
- ``move_in``        → CopyObject + DeleteObject (no rename exists;
  safe because destination names are commit-unique and invisible until
  the manifest lands). The copy is born with a fresh LastModified, so
  the adoption-grace refresh is inherent.
- ``locked``         → a LEASE object taken with ``put_if_absent``,
  heartbeat-renewed (conditional re-PUT on its own etag) at TTL/3,
  broken by age. Lease break and release are NOT atomic on S3 (no
  conditional delete) — the documented residual race; it can only
  produce a spurious extra lease-holder, whose pointer write the
  fencing above refuses. Everything else under the lock (vacuum's
  deletes) is safe by the protocol's own invariants (see
  manifest_fs.py's porting notes).

Paths: the protocol passes POSIX-style joined paths; this adapter maps
them to keys verbatim (leading slashes stripped, ``prefix`` prepended).
Directories are virtual: ``makedirs``/``rmdir_if_empty`` are no-ops,
``listdir`` is a delimiter listing, ``remove`` is idempotent (S3
deletes don't 404; every protocol call site tolerates the missing
raise).

Spark itself cannot write through this adapter (staging would need the
s3a Hadoop connector, absent in this environment), so the PROTOCOL
battery — claims, flips, usurpation, vacuum, fencing — is what runs
against it: in-process against moto when installed
(tests/test_manifest_s3.py), or against a real endpoint via
``SILVIA_S3_ENDPOINT`` / ``SILVIA_S3_BUCKET``.
"""

from __future__ import annotations

import os
import time
import uuid
from contextlib import contextmanager

from silvia_spark.operators.manifest_fs import LeaseLost

# Single-request CopyObject limit (5 GiB, an S3 hard cap) and the part
# size the multipart fallback copies in.
_COPY_LIMIT = 5 * 1024**3
_COPY_PART = 1 * 1024**3


def _client(endpoint: str | None = None):
    import boto3

    endpoint = endpoint or os.environ.get("SILVIA_S3_ENDPOINT") or None
    kwargs = {"region_name": os.environ.get("SILVIA_S3_REGION",
                                            "us-east-1")}
    if endpoint:
        kwargs["endpoint_url"] = endpoint
    ak = os.environ.get("SILVIA_S3_ACCESS_KEY")
    sk = os.environ.get("SILVIA_S3_SECRET_KEY")
    if ak and sk:
        kwargs["aws_access_key_id"] = ak
        kwargs["aws_secret_access_key"] = sk
    return boto3.client("s3", **kwargs)


def _err_code(ex) -> str:
    return getattr(ex, "response", {}).get("Error", {}).get("Code", "")


class S3FS:
    """manifest_fs interface over boto3. ``bucket`` defaults to
    ``SILVIA_S3_BUCKET``; ``prefix`` namespaces all keys (so one bucket
    hosts many tables/tests)."""

    LEASE_TTL_SEC = 30.0

    def __init__(self, bucket: str | None = None, prefix: str = "",
                 client=None):
        import threading

        self.bucket = bucket or os.environ["SILVIA_S3_BUCKET"]
        self.prefix = prefix.strip("/")
        self.c = client or _client()
        self._tls = threading.local()

    def _key(self, path: str) -> str:
        k = path.replace(os.sep, "/").lstrip("/")
        return f"{self.prefix}/{k}" if self.prefix else k

    # -- plain object ops ------------------------------------------------

    def read_text(self, path: str) -> str:
        from botocore.exceptions import ClientError

        try:
            r = self.c.get_object(Bucket=self.bucket,
                                  Key=self._key(path))
        except ClientError as ex:
            if _err_code(ex) in ("NoSuchKey", "404"):
                raise FileNotFoundError(path) from None
            raise
        return r["Body"].read().decode("utf-8")

    def put_atomic(self, path: str, data: str) -> None:
        self.c.put_object(Bucket=self.bucket, Key=self._key(path),
                          Body=data.encode("utf-8"))

    def put_if_absent(self, path: str, data: str) -> bool:
        from botocore.exceptions import ClientError

        # 412 PreconditionFailed is the definitive "already exists".
        # 409 ConditionalRequestConflict means a CONCURRENT conditional
        # write was in flight — the object may or may not exist, so the
        # PUT is RETRIED with backoff (mapping it to False made version
        # claims falsely report FileExistsError and lease acquisition
        # spin on a lease that was never created — r10 advice, LOW).
        # After the budget, one existence probe decides; a still-
        # indeterminate state propagates the conflict rather than
        # guessing.
        last_ex = None
        for i in range(4):
            try:
                self.c.put_object(Bucket=self.bucket,
                                  Key=self._key(path),
                                  Body=data.encode("utf-8"),
                                  IfNoneMatch="*")
                return True
            except ClientError as ex:
                if _err_code(ex) in ("PreconditionFailed", "412"):
                    return False
                if _err_code(ex) in ("ConditionalRequestConflict",
                                     "409"):
                    last_ex = ex
                    time.sleep(0.05 * (i + 1))
                    continue
                raise
        if self.exists(path):
            return False
        raise last_ex

    def put_fenced(self, root: str, path: str, data: str,
                   claim_path: str | None = None) -> None:
        """Monotonic pointer CAS, triple-checked (r10 review findings —
        each check closes a distinct stall window):

        1. LEASE content check (fast-fail): a holder whose lease was
           broken and re-issued refuses before touching the pointer.
           Not sufficient alone — the holder can stall right after it.
        2. Pointer VALUE + ETAG in ONE GET: the write refuses if the
           value is already at/ahead of ours (a takeover advanced it
           while we stalled — even before our read), and the PUT
           conditions on that same read's etag (a takeover flipping
           after our read → 412). No window to regress ``_current``.
        3. POST-PUT claim verification (``claim_path``): the one hazard
           neither 1 nor 2 can see is a vacuum that RECLAIMED our
           still-invisible claim manifest during a stall between
           ``_flip_current``'s manifest check and this write — the
           pointer would land on a deleted manifest, bricking reads.
           S3 cannot condition a PUT on another object's existence, so
           verify BEFORE (narrows the reader-visible window to one
           round-trip) and authoritatively AFTER: if the claim
           vanished, roll the pointer back (conditional on OUR etag, so
           a legitimate later flip is never undone) and raise
           CommitAborted — the retryable signal commit paths already
           speak. Residual: a crash between the PUT
           and the rollback leaves the dangling pointer until repair —
           which requires a stall > _CLAIM_GRACE_SEC inside a
           microsecond-scale window AND a crash inside this method;
           size the grace like Delta/Iceberg retention (hours) in
           production to retire it entirely."""
        from botocore.exceptions import ClientError

        held = getattr(self._tls, "held", {}).get(root)
        if held is None:
            # programming-error fast-fail, zero I/O (r10 review pass 3)
            raise LeaseLost(
                f"no lease held under {root} — refusing the pointer "
                "write")
        lease_key = self._key(os.path.join(root, ".flip_lease"))
        try:
            lease = self.c.get_object(
                Bucket=self.bucket, Key=lease_key)["Body"].read().decode()
        except ClientError as ex:
            if _err_code(ex) not in ("NoSuchKey", "404"):
                raise  # transient store error, NOT a lost lease — a
                #        503 must not abort a healthy commit
            lease = None
        if lease != held:
            raise LeaseLost(
                f"lease under {root} is no longer ours (held={held!r}) "
                "— refusing the pointer write")
        key = self._key(path)
        cur_val = None
        try:
            cur = self.c.get_object(Bucket=self.bucket, Key=key)
            cur_val = cur["Body"].read().decode("utf-8")
            cond = {"IfMatch": cur["ETag"]}
            if int(cur_val) >= int(data):
                raise LeaseLost(
                    f"pointer {path} is already at {cur_val} (writing "
                    f"{data}): a takeover advanced it while we were "
                    "stalled — refusing the regression")
        except ClientError as ex:
            if _err_code(ex) not in ("NoSuchKey", "404"):
                raise
            cond = {"IfNoneMatch": "*"}
        if claim_path is not None and not self._exists_retry(claim_path):
            # pre-PUT claim check, placed immediately before the PUT so
            # the residual reclaim window is exactly ONE round-trip; the
            # post-PUT verification below stays authoritative
            self._raise_claim_vanished(root, claim_path)
        try:
            put = self.c.put_object(Bucket=self.bucket, Key=key,
                                    Body=data.encode("utf-8"), **cond)
        except ClientError as ex:
            if _err_code(ex) in ("PreconditionFailed",
                                 "ConditionalRequestConflict", "412",
                                 "409"):
                raise LeaseLost(
                    f"pointer {path} advanced under us (etag mismatch): "
                    "a takeover flipped after our read") from None
            raise
        if claim_path is not None and not self._exists_retry(claim_path):
            # stall window 3: our claim was vacuum-reclaimed between the
            # pre-PUT check and the PUT — roll back conditionally on OUR
            # write's etag and fail as a retryable abort. The rollback
            # is RETRIED on transient errors (the write whose failure
            # leaves a dangling pointer deserves at least the retry
            # budget the probe gets); only 412 is definitive — it
            # proves our object is no longer current, i.e. someone
            # already advanced past us and THEIR pointer is valid. A
            # 409 only proves a concurrent conditional write was in
            # flight, nothing about the pointer's state — retried too
            # (r10 review pass 4).
            last_ex = None
            for i in range(3):
                try:
                    if cur_val is not None:
                        self.c.put_object(Bucket=self.bucket, Key=key,
                                          Body=cur_val.encode("utf-8"),
                                          IfMatch=put["ETag"])
                    else:
                        # first-flip rollback: only remove the pointer
                        # if it is still OUR write (no conditional
                        # delete on S3 — the head/delete gap is the
                        # narrowest available)
                        h = self.c.head_object(Bucket=self.bucket,
                                               Key=key)
                        if h["ETag"] == put["ETag"]:
                            self.c.delete_object(Bucket=self.bucket,
                                                 Key=key)
                    last_ex = None
                    break
                except ClientError as ex:
                    if _err_code(ex) in ("PreconditionFailed", "412",
                                         "NoSuchKey", "404"):
                        last_ex = None
                        break  # definitive: no longer ours to restore
                    last_ex = ex
                    time.sleep(0.2 * (i + 1))
            if last_ex is not None:
                # persistent failure of the rollback itself: the
                # pointer is STILL dangling — escalate loudly, do NOT
                # claim a clean abort (r10 review pass 3)
                raise RuntimeError(
                    f"pointer {path} references the reclaimed claim "
                    f"{claim_path} and the rollback write failed — "
                    "MANUAL REPAIR REQUIRED (restore the pointer to "
                    "its previous version)") from last_ex
            self._raise_claim_vanished(root, claim_path)

    def _exists_retry(self, path: str, attempts: int = 3) -> bool:
        """Existence probe that retries transient store errors: the
        claim-verification HEAD runs AFTER a successful pointer write,
        where a spurious failure would make a COMMITTED flip report as
        failed (an application retry would then duplicate the batch).
        Persistent non-404 errors propagate as the infrastructure
        failures they are — state explicitly unknown, never mapped to a
        clean abort (r10 review pass 3)."""
        from botocore.exceptions import ClientError

        for i in range(attempts):
            try:
                return self.exists(path)
            except ClientError:
                if i == attempts - 1:
                    raise
                time.sleep(0.2 * (i + 1))
        raise AssertionError("unreachable")

    def _raise_claim_vanished(self, root: str, claim_path: str):
        """Raise the RETRYABLE abort the rest of the protocol already
        speaks: commit_append catches CommitAborted and restages, and
        merge/compaction surface it as loudly as their pre-flip
        manifest check does — LeaseLost here would turn a recoverable
        state into a hard failure (r10 review pass 3)."""
        from silvia_spark.operators.manifest_table import CommitAborted

        raise CommitAborted(
            f"claim manifest {claim_path} under {root} vanished before "
            "its pointer flip (vacuum-reclaimed during a stall) — "
            "nothing became visible; restage and retry")

    def move_in(self, src: str, dst: str) -> None:
        """Adopt = CopyObject + DeleteObject. A single CopyObject is
        capped at 5 GiB by S3; adopted staged files at the 100 TB scale
        this module targets can exceed that, so larger objects fall
        back to a multipart UploadPartCopy (r10 advice, LOW)."""
        sk, dk = self._key(src), self._key(dst)
        size = self.c.head_object(Bucket=self.bucket,
                                  Key=sk)["ContentLength"]
        if size <= _COPY_LIMIT:
            self.c.copy_object(
                Bucket=self.bucket, Key=dk,
                CopySource={"Bucket": self.bucket, "Key": sk})
        else:
            mp = self.c.create_multipart_upload(Bucket=self.bucket,
                                                Key=dk)
            try:
                parts = []
                for n, off in enumerate(range(0, size, _COPY_PART), 1):
                    end = min(off + _COPY_PART, size) - 1
                    r = self.c.upload_part_copy(
                        Bucket=self.bucket, Key=dk,
                        UploadId=mp["UploadId"], PartNumber=n,
                        CopySource={"Bucket": self.bucket, "Key": sk},
                        CopySourceRange=f"bytes={off}-{end}")
                    parts.append({"PartNumber": n,
                                  "ETag": r["CopyPartResult"]["ETag"]})
                self.c.complete_multipart_upload(
                    Bucket=self.bucket, Key=dk, UploadId=mp["UploadId"],
                    MultipartUpload={"Parts": parts})
            except Exception:
                self.c.abort_multipart_upload(Bucket=self.bucket,
                                              Key=dk,
                                              UploadId=mp["UploadId"])
                raise
        self.c.delete_object(Bucket=self.bucket, Key=sk)

    def remove(self, path: str) -> None:
        # S3 deletes are idempotent (no 404); every protocol call site
        # tolerates the missing FileNotFoundError
        self.c.delete_object(Bucket=self.bucket, Key=self._key(path))

    # -- listing / stat ----------------------------------------------------

    def listdir(self, path: str) -> list[str]:
        prefix = self._key(path).rstrip("/") + "/"
        names: set[str] = set()
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": prefix,
                  "Delimiter": "/"}
            if token:
                kw["ContinuationToken"] = token
            r = self.c.list_objects_v2(**kw)
            for o in r.get("Contents", ()):
                names.add(o["Key"][len(prefix):])
            for p in r.get("CommonPrefixes", ()):
                names.add(p["Prefix"][len(prefix):].rstrip("/"))
            if not r.get("IsTruncated"):
                break
            token = r.get("NextContinuationToken")
        names.discard("")
        return sorted(names)

    def mtime(self, path: str) -> float:
        from botocore.exceptions import ClientError

        try:
            h = self.c.head_object(Bucket=self.bucket,
                                   Key=self._key(path))
        except ClientError as ex:
            if _err_code(ex) in ("NoSuchKey", "404"):
                raise FileNotFoundError(path) from None
            raise
        return h["LastModified"].timestamp()

    def exists(self, path: str) -> bool:
        from botocore.exceptions import ClientError

        try:
            self.c.head_object(Bucket=self.bucket, Key=self._key(path))
            return True
        except ClientError as ex:
            if _err_code(ex) not in ("NoSuchKey", "404"):
                raise
        return self.isdir(path)

    def isdir(self, path: str) -> bool:
        prefix = self._key(path).rstrip("/") + "/"
        r = self.c.list_objects_v2(Bucket=self.bucket, Prefix=prefix,
                                   MaxKeys=1)
        return r.get("KeyCount", 0) > 0

    # -- virtual directories ------------------------------------------------

    def makedirs(self, path: str) -> None:
        pass  # directories are virtual

    def rmdir_if_empty(self, path: str) -> None:
        pass  # nothing to reclaim

    def rmtree(self, path: str) -> None:
        prefix = self._key(path).rstrip("/") + "/"
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": prefix}
            if token:
                kw["ContinuationToken"] = token
            r = self.c.list_objects_v2(**kw)
            keys = [{"Key": o["Key"]} for o in r.get("Contents", ())]
            if keys:
                self.c.delete_objects(Bucket=self.bucket,
                                      Delete={"Objects": keys})
            if not r.get("IsTruncated"):
                break
            token = r.get("NextContinuationToken")

    # -- lease mutex ---------------------------------------------------------

    @contextmanager
    def locked(self, root: str):
        """Same lease discipline as the simulator (manifest_fs.py):
        conditional-put acquisition, heartbeat renewal at TTL/3
        (conditional re-PUT on the lease's own etag — a renewal that
        races a break loses cleanly), age-based break. The break/release
        deletes are unconditional (S3 has no conditional delete) — the
        residual race admits a spurious second holder, whose pointer
        write ``put_fenced`` then refuses; see the module docstring."""
        import threading

        from botocore.exceptions import ClientError

        lease_path = os.path.join(root, ".flip_lease")
        lease_key = self._key(lease_path)
        token = uuid.uuid4().hex
        while True:
            if self.put_if_absent(lease_path, token):
                break
            try:
                age = time.time() - self.mtime(lease_path)
                if age > self.LEASE_TTL_SEC:
                    self.c.delete_object(Bucket=self.bucket,
                                         Key=lease_key)
            except FileNotFoundError:
                pass
            time.sleep(0.05)
        stop = threading.Event()

        def _beat():
            while not stop.wait(self.LEASE_TTL_SEC / 3):
                try:
                    h = self.c.head_object(Bucket=self.bucket,
                                           Key=lease_key)
                    body = self.c.get_object(
                        Bucket=self.bucket,
                        Key=lease_key)["Body"].read().decode()
                    if body != token:
                        return  # lost it; never touch again
                    self.c.put_object(Bucket=self.bucket, Key=lease_key,
                                      Body=token.encode(),
                                      IfMatch=h["ETag"])
                except ClientError:
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
            try:
                body = self.c.get_object(
                    Bucket=self.bucket,
                    Key=lease_key)["Body"].read().decode()
                if body == token:
                    self.c.delete_object(Bucket=self.bucket,
                                         Key=lease_key)
            except ClientError:
                pass
