"""The manifest commit protocol re-run on object-store semantics
(r08 verdict item 3): tests/test_manifest_table.py's crash, usurpation,
vacuum, and evolution scenarios executed with ``manifest_table.FS``
swapped to ObjectStoreSimFS — conditional put + plain PUT + copy/delete
+ age-expired lease; no O_EXCL, no rename-as-commit, no flock. Green
here proves the protocol's atomicity claims rest on primitives every
object store has, not on POSIX crutches.

The simulator lives in silvia_spark/operators/manifest_fs.py; wiring a
real S3/GCS client means implementing the same five-method interface
with the store's conditional-put headers.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

import tests.test_manifest_table as base
from silvia_spark.operators import manifest_table as mt
from silvia_spark.operators.manifest_fs import ObjectStoreSimFS


@pytest.fixture(autouse=True)
def objectstore_fs(monkeypatch):
    monkeypatch.setattr(mt, "FS", ObjectStoreSimFS())


# --- fast, no-Spark protocol pins (default suite) -------------------------


def test_os_vacuum_spares_inflight_claims(tmp_path):
    base.test_vacuum_spares_inflight_claims(tmp_path)


def test_os_flip_aborts_on_vacuumed_claim(tmp_path):
    base.test_flip_aborts_on_vacuumed_claim(tmp_path)


def test_os_reclaim_refuses_committed_version(tmp_path):
    base.test_reclaim_refuses_committed_version(tmp_path)


def test_lease_mutex_serializes_and_breaks_expired(tmp_path):
    """The lease that replaces flock: contenders serialize through the
    conditional put, and an expired (crashed-holder) lease is broken by
    age instead of wedging the table."""
    fs = ObjectStoreSimFS()
    root = str(tmp_path)
    order: list[int] = []

    def hold(i):
        with fs.locked(root):
            order.append(i)
            time.sleep(0.05)
            order.append(i)

    ts = [threading.Thread(target=hold, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # strict serialization: each holder's two marks are adjacent
    assert all(order[i] == order[i + 1] for i in range(0, 6, 2))

    # a crashed holder's lease is broken once it ages past the TTL
    lease = os.path.join(root, ".flip_lease")
    with open(lease, "w") as f:
        f.write("dead-holder")
    old = time.time() - fs.LEASE_TTL_SEC - 5
    os.utime(lease, (old, old))
    t0 = time.time()
    with fs.locked(root):
        pass
    assert time.time() - t0 < fs.LEASE_TTL_SEC  # broke it, didn't wait


# --- full protocol reruns (CI mode; suite-time budget) ---------------------


@pytest.mark.full
def test_os_merge_commits_atomically_and_time_travels(spark, tmp_path):
    base.test_merge_commits_atomically_and_time_travels(spark, tmp_path)


@pytest.mark.full
def test_os_crash_before_pointer_flip(spark, tmp_path, monkeypatch):
    base.test_crash_before_pointer_flip_keeps_old_snapshot(
        spark, tmp_path, monkeypatch)


@pytest.mark.full
def test_os_vacuum_retires_old_snapshots(spark, tmp_path):
    base.test_vacuum_retires_old_snapshots(spark, tmp_path)


@pytest.mark.full
def test_os_usurped_append_claim_rebases_not_lost(spark, tmp_path,
                                                  monkeypatch):
    base.test_usurped_append_claim_rebases_not_lost(
        spark, tmp_path, monkeypatch)


@pytest.mark.full
def test_os_usurped_merge_raises_not_silent(spark, tmp_path, monkeypatch):
    base.test_usurped_merge_raises_not_silent(spark, tmp_path, monkeypatch)


@pytest.mark.full
def test_os_crashed_create_is_reclaimed(spark, tmp_path):
    base.test_crashed_create_is_reclaimed(spark, tmp_path)


@pytest.mark.full
def test_os_vacuum_spares_commit_staged_mid_sweep(tmp_path, monkeypatch):
    base.test_vacuum_spares_commit_staged_mid_sweep(tmp_path, monkeypatch)


@pytest.mark.full
def test_os_schema_evolution(spark, tmp_path):
    base.test_schema_evolution_append_and_time_travel(spark, tmp_path)


@pytest.mark.full
def test_os_concurrent_append_merge_vacuum_stress(spark, tmp_path):
    base.test_concurrent_append_merge_vacuum_stress(spark, tmp_path)


def test_os_fenced_pointer_write_refuses_broken_lease(tmp_path):
    """r09 advice: a lease is not mutual exclusion against a STALLED
    holder — one paused past the TTL resumes and executes its pointer
    write after another holder took over, regressing _current. The
    pointer write is therefore FENCED: conditional on the lease still
    being the writer's own, in the same server-side atomic step."""
    from silvia_spark.operators.manifest_fs import (LeaseLost,
                                                    ObjectStoreSimFS)

    fs = ObjectStoreSimFS()
    root = str(tmp_path)
    ptr = os.path.join(root, "_current")
    fs.put_atomic(ptr, "1")

    with fs.locked(root):
        # simulate the takeover: our lease aged out mid-stall and a
        # second holder re-issued it under its own token
        fs.put_atomic(os.path.join(root, ".flip_lease"), "usurper")
        with pytest.raises(LeaseLost):
            fs.put_fenced(root, ptr, "2")
    assert fs.read_text(ptr) == "1", "fenced write must not regress"
    os.remove(os.path.join(root, ".flip_lease"))  # clear the fake

    # a write with no lease held at all is refused too
    with pytest.raises(LeaseLost):
        fs.put_fenced(root, ptr, "2")

    # the healthy path: held lease, fenced write lands
    with fs.locked(root):
        fs.put_fenced(root, ptr, "2")
    assert fs.read_text(ptr) == "2"



# --- r11 surface on object-store semantics ---------------------------------
# The new table ops (CDF records, constraints, spec evolution, restore,
# shallow clone, hidden transforms) re-run with FS swapped: green proves
# their sidecar writes and metadata commits also rest on conditional-put
# + copy/delete primitives, never on rename/flock.


@pytest.mark.full
def test_os_cdf_feed_and_silent_compaction(spark, tmp_path):
    import tests.test_manifest_cdf as cdf
    cdf.test_batch_feed_replays_versions_with_old_images(spark, tmp_path)
    cdf.test_compaction_and_metadata_versions_are_silent(
        spark, tmp_path / "b")


@pytest.mark.full
def test_os_constraints_enforced(spark, tmp_path):
    import tests.test_manifest_constraints as cons
    cons.test_violating_append_refused_atomically(spark, tmp_path)


@pytest.mark.full
def test_os_spec_evolution_and_migration(spark, tmp_path):
    import tests.test_partition_evolution as pe
    pe.test_merge_delete_refuse_until_migrated(spark, tmp_path)


@pytest.mark.full
def test_os_hidden_transform_commits(spark, tmp_path):
    import tests.test_partition_transform as pt
    pt.test_commits_name_the_source_column(spark, tmp_path)


@pytest.mark.full
def test_os_restore_and_history(spark, tmp_path):
    import tests.test_table_history as th
    th.test_restore_keeps_txn_ledger_for_exactly_once(spark, tmp_path)
    th.test_restore_reverts_rename_and_later_constraint(
        spark, tmp_path / "b")


@pytest.mark.full
def test_os_shallow_clone_diverges(spark, tmp_path):
    import tests.test_table_clone as tc
    tc.test_clone_is_zero_copy_and_divergence_is_two_way(spark, tmp_path)
