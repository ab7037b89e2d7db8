"""Commit history, timestamp time travel, and RESTORE (L27/L28):
op/ts recording, version_at resolution, retention truncation, restore
metadata semantics (txn ledger kept, target's spec/mapping/constraints
restored), and the restore × CDF diff."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Row

from silvia_spark.operators.manifest_table import (
    ConstraintViolation, add_check_constraint, commit_append,
    commit_delete, create_table, current_version, load_manifest,
    read_change_feed, read_snapshot, rename_column, restore_table,
    table_history, vacuum, version_at)


def _mk(spark, tmp_path, **kw):
    root = os.path.join(str(tmp_path), "tbl")
    df = spark.createDataFrame(
        [Row(k=i, part=("a" if i % 2 else "b"), v=float(i))
         for i in range(1, 11)])
    create_table(df.select("k", "v", "part"), root, "part", **kw)
    return root


def test_history_records_ops_and_monotonic_ts(spark, tmp_path):
    root = _mk(spark, tmp_path)
    commit_append(spark, root,
                  spark.createDataFrame([Row(k=20, v=1.0, part="a")]),
                  "part")
    add_check_constraint(spark, root, "v_pos", "v > 0")
    commit_delete(spark, root,
                  spark.createDataFrame([Row(k=4, part="b")]),
                  ["k", "part"], "part")
    hist = table_history(root)
    assert [h["op"] for h in hist] == [
        "delete", "add_constraint", "append", "create"]
    ts = [h["ts"] for h in hist]
    assert ts == sorted(ts, reverse=True) or len(set(ts)) < len(ts)
    assert table_history(root, limit=2) == hist[:2]


def test_version_at_resolution_and_edges(spark, tmp_path):
    root = _mk(spark, tmp_path)
    commit_append(spark, root,
                  spark.createDataFrame([Row(k=20, v=1.0, part="a")]),
                  "part")
    hist = {h["version"]: h["ts"] for h in table_history(root)}
    assert version_at(root, hist[1]) == 1
    assert version_at(root, (hist[1] + hist[2]) / 2) in (1, 2)
    assert version_at(root, time.time() + 10) == 2
    with pytest.raises(ValueError, match="no retained snapshot"):
        version_at(root, hist[1] - 100)


def test_history_truncates_at_vacuum_horizon(spark, tmp_path,
                                             monkeypatch):
    monkeypatch.setenv("SILVIA_READER_LEASE_TTL_SEC", "0.01")
    root = _mk(spark, tmp_path)
    for k in (20, 21, 22):
        commit_append(spark, root,
                      spark.createDataFrame([Row(k=k, v=1.0,
                                                 part="a")]), "part")
    vacuum(root, keep_versions=2)
    hist = table_history(root)
    assert [h["version"] for h in hist] == [4, 3]
    with pytest.raises(ValueError, match="no retained"):
        version_at(root, 0.0)


def test_restore_keeps_txn_ledger_for_exactly_once(spark, tmp_path):
    root = _mk(spark, tmp_path)
    batch = spark.createDataFrame([Row(k=50, v=5.0, part="a")])
    commit_append(spark, root, batch, "part", txn=("app", 7))
    restore_table(spark, root, 1)
    # the replayed exactly-once batch must STAY a no-op after restore
    v = commit_append(spark, root, batch, "part", txn=("app", 7))
    assert v == current_version(root)
    assert read_snapshot(spark, root).where("k = 50").count() == 0


def test_restore_reverts_rename_and_later_constraint(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v1 = current_version(root)
    rename_column(root, "k", "key")
    add_check_constraint(spark, root, "v_pos", "v > 0")
    restore_table(spark, root, v1)
    snap = read_snapshot(spark, root)
    assert "k" in snap.columns and "key" not in snap.columns
    assert "constraints" not in load_manifest(root)
    # the un-constrained restored table accepts what v_pos refused
    commit_append(spark, root,
                  spark.createDataFrame([Row(k=60, v=-1.0, part="a")]),
                  "part")
    assert read_snapshot(spark, root).where("k = 60").count() == 1


def test_restore_noop_to_head_and_cdf_diff(spark, tmp_path):
    root = _mk(spark, tmp_path, cdf=True)
    assert restore_table(spark, root, 1) == 1  # no-op, no commit
    commit_delete(spark, root,
                  spark.createDataFrame([Row(k=3, part="a")]),
                  ["k", "part"], "part")
    commit_append(spark, root,
                  spark.createDataFrame([Row(k=20, v=20.0, part="a")]),
                  "part")
    v_before = current_version(root)
    restore_table(spark, root, 1)
    feed = read_change_feed(spark, root, v_before)
    got = sorted((r["_change_type"], r["k"]) for r in feed.collect())
    assert got == [("delete", 20), ("insert", 3)]
    # restored files survive the next vacuum (they are re-referenced)
    vacuum(root, keep_versions=1)
    assert sorted(r["k"] for r in
                  read_snapshot(spark, root).collect()) == list(
        range(1, 11))


def test_version_at_monotone_adjustment_under_clock_skew(spark,
                                                         tmp_path):
    """r12 ADVICE regression: commit timestamps are not guaranteed
    monotone (rebased claims refresh ts; clocks skew). version_at
    must resolve over a running-max-adjusted history (Delta's
    timestamp adjustment) — the raw newest-first scan could return a
    LATER version for an EARLIER wall time than an intermediate
    commit a reader actually saw."""
    import json as _json

    from silvia_spark.operators.manifest_table import (FS, _load_doc,
                                                       _manifest_path)

    root = _mk(spark, tmp_path)
    for i in (30, 31):
        commit_append(spark, root, spark.createDataFrame(
            [Row(k=i, v=float(i), part="a")]), "part")
    assert current_version(root) == 3
    # skew: v2's clock ran ahead of v3's
    for v, ts in ((1, 1000.0), (2, 3000.0), (3, 2000.0)):
        doc = _load_doc(root, v)
        doc["ts"] = ts
        FS.put_atomic(_manifest_path(root, v), _json.dumps(doc))
    # adjusted history: v1=1000, v2=3000, v3=max(3000,2000)=3000
    assert version_at(root, 2500.0) == 1   # raw scan would say 3
    assert version_at(root, 3000.0) == 3
    assert version_at(root, 1500.0) == 1
    with pytest.raises(ValueError, match="oldest"):
        version_at(root, 999.0)
    # resolution is monotone in ts
    got = [version_at(root, t) for t in (1000, 2000, 2999, 3000, 9999)]
    assert got == sorted(got)


def _fab_chain(root, n, t0=1000.0):
    """Fabricate an n-version metadata-only chain directly (no Spark:
    table_history/version_at read only doc headers)."""
    import json as _json

    from silvia_spark.operators.manifest_table import (FS, _MANIFESTS,
                                                       _manifest_path)

    FS.makedirs(os.path.join(root, _MANIFESTS))
    for v in range(1, n + 1):
        doc = {"version": v, "parent": (v - 1 if v > 1 else None),
               "ts": t0 + v, "op": ("create" if v == 1 else "meta"),
               "segments": []}
        FS.put_atomic(_manifest_path(root, v), _json.dumps(doc))
    FS.put_atomic(os.path.join(root, "_current"), str(n))


def test_history_checkpoint_rolls_and_splices(tmp_path, monkeypatch):
    """r12 (verdict item 5): a long chain resolves O(delta) + one
    checkpoint read, not O(versions) — and the spliced answer is
    identical to the full walk."""
    import silvia_spark.operators.manifest_table as mt

    root = os.path.join(str(tmp_path), "tbl")
    _fab_chain(root, 200)
    full = table_history(root)  # crosses the threshold: rolls the ckpt
    assert len(full) == 200 and full[0]["version"] == 200
    assert os.path.exists(mt._hist_ckpt_path(root))
    # checkpointed resolution must equal a fresh walk
    spliced = table_history(root)
    os.remove(mt._hist_ckpt_path(root))
    rewalked = table_history(root)
    os.remove(mt._hist_ckpt_path(root))  # drop the re-rolled ckpt
    assert spliced == rewalked == full
    # O(delta): with the ckpt at 200 and 5 more commits, the walk
    # reads only the delta's docs
    mt.checkpoint_history(root)
    _fab_chain(root, 205)  # extends to 205 (rewrites, same content)
    reads = {"n": 0}
    orig = mt._load_doc

    def counting(root_, version=None):
        reads["n"] += 1
        return orig(root_, version)

    monkeypatch.setattr(mt, "_load_doc", counting)
    got = table_history(root)
    assert len(got) == 205 and got[5:] == full
    assert reads["n"] <= 6, f"walked {reads['n']} docs past the ckpt"
    assert version_at(root, 1100.0) == 100  # resolves through splice


def test_vacuum_truncates_history_checkpoint(spark, tmp_path):
    import silvia_spark.operators.manifest_table as mt

    root = _mk(spark, tmp_path)
    for i in range(3):
        commit_append(spark, root, spark.createDataFrame(
            [Row(k=30 + i, v=1.0, part="a")]), "part")
    mt.checkpoint_history(root)
    assert os.path.exists(mt._hist_ckpt_path(root))
    vacuum(root, keep_versions=2)
    hist = table_history(root)
    assert [h["version"] for h in hist] == [4, 3]
    ck = mt._hist_ckpt_read(root)
    if ck is not None:  # truncated, never phantom
        assert all(h["version"] >= 3 for h in ck["entries"])
    # and resolution below the horizon still raises
    with pytest.raises(ValueError):
        version_at(root, 0.0)


def test_read_repair_ckpt_skips_when_vacuum_raced_the_walk(
        tmp_path, monkeypatch):
    """r13 (ADVICE 2): the read-repair checkpoint write must not
    resurrect versions a vacuum retired between the walk and the
    write. The write now runs under the flip lock with the oldest
    spliced version's manifest re-verified inside it — simulated here
    by truncating the log at the moment the write acquires the lock
    (exactly where a racing vacuum's effects become visible)."""
    from contextlib import contextmanager

    import silvia_spark.operators.manifest_table as mt

    root = os.path.join(str(tmp_path), "tbl")
    _fab_chain(root, 100)
    real_locked = mt.FS.locked
    fired = {"n": 0}

    @contextmanager
    def racing_locked(r):
        if fired["n"] == 0:
            fired["n"] = 1
            for v in range(1, 98):  # vacuum keep_versions=3 equivalent
                os.remove(mt._manifest_path(root, v))
            if os.path.exists(mt._hist_ckpt_path(root)):
                os.remove(mt._hist_ckpt_path(root))
        with real_locked(r):
            yield

    monkeypatch.setattr(mt.FS, "locked", racing_locked)
    full = table_history(root)  # walk read all docs pre-race
    assert len(full) == 100
    monkeypatch.undo()
    ck = mt._hist_ckpt_read(root)
    assert ck is None or all(
        os.path.exists(mt._manifest_path(root, h["version"]))
        for h in ck["entries"]), "phantom history checkpoint"
    hist = table_history(root)
    assert [h["version"] for h in hist] == [100, 99, 98]
    with pytest.raises(ValueError):
        version_at(root, 0.0)  # below the (raced) horizon: no phantom
