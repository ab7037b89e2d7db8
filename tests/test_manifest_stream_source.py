"""The manifest streaming source's exactly-once story across RUNS: a
checkpointed query that stops and restarts must resume from its
committed version offset — new commits arrive, already-delivered ones
never re-deliver. (The in-run semantics are hash-checked by the L16
contract; this pins the offset checkpointing the contract can't.)"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from silvia_spark.operators import manifest_table as mt
from silvia_spark.sources.manifest_stream import read_stream_table


def _run_available_now(spark, root, out_dir, checkpoint):
    """One availableNow run into a durable parquet sink (the memory sink
    cannot recover a checkpoint); returns only THIS run's output rows.
    Each micro-batch lands in its own epoch subdir so runs stay
    distinguishable."""
    before = set(os.listdir(out_dir)) if os.path.isdir(out_dir) else set()
    q = (read_stream_table(spark, root)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    new = [os.path.join(out_dir, f)
           for f in set(os.listdir(out_dir)) - before
           if f.endswith(".parquet")]
    if not new:
        return spark.createDataFrame(
            [], mt.read_snapshot(spark, root).schema)
    return spark.read.parquet(*new)


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_checkpointed_stream_resumes_at_version_offset(spark, tmp_path):
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(1, "p1", 10.0), (2, "p2", 20.0)],
        "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")

    out = str(tmp_path / "out")
    got1 = _run_available_now(spark, root, out, ckpt)
    assert sorted(r.k for r in got1.collect()) == [1, 2]

    b = spark.createDataFrame([(3, "p1", 30.0), (4, "p2", 40.0)],
                              "k BIGINT, part STRING, v DOUBLE")
    mt.commit_append(spark, root, b, "part")
    got2 = _run_available_now(spark, root, out, ckpt)
    # only the NEW commit arrives — versions before the checkpointed
    # offset never re-deliver
    assert sorted(r.k for r in got2.collect()) == [3, 4]

    # no new commits: the third run delivers nothing (and doesn't hang)
    got3 = _run_available_now(spark, root, out, ckpt)
    assert got3.count() == 0


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_stream_delivers_merge_rewrites_file_granular(spark, tmp_path):
    """A MERGE's rewritten partition re-delivers wholesale HERE because
    the fixture tracks no key stats (with a stats index only the
    rewritten files re-deliver — consume as upsert-by-key either way);
    untouched partitions stay silent."""
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(1, "p1", 10.0), (2, "p1", 20.0), (3, "p2", 30.0)],
        "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")
    out = str(tmp_path / "out")
    _run_available_now(spark, root, out, ckpt)

    chg = spark.createDataFrame([(1, "p1", 11.0, "U")],
                                "k BIGINT, part STRING, v DOUBLE, "
                                "op STRING")
    mt.commit_merge(spark, root, chg, ["k", "part"], "part")
    got = _run_available_now(spark, root, out, ckpt)
    rows = sorted((r.k, r.part, r.v) for r in got.collect())
    # p1 re-delivered post-merge (k=1 updated, k=2 carried); p2 silent
    assert rows == [(1, "p1", 11.0), (2, "p1", 20.0)]


def test_stream_schema_matches_snapshot_read(spark, tmp_path):
    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "p1", 10.0)], "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")
    stream_schema = read_stream_table(spark, root).schema
    batch_schema = mt.read_snapshot(spark, root).schema
    assert [f.name for f in stream_schema.fields] == [
        f.name for f in batch_schema.fields]
    # int partition columns cast from dir-name strings
    root2 = str(tmp_path / "t2")
    mt.create_table(spark.createDataFrame(
        [(1, 7, 10.0)], "k BIGINT, day INT, v DOUBLE"), root2, "day")
    df = read_stream_table(spark, root2)
    q = (df.writeStream.format("memory").queryName("msrc_int")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    row = spark.table("msrc_int").collect()[0]
    assert (row.k, row.day, row.v) == (1, 7, 10.0)
    assert isinstance(row.day, int)


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_stream_fails_loudly_on_mid_stream_evolution(spark, tmp_path):
    """A LONG-RUNNING stream whose table evolves mid-flight must FAIL at
    the next batch (Delta's behavior) — its reader pinned the old schema
    at start, and delivering rows under it would silently drop the new
    column. A RESTARTED stream constructs a fresh reader and adopts the
    evolved schema."""
    from silvia_spark.sources.manifest_stream import (ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "p1", 10.0)],
                                 "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")
    # the long-running reader, constructed BEFORE the evolution
    reader = ManifestStreamReader(_table_schema(root), {"path": root})
    assert reader.partitions({"version": 0}, {"version": 1})

    evolved = spark.createDataFrame([(2, "p1", 20.0, "en")],
                                    "k BIGINT, part STRING, v DOUBLE, "
                                    "lang STRING")
    mt.commit_append(spark, root, evolved, "part")
    with pytest.raises(RuntimeError, match="restart the stream"):
        reader.partitions({"version": 1}, {"version": 2})
    # a fresh reader (stream restart) adopts the evolved schema
    df = read_stream_table(spark, root)
    assert "lang" in df.columns


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_replayed_batch_survives_post_evolution_restart(spark, tmp_path):
    """Checkpoint-recovery wedge (r09 advice): Spark replays the last
    WAL-planned batch with its ORIGINAL end offset. If the table evolved
    after that end version, the restarted reader is constructed with the
    NEW schema — the replayed old batch must be DELIVERABLE under it
    (NULL-filling the new column by name), not refused. Refusing wedges
    the stream permanently: every restart rebuilds the same reader and
    re-raises on the same replayed offsets."""
    from silvia_spark.sources.manifest_stream import (ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "p1", 10.0)],
                                 "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")
    evolved = spark.createDataFrame([(2, "p1", 20.0, "en")],
                                    "k BIGINT, part STRING, v DOUBLE, "
                                    "lang STRING")
    mt.commit_append(spark, root, evolved, "part")

    # the post-restart reader: constructed AFTER the evolution, replays
    # the pre-evolution batch (end offset pinned at version 1 by the WAL)
    reader = ManifestStreamReader(_table_schema(root), {"path": root})
    parts = reader.partitions({"version": 0}, {"version": 1})
    assert parts, "replayed pre-evolution batch must still plan"
    batches = list(reader.read(parts[0]))
    import pyarrow as pa

    tbl = pa.Table.from_batches(batches)
    # the old file's rows deliver with lang NULL-filled by name
    assert tbl.column("lang").null_count == tbl.num_rows
    assert tbl.column("k").to_pylist() == [1]
    # and the post-evolution batch delivers normally under the same reader
    parts2 = reader.partitions({"version": 1}, {"version": 2})
    tbl2 = pa.Table.from_batches(
        [b for p in parts2 for b in reader.read(p)])
    assert tbl2.column("lang").to_pylist() == ["en"]


def _mk_table(spark, root, n_files=6, rows_per=4):
    df = spark.createDataFrame(
        [(k, "p1", float(k)) for k in range(n_files * rows_per)],
        "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(df.repartitionByRange(n_files, "k"), root, "part")
    n = len(mt.load_manifest(root)["files"])
    assert n == n_files, f"fixture wrote {n} files, wanted {n_files}"


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_admission_control_walks_bounded_offsets(spark, tmp_path):
    """maxFilesPerTrigger/maxBytesPerTrigger (r09 verdict item 1): a
    version-0 start on a multi-file table must advance the offset at
    most N files per trigger — the first batch of a 100 TB table must
    not be the table. The offset walk is driven directly here (pure
    reader-level, deterministic); engine-level delivery is pinned by
    the tests below."""
    from silvia_spark.sources.manifest_stream import (ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    _mk_table(spark, root, n_files=6)
    b = spark.createDataFrame([(100, "p1", 1.0), (101, "p1", 2.0)],
                              "k BIGINT, part STRING, v DOUBLE")
    mt.commit_append(spark, root, b.repartition(2), "part")  # v2: 2 files

    reader = ManifestStreamReader(
        _table_schema(root), {"path": root, "maxfilespertrigger": "2"})
    offsets = [reader.initialOffset()]
    assert offsets[0] == {"version": 0, "index": 0, "snap": 0}
    for _ in range(10):
        nxt = reader.latestOffset()
        if nxt == offsets[-1]:
            break
        offsets.append(nxt)
        reader.commit(nxt)
    # a version-0 start seeds from the CURRENT snapshot (v2 = all 8
    # files — same content an unlimited start delivers), split 2 per
    # trigger = 4 bounded batches, then stable; snap rides every offset
    assert offsets[1:] == [{"version": 2, "index": 2, "snap": 2},
                           {"version": 2, "index": 4, "snap": 2},
                           {"version": 2, "index": 6, "snap": 2},
                           {"version": 2, "index": 8, "snap": 2}]
    # the planned batches tile the snapshot exactly once
    seen = []
    for s, e in zip(offsets, offsets[1:]):
        batch = [p.path for p in reader.partitions(s, e)]
        assert 0 < len(batch) <= 2
        seen.extend(batch)
    assert len(seen) == len(set(seen)) == 8
    # replay purity: re-planning an old range yields the identical
    # batch, even on a FRESH reader (snap comes from the offset)
    replayer = ManifestStreamReader(
        _table_schema(root), {"path": root, "maxfilespertrigger": "2"})
    again = [p.path for p in replayer.partitions(offsets[1], offsets[2])]
    assert again == seen[2:4]

    # byte budgeting admits at least one file, then stops at the budget
    rb = ManifestStreamReader(
        _table_schema(root), {"path": root, "maxbytespertrigger": "1"})
    rb.initialOffset()
    first = rb.latestOffset()
    assert first == {"version": 2, "index": 1, "snap": 2}, (
        "an over-budget file must still admit exactly one file")


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_admission_control_bounded_batches_end_to_end(spark, tmp_path):
    """Engine-level: a limited stream drains a version-0 snapshot as
    MULTIPLE bounded micro-batches (not one table-sized batch) and
    delivers every row exactly once."""
    root = str(tmp_path / "t")
    _mk_table(spark, root, n_files=6, rows_per=4)

    df = read_stream_table(spark, root, max_files_per_trigger=2)
    q = (df.writeStream.format("memory").queryName("msrc_admission")
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.k for r in spark.table("msrc_admission").collect())
    assert got == list(range(24)), "rows lost or duplicated"
    data_batches = [p for p in q.recentProgress
                    if p["numInputRows"] > 0]
    assert len(data_batches) >= 3, (
        f"6 files at 2/trigger must take >=3 batches, got "
        f"{len(data_batches)}")
    assert all(p["numInputRows"] <= 8 for p in data_batches), (
        "a batch exceeded the 2-file admission bound")


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_admission_control_exactly_once_across_restarts(spark, tmp_path):
    """Checkpointed restarts under admission control: every availableNow
    run resumes from the committed offset AND stays bounded (the
    restart-replay partitions call re-lands the sidecar note before the
    blind latestOffset), and the union across runs is exactly-once."""
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(out)
    _mk_table(spark, root, n_files=6, rows_per=4)

    def one_run():
        q = (read_stream_table(spark, root, max_files_per_trigger=2)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        files = [os.path.join(out, f) for f in os.listdir(out)
                 if f.endswith(".parquet")]
        return (sorted(r.k for r in spark.read.parquet(*files).collect())
                if files else [])

    # availableNow falls back to single-batch execution for Python
    # sources, so each run = one admission-bounded batch of 2 files
    sizes = []
    for _ in range(3):
        before = sizes[-1] if sizes else 0
        sizes.append(len(one_run()))
        assert sizes[-1] - before == 8, (
            f"a restarted run exceeded (or undershot) the 2-file "
            f"admission bound: deliveries {sizes}")
    assert one_run() == list(range(24)), "lost or duplicated rows"


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_stream_timestamp_and_date_partition_columns(spark, tmp_path):
    """r09 verdict item 5: batch read_snapshot always handled
    timestamp-partitioned tables; the streaming source used to raise in
    _cast_partition. A timestamp- (and date-) partitioned table must
    stream end-to-end with the partition values round-tripping exactly
    (including the Hive ':'-escape in dir names, which adoption
    unescapes into the manifest entries)."""
    import datetime

    ts1 = datetime.datetime(1996, 6, 30, 12, 30, 0)
    ts2 = datetime.datetime(1996, 7, 1, 0, 0, 0)
    root = str(tmp_path / "ts")
    df = spark.createDataFrame([(1, ts1, 10.0), (2, ts2, 20.0)],
                               "k BIGINT, hour TIMESTAMP, v DOUBLE")
    mt.create_table(df, root, "hour")
    q = (read_stream_table(spark, root)
         .writeStream.format("memory").queryName("msrc_ts")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    rows = sorted((r.k, r.hour, r.v)
                  for r in spark.table("msrc_ts").collect())
    assert rows == [(1, ts1, 10.0), (2, ts2, 20.0)], rows

    root2 = str(tmp_path / "dt")
    d1 = datetime.date(1996, 6, 30)
    df2 = spark.createDataFrame([(1, d1, 10.0)],
                                "k BIGINT, day DATE, v DOUBLE")
    mt.create_table(df2, root2, "day")
    q2 = (read_stream_table(spark, root2)
          .writeStream.format("memory").queryName("msrc_dt")
          .trigger(availableNow=True).start())
    q2.awaitTermination(60)
    row = spark.table("msrc_dt").collect()[0]
    assert (row.k, row.day, row.v) == (1, d1, 10.0)


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_admission_fresh_start_delivers_snapshot_not_history(spark,
                                                             tmp_path):
    """r10 review finding: a limited version-0 start must deliver the
    SNAPSHOT as of stream start (what unlimited mode delivers), not a
    per-version history replay — on a table with merge history, the
    replay would re-deliver superseded files and resurrect deleted
    rows."""
    import pyarrow as pa

    from silvia_spark.sources.manifest_stream import (ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "p1", 10.0), (2, "p1", 20.0)],
                                 "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")
    # v2 deletes k=2 (rewrites p1's file)
    chg = spark.createDataFrame([(2, "p1", None, "D")],
                                "k BIGINT, part STRING, v DOUBLE, "
                                "op STRING")
    mt.commit_merge(spark, root, chg, ["k", "part"], "part")

    reader = ManifestStreamReader(
        _table_schema(root), {"path": root, "maxfilespertrigger": "1"})
    offsets = [reader.initialOffset()]
    for _ in range(10):
        nxt = reader.latestOffset()
        if nxt == offsets[-1]:
            break
        offsets.append(nxt)
        reader.commit(nxt)
    rows = []
    for s, e in zip(offsets, offsets[1:]):
        for p in reader.partitions(s, e):
            rows.extend(pa.Table.from_batches(
                list(reader.read(p))).column("k").to_pylist())
    assert sorted(rows) == [1], (
        f"limited fresh start delivered {sorted(rows)} — history "
        "replay resurrected deleted/superseded rows")


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_consumed_offsets_need_no_retired_manifests(spark, tmp_path):
    """r10 review finding: normalizing an already-consumed version-only
    offset (unlimited checkpoint restarted with maxFilesPerTrigger)
    must not load that version's file list — its parent manifest may be
    vacuum-retired on a caught-up table."""
    from silvia_spark.sources.manifest_stream import (_CONSUMED,
                                                      ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "p1", 10.0)],
                                 "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")
    for k in (2, 3):
        mt.commit_append(spark, root, spark.createDataFrame(
            [(k, "p1", float(k))], "k BIGINT, part STRING, v DOUBLE"),
            "part")
    mt.vacuum(root, keep_versions=1)  # manifests v1, v2 retired
    assert not os.path.exists(mt._manifest_path(root, 2))

    reader = ManifestStreamReader(
        _table_schema(root), {"path": root, "maxfilespertrigger": "1"})
    reader.commit({"version": 3})          # unlimited-run offset
    assert reader._pos == (3, _CONSUMED)   # no manifest read happened
    # the replayed batch with version-only offsets plans empty, and the
    # caught-up walk stays put — still without touching v1/v2
    assert reader.partitions({"version": 3}, {"version": 3}) == []
    assert reader.latestOffset() == {"version": 3, "index": _CONSUMED,
                                     "snap": 0}
    # new commits resume bounded diff delivery from there
    mt.commit_append(spark, root, spark.createDataFrame(
        [(4, "p1", 4.0)], "k BIGINT, part STRING, v DOUBLE"), "part")
    nxt = reader.latestOffset()
    assert nxt == {"version": 4, "index": 1, "snap": 0}
    parts = reader.partitions({"version": 3, "index": _CONSUMED,
                               "snap": 0}, nxt)
    assert len(parts) == 1


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_unlimited_reader_accepts_indexed_offsets(spark, tmp_path):
    """r10 review finding: removing maxFilesPerTrigger from a query
    whose checkpoint holds index-bearing offsets must not wedge the
    stream (the note path used to exist only on limited readers —
    AttributeError on replay)."""
    from silvia_spark.sources.manifest_stream import (ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "p1", 10.0), (2, "p1", 20.0)],
                                 "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base.repartition(2), root, "part")
    reader = ManifestStreamReader(_table_schema(root), {"path": root})
    # replayed WAL batch written by a limited run of the same query
    parts = reader.partitions(
        {"version": 1, "index": 1, "snap": 1},
        {"version": 1, "index": 2, "snap": 1})
    assert len(parts) == 1
    # and the equal-offset replay (restart protocol) is a clean no-op
    assert reader.partitions(
        {"version": 1, "index": 2, "snap": 1},
        {"version": 1, "index": 2, "snap": 1}) == []


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_restart_snap_pollution_cannot_blank_diffs(spark, tmp_path):
    """r10 advice (MEDIUM): on a note-less blind restart, latestOffset
    re-seeds snap to the CURRENT version; if partitions adopted that
    polluted END snap, FL(v) for undelivered diff versions would blank
    (row loss) and the full snapshot would re-deliver at the new snap
    (duplication). The checkpointed START offset's snap is the lineage
    truth and PINS the seed now."""
    import pyarrow as pa

    from silvia_spark.sources.manifest_stream import (_CONSUMED,
                                                      ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "p1", 1.0), (2, "p1", 2.0)],
                                 "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")  # v1: the lineage's snap seed
    for k in (3, 4):                     # v2, v3: undelivered diffs
        mt.commit_append(spark, root, spark.createDataFrame(
            [(k, "p1", float(k))], "k BIGINT, part STRING, v DOUBLE"),
            "part")

    # lineage truth: seeded at snap=1, snapshot fully consumed;
    # versions 2..3 not yet delivered
    committed = {"version": 1, "index": _CONSUMED, "snap": 1}
    # a restarted reader whose note was lost: the blind latestOffset
    # re-seeds snap to the current version (3) before any replay call
    reader = ManifestStreamReader(
        _table_schema(root), {"path": root,
                              "maxfilespertrigger": "100"})
    polluted = reader.latestOffset()
    assert polluted["snap"] == 3  # the blind re-seed did happen
    rows = []
    for p in reader.partitions(committed, polluted):
        rows.extend(pa.Table.from_batches(
            list(reader.read(p))).column("k").to_pylist())
    # with the polluted snap adopted this delivered [1, 2, 3, 4] (full
    # snapshot re-delivery + nothing for v2/v3 diffs); the pinned
    # lineage snap delivers exactly the undelivered diffs
    assert sorted(rows) == [3, 4], (
        f"start-offset snap not honored: delivered {sorted(rows)}")


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_stream_applies_delete_vectors(spark, tmp_path):
    """L21 × L16: a delivered file carries only its rows LIVE at the
    delivered version — the per-file Arrow read masks the entry's
    delete-vector positions out. A version-0 start after a DV delete
    must deliver the post-delete snapshot, never resurrect tombstoned
    rows; replay re-applies the identical (immutable) vector."""
    import pyarrow as pa

    from silvia_spark.sources.manifest_stream import (ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, "p1", float(i)) for i in range(20)],
        "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part", stats_cols=["k"])
    keys = spark.createDataFrame([(4, "p1"), (11, "p1")],
                                 "k BIGINT, part STRING")
    mt.commit_delete(spark, root, keys, ["k", "part"], "part")
    assert any(e.get("dv")
               for e in mt.load_manifest(root)["files"])  # DV path taken

    reader = ManifestStreamReader(_table_schema(root), {"path": root})
    rows = []
    for p in reader.partitions({"version": 0}, {"version": 2}):
        rows.extend(pa.Table.from_batches(
            list(reader.read(p))).column("k").to_pylist())
    assert sorted(rows) == sorted(set(range(20)) - {4, 11}), (
        f"stream delivered {sorted(rows)} — tombstoned rows resurrected "
        "or live rows lost")


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_vacuum_respects_paused_stream_lease(spark, tmp_path):
    """r10 verdict item 6: a checkpointed stream paused at version k
    must resume correctly after vacuum — the reader's retention lease
    (written at every batch commit) pins the manifests it needs, so an
    aggressive keep_versions=1 expiration WIDENS retention instead of
    stranding the reader. With respect_readers=False (or a dead lease)
    the plain window applies and the manifests retire."""
    root = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    mt.create_table(spark.createDataFrame(
        [(1, "p1", 1.0)], "k BIGINT, part STRING, v DOUBLE"),
        root, "part")                                      # v1
    mt.commit_append(spark, root, spark.createDataFrame(
        [(2, "p1", 2.0)], "k BIGINT, part STRING, v DOUBLE"),
        "part")                                            # v2
    # run 1: consume v1..v2, checkpoint, stop (pause)
    run1 = _run_available_now(spark, root, out, ckpt)
    assert sorted(r.k for r in run1.collect()) == [1, 2]
    lease_dir = os.path.join(root, ".stream_admission")
    leases = [f for f in os.listdir(lease_dir)
              if f.startswith("lease-")]
    assert leases, "commit() wrote no retention lease"

    # table advances while the stream sleeps
    for k in (3, 4, 5):
        mt.commit_append(spark, root, spark.createDataFrame(
            [(k, "p1", float(k))], "k BIGINT, part STRING, v DOUBLE"),
            "part")                                        # v3..v5
    # aggressive expiration: the live lease at v2 pins manifests >= 2
    mt.vacuum(root, keep_versions=1)
    assert os.path.exists(mt._manifest_path(root, 2)), (
        "vacuum retired the paused reader's committed version")
    # resume: exactly the missed commits arrive, no gap, no re-delivery
    run2 = _run_available_now(spark, root, out, ckpt)
    assert sorted(r.k for r in run2.collect()) == [3, 4, 5]

    # a DEAD lease (older than the reader TTL) stops pinning
    import time as _t

    for f in os.listdir(lease_dir):
        if f.startswith("lease-"):
            old = _t.time() - mt._READER_LEASE_TTL_SEC - 10
            os.utime(os.path.join(lease_dir, f), (old, old))
    mt.vacuum(root, keep_versions=1)
    assert not os.path.exists(mt._manifest_path(root, 2))
    assert not any(f.startswith("lease-")
                   for f in os.listdir(lease_dir)), (
        "dead lease sidecar not swept")


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_lease_semantics_r11_review(spark, tmp_path):
    """Three r11 review findings on the retention lease, pinned:
    (1) OFF-BY-ONE — a limited-mode stream resuming at a mid-version
    offset recomputes FL(v) as the diff from v-1, so vacuum must keep
    the PARENT manifest of the least lease version too; (2) PER-READER
    IDENTITY — two checkpoints with identical options must pin
    retention independently (a shared monotonic-max lease let the
    leading stream unpin the lagging one); (3) QUIET-TABLE liveness —
    latestOffset refreshes the lease mtime even when no batch plans."""
    import time as _t

    from silvia_spark.sources.manifest_stream import (ManifestStreamReader,
                                                      _table_schema)

    root = str(tmp_path / "t")
    mt.create_table(spark.createDataFrame(
        [(1, "p1", 1.0)], "k BIGINT, part STRING, v DOUBLE"),
        root, "part")
    for k in (2, 3, 4, 5):
        mt.commit_append(spark, root, spark.createDataFrame(
            [(k, "p1", float(k))], "k BIGINT, part STRING, v DOUBLE"),
            "part")                                      # v2..v5

    # (2) two independent readers, identical options: each pins its own
    ra = ManifestStreamReader(_table_schema(root), {"path": root})
    rb = ManifestStreamReader(_table_schema(root), {"path": root})
    ra.partitions({"version": 4}, {"version": 5})   # A committed at v4
    rb.partitions({"version": 3}, {"version": 3})   # B paused at v3
    lease_dir = os.path.join(root, ".stream_admission")
    assert len([f for f in os.listdir(lease_dir)
                if f.startswith("lease-")]) == 2, (
        "identical-option readers shared one lease file")
    mt.vacuum(root, keep_versions=1)
    # (1) + (2): B's lease (v3) pins v2 as well — FL(3) needs v2
    assert os.path.exists(mt._manifest_path(root, 2)), (
        "parent manifest of the least lease version retired (off-by-"
        "one) or the lagging reader's pin was overridden")
    # B can still plan its next limited batch (needs FL diffs from v3)
    rb2 = ManifestStreamReader(
        _table_schema(root), {"path": root, "maxfilespertrigger": "1"})
    parts = rb2.partitions({"version": 3, "index": 1 << 62, "snap": 0},
                           {"version": 5, "index": 1 << 62, "snap": 0})
    assert len(parts) == 2  # v4 + v5 diffs, resolvable post-vacuum

    # (3) liveness from latestOffset alone: age every lease near-dead,
    # call latestOffset on a QUIET table, and the touched lease must be
    # young again
    my_lease = ra._lease_path()
    old = _t.time() - mt._READER_LEASE_TTL_SEC + 5
    os.utime(my_lease, (old, old))
    ra.latestOffset()
    assert _t.time() - os.path.getmtime(my_lease) < 60, (
        "latestOffset did not refresh lease liveness on a quiet table")
