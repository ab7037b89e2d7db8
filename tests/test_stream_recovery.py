"""Streaming crash-recovery evidence — SURVEY §3 EP3 made executable.

Every prior streaming test proved cadence invariance WITHIN one query
run. These kill the query between (or during) micro-batches and restart
a NEW query object from the same checkpoint:

- the file-source offset log must not re-read drained files,
- stateful operator state (dropDuplicates) must be restored from the
  state store, deduping across the restart boundary,
- the exactly-once sinks (file-sink manifest log, keyed PG merge) must
  land the same final state the uninterrupted run produces — including
  when the PostgreSQL server itself dies mid-batch and the failed batch
  replays after a server reboot.

CI-mode only (`full` marker): each test runs 2-4 real streaming jobs.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from silvia_spark import pg as pglib

pytestmark = [pytest.mark.slow, pytest.mark.full]

SCHEMA = "id BIGINT, event_type STRING"


def _add_file(spark, src_dir: str, name: str, rows) -> None:
    """Land one parquet file atomically in the stream source dir (write
    to a scratch dir, move the part file in under a stable name — the
    arrival protocol every file-watching ingest uses)."""
    scratch = tempfile.mkdtemp(prefix="silvia_arrival_")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(scratch)
    part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
    os.makedirs(src_dir, exist_ok=True)
    os.rename(os.path.join(scratch, part), os.path.join(src_dir, name))
    shutil.rmtree(scratch, ignore_errors=True)


def _dedup_query(spark, src: str, sink: str, ckpt: str):
    return (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1").parquet(src)
            .dropDuplicates(["id"])
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start())


def test_dedup_stream_restart_continues_from_checkpoint(spark, tmp_path):
    """Stop the dedup stream mid-source (only half the files have
    arrived), restart the SAME checkpoint after the rest land: the final
    sink must equal the uninterrupted run — no re-read of drained files,
    dedup state restored so duplicates ACROSS the restart boundary are
    still suppressed, file-sink log keeps appends exactly-once."""
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    _add_file(spark, src, "f1.parquet",
              [(i, "click") for i in range(0, 50)])
    _add_file(spark, src, "f2.parquet",
              [(i, "view") for i in range(25, 75)])  # 25-49 duplicate f1
    q = _dedup_query(spark, src, sink, ckpt)
    q.awaitTermination(300)
    phase1 = spark.read.schema(SCHEMA).parquet(sink).count()
    assert phase1 == 75  # 0..74 distinct

    # ...crash window: the query object is gone; new files arrive...
    _add_file(spark, src, "f3.parquet",
              [(i, "error") for i in range(50, 100)])  # 50-74 dup f2
    _add_file(spark, src, "f4.parquet",
              [(i, "click") for i in range(150, 200)])
    q2 = _dedup_query(spark, src, sink, ckpt)
    q2.awaitTermination(300)

    out = spark.read.schema(SCHEMA).parquet(sink)
    ids = sorted(r.id for r in out.collect())
    assert ids == list(range(0, 100)) + list(range(150, 200))  # no dups:
    # 25-49 deduped inside phase 1, 50-74 deduped ACROSS the restart


@pytest.fixture()
def pg_root():
    if not pglib.have_server_binaries():
        pytest.skip("no usable PostgreSQL server binaries in this container")
    root = tempfile.mkdtemp(prefix="silvia_pg_rec_", dir="/tmp")
    pglib.boot_server(root)
    try:
        yield root
    finally:
        pglib._run_as_pg(
            f"{pglib.PG_BIN}/pg_ctl -D {root}/data -m fast stop")
        shutil.rmtree(root, ignore_errors=True)


def _pg_stream(spark, src: str, ckpt: str, upsert):
    return (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1").parquet(src)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start())


def _totals(root: str, table: str, run_id: str) -> dict[str, int]:
    got: dict[str, int] = {}
    for _, t, c in pglib.read_upsert_table(root, table, run_id=run_id):
        got[t] = got.get(t, 0) + c
    return got


def test_pg_upsert_survives_stream_restart_exactly_once(spark, tmp_path,
                                                        pg_root):
    """I9's sink across a stream restart: phase 1 drains two files into
    PG, the query dies, two more files arrive, a new query resumes the
    checkpoint — the table must hold every event exactly once."""
    from silvia_spark.streaming.streams import pg_upsert_factory

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _add_file(spark, src, "f1.parquet",
              [(i, "click") for i in range(100)])
    _add_file(spark, src, "f2.parquet",
              [(i, "view") for i in range(40)])
    upsert = pg_upsert_factory(pg_root, "restart_t", run_id="r1")
    q = _pg_stream(spark, src, ckpt, upsert)
    q.awaitTermination(300)
    assert _totals(pg_root, "restart_t", "r1") == {"click": 100, "view": 40}

    _add_file(spark, src, "f3.parquet",
              [(i, "click") for i in range(7)])
    _add_file(spark, src, "f4.parquet",
              [(i, "error") for i in range(13)])
    q2 = _pg_stream(spark, src, ckpt, upsert)
    q2.awaitTermination(300)
    assert _totals(pg_root, "restart_t", "r1") == {
        "click": 107, "view": 40, "error": 13}


def test_pg_server_death_mid_batch_replays_exactly_once(spark, tmp_path,
                                                        pg_root):
    """Kill the PostgreSQL server BETWEEN micro-batches (before batch 1's
    merge lands): the upsert fails, the query dies with the batch
    uncommitted. Reboot the server, restart the query from the same
    checkpoint: batch 1 replays, batch 0 does NOT double — the keyed
    merge is the idempotence mechanism the replay rides."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from silvia_spark.streaming.streams import pg_upsert_factory

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _add_file(spark, src, "f1.parquet",
              [(i, "click") for i in range(30)])
    _add_file(spark, src, "f2.parquet",
              [(i, "view") for i in range(20)])
    real_upsert = pg_upsert_factory(pg_root, "chaos_t", run_id="r1")
    seen: list[int] = []

    def chaos_upsert(batch_df, batch_id):
        seen.append(batch_id)
        if batch_id == 1:
            pglib._run_as_pg(
                f"{pglib.PG_BIN}/pg_ctl -D {pg_root}/data -m fast stop")
        real_upsert(batch_df, batch_id)

    q = _pg_stream(spark, src, ckpt, chaos_upsert)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(300)
    assert 1 in seen  # the kill really happened mid-run

    pglib.boot_server(pg_root)  # ops recovery: same data dir reboots
    assert _totals(pg_root, "chaos_t", "r1") == {"click": 30}  # batch 0
    q2 = _pg_stream(spark, src, ckpt, real_upsert)
    q2.awaitTermination(300)
    assert _totals(pg_root, "chaos_t", "r1") == {"click": 30, "view": 20}
