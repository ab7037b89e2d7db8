"""Live Structured Streaming variants — SURVEY.md §2.I (+A7).

Each contract here actually runs an incremental query: readStream over the
events parquet (or a rate source), trigger(availableNow=True), memory sink,
then returns the materialized result. These are the rows-only proofs that
the batch-twin logic (batch_twins.py, hash-checked) executes identically
under IncrementalExecution with watermark-bounded state.

Checkpoints go to fresh temp dirs — in production they'd be durable paths,
the crash-recovery boundary (SURVEY §3 entry point 3).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, LongType, StructField,
                               StructType)
from pyspark.sql.window import Window

from silvia_spark.registry import contract
from silvia_spark.io import _sniff_events_ts_unit
from silvia_spark.schemas import EVENTS, EVENTS_RAW
from silvia_spark.sources import source


# Extra reader options merged into every file-source build — the trigger-
# cadence control surface. tests/test_stream_equivalence.py sets
# {"maxFilesPerTrigger": "1"} over a multi-part events dir to force several
# micro-batches and assert the final state is bit-identical to the
# single-batch availableNow run (the cadence-invariance property all the
# rows-only live contracts stand on). Production would set the same option
# (or Kafka's maxOffsetsPerTrigger) for backpressure.
SOURCE_OPTIONS: dict[str, str] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet with the ts-unit normalization
    applied identically to the batch loader (ns corpora get the §1.2
    long-div rebuild; µs corpora read directly). Built through the
    source factory (sources/factory.py) — the production entry would be
    ``source(spark, "kafka", ...)`` with the same downstream plan."""
    if _sniff_events_ts_unit(sf_dir) == "ns":
        raw = source(spark, "file", path=f"{sf_dir}/events.parquet",
                     schema=EVENTS_RAW, **SOURCE_OPTIONS)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp")
        )
    raw = source(spark, "file", path=f"{sf_dir}/events.parquet",
                 schema=EVENTS, **SOURCE_OPTIONS)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(df: DataFrame, spark: SparkSession,
                   output_mode: str = "append") -> DataFrame:
    """Execute a streaming frame to completion into a memory sink."""
    name = "m" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="silvia_ckpt_")
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return df.sparkSession.table(name)


# --- A7: rate-source smoke ---------------------------------------------------

# rate-micro-batch is fully deterministic arithmetic: under availableNow the
# query plans exactly one micro-batch (batch 0: values 0..rowsPerBatch-1, all
# stamped startTimestamp=0) — verified stable across runs. The oracle redoes
# that arithmetic with generate_series: ts_ms(v) = (v // rowsPerBatch) ·
# advanceMillisPerBatch, windowed to 10 s buckets.
_A7_ORACLE = """
WITH r AS (
  SELECT v, (v // 100) * 1000 AS ts_ms FROM generate_series(0, 99) t(v)
)
SELECT CAST(epoch_ms(ts_ms - ts_ms % 10000) AS TIMESTAMP) AS wstart,
       count(*) AS cnt, max(v) AS max_value
FROM r GROUP BY 1 ORDER BY wstart
"""


@contract("source_rate_stream", oracle=_A7_ORACLE)
def source_rate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming smoke on the rate-micro-batch source (deterministic rows per
    batch) → 10-second tumbling count. Proves the source factory's
    non-file path without Kafka; hash-checked because the source IS
    arithmetic (see _A7_ORACLE)."""
    stream = source(spark, "rate")
    agg = (
        stream.groupBy(F.window("timestamp", "10 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("value").alias("max_value"))
        .select(F.col("w.start").alias("wstart"), "cnt", "max_value")
    )
    out = _run_to_memory(agg, spark, output_mode="complete")
    return (out.select(F.col("wstart").cast("timestamp_ntz").alias("wstart"),
                       "cnt", "max_value")
            .orderBy("wstart"))


# --- I1 live: tumbling window under watermark --------------------------------


@contract("stream_tumbling_live")  # rows-only: live twin of stream_tumbling_1h
def stream_tumbling_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("wstart"), "event_type", "cnt")
    )
    return _run_to_memory(agg, spark).orderBy("wstart", "event_type")


# --- I4: watermark late-data drop --------------------------------------------

# Append-mode watermark semantics ARE SQL-expressible for an availableNow
# replay: all rows arrive in one batch (nothing is dropped as late), the final
# watermark settles at max(ts) - delay, and only windows CLOSED by it
# (window_end <= watermark) are emitted — trailing open windows are withheld.
# The oracle replicates exactly that cutoff, so the hash check pins the
# watermark/window-close semantics, not just the counts.
#
# Two environmental assumptions behind that cutoff, both pinned:
# - The final EMPTY micro-batch must run to advance the watermark and flush
#   closed windows — spark.sql.streaming.noDataMicroBatches.enabled=true
#   (Spark's default, force-set in session.RUNTIME_CONFS: if off, the
#   availableNow run emits nothing and this oracle mismatches confusingly).
# - Spark truncates the watermark to whole milliseconds; the oracle's
#   `wend <= max(ts) - delay` comparison matches only while no window end
#   falls strictly inside the sub-millisecond truncation gap. Hour-aligned
#   windows on microsecond timestamps keep that distance ≥ minutes here.
_I4_ORACLE = """
WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart,
       count(*) AS survivors
FROM events
GROUP BY 1
HAVING wstart + INTERVAL '1 hour' <= (SELECT w FROM wm)
ORDER BY wstart
"""


@contract("stream_watermark_late", oracle=_I4_ORACLE)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-min watermark before a windowed count, append mode: in availableNow
    replay of a single file all rows arrive in one batch (nothing is late);
    the final watermark = max(ts) - 10 min emits every window it closes and
    withholds the trailing open one(s) — the exact cutoff _I4_ORACLE
    replays. With a live out-of-order source, rows >10 min behind max(ts)
    would additionally be dropped from closed windows."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("survivors"))
        .select(F.col("w.start").alias("wstart"), "survivors")
    )
    out = _run_to_memory(agg, spark)
    return (out.select(F.col("wstart").cast("timestamp_ntz").alias("wstart"),
                       "survivors")
            .orderBy("wstart"))


# --- I3 live: session_window -------------------------------------------------


@contract("stream_session_live")  # rows-only: live twin of stream_session_30m
def stream_session_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming sessionization: session_window merges events <30 min
    apart per user — state is (user, open-session) only, closed by the
    watermark; contrast with the batch twin's full-sort lag/cumsum."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"), "n_events")
    )
    return _run_to_memory(agg, spark).orderBy("user_id", "session_start")


# --- I5 live: dedup within watermark -----------------------------------------


@contract("stream_dedup_live")  # rows-only: live twin of stream_dedup_exact
def stream_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: dedup state for event_id is evicted
    once the watermark passes — bounded memory under at-least-once
    redelivery, unlike plain dropDuplicates whose state grows forever."""
    ev = _events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    out = _run_to_memory(deduped, spark)
    return (out.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("event_type"))


# --- I6 live: arbitrary stateful funnel --------------------------------------

_FUNNEL_STATE = StructType([StructField("stage", IntegerType())])
_FUNNEL_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("funnel_stage", IntegerType()),
])


def _funnel_fn(key, pdf_iter, state):
    """GroupState per user: advance view(1)→click(2)→purchase(3) in event-time
    order within the arriving batches. Vectorized: per batch, one numpy
    nonzero scan per remaining stage (≤ 3 total) replaces the per-event
    Python loop — "find the first stage+1 event after where stage was
    reached" is a masked scan, and stage depth, not event count, bounds
    the Python-level iteration."""
    import numpy as np
    import pandas as pd

    stage = state.get[0] if state.exists else 0
    rank = {"view": 1, "click": 2, "purchase": 3}
    for pdf in pdf_iter:
        if stage >= 3:
            continue  # drain the iterator; state can no longer advance
        r = (pdf.sort_values("ts")["event_type"]
             .map(rank).fillna(0).astype("int64").to_numpy())
        start = 0
        for want in range(stage + 1, 4):
            hits = np.nonzero(r[start:] == want)[0]
            if hits.size == 0:
                break
            start += hits[0] + 1
            stage = want
    state.update((stage,))
    yield pd.DataFrame({"user_id": [key[0]], "funnel_stage": [stage]})


@contract("stream_funnel_live")  # rows-only: arbitrary stateful op
def stream_funnel_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState funnel: per-user GroupState advanced by
    event-time-ordered arrivals. Arrow-batched; state is one int per user.
    The batch twin (stream_stateful_funnel) is the hash-checked semantics;
    this proves the arbitrary-stateful plumbing. Update-mode emissions are
    per-batch snapshots; with availableNow's single batch the final table
    is one row per user."""
    ev = _events_stream(spark, sf_dir).select("user_id", "ts", "event_type")
    result = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn, outputStructType=_FUNNEL_OUT,
            stateStructType=_FUNNEL_STATE,
            outputMode="update", timeoutConf="NoTimeout",
        )
    )
    out = _run_to_memory(result, spark, output_mode="update")
    return (out.groupBy("user_id")
            .agg(F.max("funnel_stage").alias("funnel_stage"))
            .orderBy("user_id"))


# --- I7 live: stream-static enrichment ---------------------------------------


@contract("stream_static_join_live")  # rows-only: live twin of stream_static_join
def stream_static_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from silvia_spark.io import load_table
    ev = _events_stream(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        ev.join(F.broadcast(nation),
                (F.col("user_id") % 25) == F.col("n_nationkey"))
        .select("event_id", "n_name")
    )
    out = _run_to_memory(joined, spark)
    return (out.groupBy("n_name").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("n_name"))


# --- I8 live: stream-stream interval join ------------------------------------


@contract("stream_stream_join_live")  # rows-only: live twin of stream_stream_join
def stream_stream_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides watermarked; the time-range condition lets Spark bound each
    side's join state to the interval width plus watermark delay."""
    p = (_events_stream(spark, sf_dir)
         .where(F.col("event_type") == "purchase")
         .withWatermark("ts", "20 minutes")
         .select("user_id", F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts")))
    c = (_events_stream(spark, sf_dir)
         .where(F.col("event_type") == "click")
         .withWatermark("ts", "20 minutes")
         .select(F.col("user_id").alias("c_user"),
                 F.col("event_id").alias("click_id"),
                 F.col("ts").alias("c_ts")))
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("user_id", "purchase_id", "click_id")
    out = _run_to_memory(joined, spark)
    return out.orderBy("user_id", "purchase_id", "click_id")


# --- I9: foreachBatch idempotent upsert --------------------------------------


def parquet_upsert_factory(out_dir: str):
    """The offline upsert: dynamic partition-overwrite keyed by batch_id —
    re-running a batch replaces its own partition, never duplicates
    (tests/test_pg_sink.py replays a batch to prove it)."""
    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        agg = (batch_df.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("cnt")))
        (agg.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(out_dir))
    return upsert


def pg_upsert_factory(host: str, table: str, run_id: str = ""):
    """The live-PostgreSQL upsert: per-batch staged COPY + INSERT ... ON
    CONFLICT DO UPDATE keyed (run_id, batch_id, event_type) — the
    production merge, executed against a real server (silvia_spark/pg.py).
    ``run_id`` isolates this run's rows inside a shared caller-named
    table; replays of a batch within the run stay idempotent."""
    from silvia_spark import pg

    pg.ensure_upsert_table(host, table)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        agg = (batch_df.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("cnt")))
        rows = [(int(batch_id), r["event_type"], int(r["cnt"]))
                for r in agg.collect()]
        pg.copy_upsert(host, table, rows, run_id=run_id)
    return upsert


_I9_ORACLE = """
SELECT event_type, count(*) AS cnt
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("stream_foreachbatch_upsert", oracle=_I9_ORACLE)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """silvia's load stage: per-micro-batch upsert keyed on event_type.

    The PostgreSQL host resolves via pg.resolve_host(): $SILVIA_PG_HOST
    when set (production points it at the warehouse), else an auto-booted
    embedded singleton when the container ships server binaries — so on
    this box the DEFAULT run stages + merges every micro-batch via
    INSERT ... ON CONFLICT into a real server and reads the result back
    FROM the database (the sink round-trip is part of the contract).
    Only when no server is possible does it degrade to an idempotent
    parquet overwrite keyed by batch. Both paths share the exactly-once
    property: re-running a batch replaces, never duplicates (proven by
    replay in tests/test_pg_sink.py) — and both readbacks reduce to the
    same per-type totals, which is why this contract carries a full
    hash oracle even though the sink is a side effect: the oracle is
    path-independent, so the driver hash now proves the whole
    stage→merge→readback loop instead of recording rows-only."""
    ev = _events_stream(spark, sf_dir)
    from silvia_spark import pg
    host = pg.resolve_host()
    if host:
        table = os.environ.get("SILVIA_PG_TABLE")
        auto_table = table is None
        run_id = uuid.uuid4().hex[:12]
        if auto_table:
            table = "event_summary_" + run_id
            # Our own per-run table: a leftover of the same name can only
            # be a uuid collision with a crashed run — safe to reset.
            pg.run_psql(host, f"DROP TABLE IF EXISTS {table};")
        # A caller-named table ($SILVIA_PG_TABLE → possibly a real
        # warehouse table) is NEVER dropped: the merge and the readback
        # are scoped to this run's run_id instead, so pre-existing rows
        # and concurrent runs survive while this run's result stays
        # isolated. Replays of a batch WITHIN the run remain idempotent
        # via the (run_id, batch_id, event_type) merge key.
        upsert = pg_upsert_factory(host, table, run_id=run_id)
    else:
        out_dir = os.path.join(tempfile.mkdtemp(prefix="silvia_upsert_"),
                               "tbl")
        upsert = parquet_upsert_factory(out_dir)

    ckpt = tempfile.mkdtemp(prefix="silvia_ckpt_")
    try:
        q = (ev.writeStream.foreachBatch(upsert)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(300)
        if host:
            back = spark.createDataFrame(
                [(t, c) for _, t, c in
                 pg.read_upsert_table(host, table, run_id=run_id)],
                "event_type string, cnt long")
        else:
            back = spark.read.parquet(out_dir)
    finally:
        # auto-named tables must not strand on the long-lived singleton
        # when the stream or readback fails mid-run
        if host and auto_table:
            pg.run_psql(host, f"DROP TABLE IF EXISTS {table};")
    return (back.groupBy("event_type")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy("event_type"))


# --- L12: exactly-once streaming ingestion into a manifest table -------------

_L12_ORACLE = """
SELECT event_type, count(*) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       (sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0) AS val_sum
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("stream_manifest_sink", oracle=_L12_ORACLE)
def stream_manifest_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion into the snapshot-manifest table (L11's layer)
    with exactly-once semantics end to end: each micro-batch lands as ONE
    append-only manifest commit (commit_append — O(batch) staged files +
    a pointer flip, no partition rewrite), carrying a (query-id,
    batch_id) transaction record. A batch re-delivered after a crash
    between the table commit and the checkpoint write is recognized by
    its recorded txn and skipped — Delta's txnAppId idempotence, proven
    by replay in tests/test_manifest_table.py. The readback aggregates
    the final snapshot through the manifest, so the driver hash proves
    the whole stream→commit→snapshot-read loop against the batch oracle."""
    from silvia_spark.operators.manifest_table import (commit_append,
                                                       read_snapshot)
    from silvia_spark.functions.numeric import dsum

    ev = _events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value")
    root = os.path.join(tempfile.mkdtemp(prefix="silvia_mtsink_"), "tbl")
    app = "ingest-" + uuid.uuid4().hex[:8]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        commit_append(spark, root, batch_df, "event_type",
                      txn=(app, int(batch_id)))

    ckpt = tempfile.mkdtemp(prefix="silvia_ckpt_")
    q = (ev.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    return (read_snapshot(spark, root)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("event_id").alias("id_sum"),
                 dsum("value", "val_sum"))
            .orderBy("event_type"))


# --- I10 live: transformWithStateInPandas (Spark 4 stateful API) -------------


class _CountProcessor:
    """ValueState per user: running event count + max value seen. The
    modern replacement for applyInPandasWithState — explicit typed state
    handles, per-batch iterators, timers. State is two scalars per user."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (DoubleType, LongType, StructField,
                                       StructType)
        self._count = handle.getValueState(
            "cnt", StructType([StructField("c", LongType())]))
        self._maxv = handle.getValueState(
            "mx", StructType([StructField("m", DoubleType())]))

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd
        c = self._count.get()[0] if self._count.exists() else 0
        m = self._maxv.get()[0] if self._maxv.exists() else float("-inf")
        for pdf in rows:
            c += len(pdf)
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        self._count.update((c,))
        self._maxv.update((m,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [c],
                            "max_value": [m]})

    def close(self) -> None:
        pass


def _tws_available() -> bool:
    """transformWithStateInPandas spawns a protobuf-based state-server in
    every Python worker; this container has NO installed google.protobuf,
    which crashes the runner at query start. Gate on the actual import the
    runner performs. The gate opens when tools/tws_shim/sitecustomize.py is
    active (PYTHONPATH + SILVIA_TWS_PB_SHIM=1): it exposes the modern
    protobuf bundled with the locally-installed Cloud SDK to driver AND
    workers — tests/test_stream_equivalence.py proves the real TWS path
    there and pins its output to the fallback's."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


_CWS_STATE = StructType([StructField("c", LongType()),
                         StructField("m", DoubleType())])


@contract("stream_transform_with_state")  # rows-only: arbitrary stateful op
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, max value·100 as int) — written for
    transformWithStateInPandas, Spark 4's arbitrary-stateful API (typed
    ValueState handles, the successor to stream_funnel_live's
    applyInPandasWithState). ENVIRONMENT GATE: the TWS runner needs a
    working protobuf, absent from this container's site-packages
    (_tws_available), so the same per-user state program runs through
    applyInPandasWithState when TWS can't initialize — identical state
    semantics (one (count, max) record per user), identical output. The
    TWS path is taken wherever protobuf exists — including under the
    tools/tws_shim probe, where test_stream_equivalence.py executes it for
    real (RocksDB state store) and asserts bit-identical output vs the
    fallback. With availableNow's single batch the final table is one
    snapshot per user."""
    ev = _events_stream(spark, sf_dir).where(F.col("user_id") < 40).select(
        "user_id", "value")
    out_schema = "user_id LONG, n_events LONG, max_value DOUBLE"
    if _tws_available():
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        # TWS keeps each typed state handle in its own column family, which
        # the default HDFSBackedStateStoreProvider rejects — RocksDB is the
        # supported provider (and the right one at scale: sorted CF scans,
        # incremental snapshots). Session-scoped conf, restored after.
        _prov_key = "spark.sql.streaming.stateStore.providerClass"
        _prev_prov = spark.conf.get(_prov_key, None)
        spark.conf.set(_prov_key, "org.apache.spark.sql.execution.streaming."
                                  "state.RocksDBStateStoreProvider")
        proc = type("CountProc", (StatefulProcessor,),
                    dict(_CountProcessor.__dict__))()
        result = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        try:
            out = _run_to_memory(result, spark, output_mode="update")
        finally:
            if _prev_prov is None:
                spark.conf.unset(_prov_key)
            else:
                spark.conf.set(_prov_key, _prev_prov)
        return (out.groupBy("user_id")
                .agg(F.max("n_events").alias("n_events"),
                     F.max("max_value").alias("max_value"))
                .orderBy("user_id"))
    else:
        def count_fn(key, pdf_iter, state):
            # Raw-double state so this path and the TWS path emit bit-identical
            # max_value (events.value has >2dp rows; rounding here diverged).
            import pandas as pd
            c, m = (state.get if state.exists else (0, float("-inf")))
            for pdf in pdf_iter:
                c += len(pdf)
                if len(pdf):
                    m = max(m, float(pdf["value"].max()))
            state.update((c, m))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [c],
                                "max_value": [m]})

        result = ev.groupBy("user_id").applyInPandasWithState(
            count_fn, outputStructType=out_schema,
            stateStructType=_CWS_STATE,
            outputMode="update", timeoutConf="NoTimeout",
        )
    out = _run_to_memory(result, spark, output_mode="update")
    return (out.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("max_value").alias("max_value"))
            .orderBy("user_id"))


# --- I11 live: running integer moments via arbitrary state --------------------

_MOMENTS_STATE = StructType([
    StructField("n", LongType()),
    StructField("s1", LongType()),
    StructField("s2", LongType()),
])
_MOMENTS_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n", LongType()),
    StructField("s1", LongType()),
    StructField("s2", LongType()),
])


def _moments_fn(key, pdf_iter, state):
    """GroupState per user: exact integer moment accumulation. The grid
    values are summed with numpy int64 (exact, no float path); because
    integer addition is associative+commutative, any micro-batch split
    of the input yields the same final state as the batch twin."""
    import numpy as np
    import pandas as pd

    n, s1, s2 = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        gv = np.round(pdf["value"].to_numpy() * 100).astype("int64")
        n += int(gv.size)
        s1 += int(gv.sum())
        s2 += int((gv * gv).sum())
    state.update((n, s1, s2))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n],
                        "s1": [s1], "s2": [s2]})


@contract("stream_moments_live")  # rows-only: live twin of stream_running_moments
def stream_moments_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running moments: numeric GroupState (three
    longs per user) updated by Arrow-batched numpy sums — the stateful-
    aggregation shape the funnel (categorical state machine) doesn't
    cover. Snapshots emit per batch in update mode; the final table
    keeps each user's max-n row (n is monotone). Equivalence to the
    hash-checked batch twin is EXACT (integer state, order-free) and
    pytest-asserted in tests/test_stream_equivalence.py."""
    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    result = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _moments_fn, outputStructType=_MOMENTS_OUT,
            stateStructType=_MOMENTS_STATE,
            outputMode="update", timeoutConf="NoTimeout",
        )
    )
    out = _run_to_memory(result, spark, output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (out.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "n", "s1", "s2")
            .orderBy("user_id"))


# --- A15: end-to-end ingestion through the kafka transport contract ----------

_A15_ORACLE = """
SELECT event_type, count(*) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("stream_kafka_shim_live", oracle=_A15_ORACLE)
def stream_kafka_shim_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Kafka-shaped ingestion loop, hash-checked: the events
    table is PRODUCED into a broker-less shim topic as JSON messages
    (four produce batches ⇒ four replayed micro-batches under
    maxFilesPerTrigger=1), consumed through the SAME
    ``source(spark, "kafka", ...)`` entry production uses — only the
    ``shim://`` bootstrap URI swaps the transport
    (sources/kafka_shim.py) — parsed with from_json, and aggregated in
    complete mode. The oracle recomputes the counts and id-sums straight
    from the events table, so the hash proves produce → offsets →
    multi-batch replay → binary-value decode → aggregate end-to-end:
    the first driver-hashed evidence for the kafka branch rather than
    construction-only coverage. Per-invocation topic dir: offsets start
    at 0 every run, exactly like a fresh topic.

    At scale the identical downstream plan runs against the real
    reader; the per-micro-batch state is |event_type| rows (complete
    mode on a low-cardinality key), and backpressure maps to
    maxOffsetsPerTrigger where the shim uses maxFilesPerTrigger."""
    import json as _json

    import pyarrow.parquet as _pq

    from silvia_spark.sources import kafka_shim

    tbl = _pq.read_table(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type"])
    ids = tbl.column("event_id").to_pylist()
    types = tbl.column("event_type").to_pylist()
    shim = tempfile.mkdtemp(prefix="silvia_kshim_topic_")
    n, batches = len(ids), 4
    for b in range(batches):
        lo, hi = b * n // batches, (b + 1) * n // batches
        if hi > lo:
            kafka_shim.produce(
                shim, "events",
                [_json.dumps({"i": ids[k], "t": types[k]})
                 for k in range(lo, hi)])

    stream = source(spark, "kafka", subscribe="events",
                    startingOffsets="earliest", failOnDataLoss="false",
                    **{"kafka.bootstrap.servers": f"shim://{shim}"})
    parsed = stream.select(F.from_json(
        F.col("value").cast("string"), "i BIGINT, t STRING").alias("m"))
    agg = (parsed.groupBy(F.col("m.t").alias("event_type"))
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.sum("m.i").alias("id_sum")))
    out = _run_to_memory(agg, spark, output_mode="complete")
    return out.orderBy("event_type")


# --- L16: manifest table as a STREAMING SOURCE --------------------------------

# The stream starts at version 1 (after the initial snapshot), so it
# delivers exactly the two appended batches — the oracle recomputes that
# subset. Green hash ⇒ the version-offset diff semantics deliver the
# appended commits and nothing from the starting snapshot.
def _l16_oracle() -> str:
    from silvia_spark.functions.numeric import sql_dsum
    return f"""
SELECT event_type, count(*) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       {sql_dsum("value", "val_sum")}
FROM events
WHERE event_id % 3 <> 0
GROUP BY event_type
ORDER BY event_type
"""


@contract("stream_manifest_source", oracle=_l16_oracle())
def stream_manifest_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest table as a streaming SOURCE (sources/manifest_stream.py,
    the read half of L12's exactly-once write): offsets are table
    versions, each micro-batch is the file-granular diff between two
    committed snapshots (read_changes' set), one InputPartition per
    changed file (executor-parallel, no driver data). Here the table is
    created from one third of events and two more thirds are appended as
    v2/v3; the stream starts at version 1, so the availableNow run
    delivers exactly the appended commits — the hash proves the
    version-diff semantics end-to-end through Spark's streaming engine.
    tests/test_manifest_stream_source.py additionally pins checkpointed
    exactly-once resumption across separate runs."""
    from silvia_spark.functions.numeric import dsum
    from silvia_spark.io import load_table
    from silvia_spark.operators.manifest_table import (commit_append,
                                                       create_table)
    from silvia_spark.sources.manifest_stream import read_stream_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    root = os.path.join(tempfile.mkdtemp(prefix="silvia_msrc_"), "tbl")
    create_table(ev.where(F.col("event_id") % 3 == 0), root, "event_type")
    commit_append(spark, root, ev.where(F.col("event_id") % 3 == 1),
                  "event_type")
    commit_append(spark, root, ev.where(F.col("event_id") % 3 == 2),
                  "event_type")

    feed = read_stream_table(spark, root, starting_version=1)
    out = _run_to_memory(feed, spark)
    return (out.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("event_id").alias("id_sum"),
                 dsum("value", "val_sum"))
            .orderBy("event_type"))


# --- L19: admission-controlled manifest streaming source ----------------------

# The stream starts at version 0 with maxFilesPerTrigger=2, so the
# snapshot + both appends drain as MANY bounded micro-batches (asserted
# in-contract via the query's progress telemetry) whose union is the
# whole table — the oracle recomputes the full-table aggregate. Green
# hash ⇒ admission control splits delivery without losing, duplicating,
# or reordering anything the aggregate can see.
def _l19_oracle() -> str:
    from silvia_spark.functions.numeric import sql_dsum
    return f"""
SELECT event_type, count(*) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       {sql_dsum("value", "val_sum")}
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("stream_manifest_admission", oracle=_l19_oracle())
def stream_manifest_admission(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Admission-controlled manifest streaming (L16 + Delta's
    maxFilesPerTrigger): a version-0 start on a multi-file,
    multi-version table must NOT deliver the snapshot as one micro-batch
    — at 100 TB the first batch would be the table. With
    maxFilesPerTrigger=2 the stream drains the same content as multiple
    bounded batches (>= 3 asserted from progress telemetry); the hash
    proves the bounded drain is exactly-once and complete."""
    from silvia_spark.functions.numeric import dsum
    from silvia_spark.io import load_table
    from silvia_spark.operators.manifest_table import (commit_append,
                                                       create_table)
    from silvia_spark.sources.manifest_stream import read_stream_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    root = os.path.join(tempfile.mkdtemp(prefix="silvia_madm_"), "tbl")
    create_table(ev.where(F.col("event_id") % 3 == 0).repartition(2),
                 root, "event_type")
    commit_append(spark, root,
                  ev.where(F.col("event_id") % 3 == 1).repartition(2),
                  "event_type")
    commit_append(spark, root,
                  ev.where(F.col("event_id") % 3 == 2).repartition(2),
                  "event_type")

    feed = read_stream_table(spark, root, max_files_per_trigger=2)
    name = "m" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="silvia_ckpt_")
    q = (feed.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
    assert len(batches) >= 3, (
        f"admission control delivered the table in {len(batches)} "
        "micro-batch(es) — the version-0 start was not split")

    return (spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("event_id").alias("id_sum"),
                 dsum("value", "val_sum"))
            .orderBy("event_type"))


# --- L25: streaming row-level change feed (CDC source) ------------------------

def _l25_oracle() -> str:
    from silvia_spark.functions.numeric import sql_dsum
    return f"""
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus
  FROM orders
),
a AS (
  SELECT o_orderkey + 10000000 AS o_orderkey,
         o_totalprice + 1.0 AS o_totalprice,
         o_orderpriority, o_orderstatus
  FROM base WHERE o_orderkey % 7 = 0
),
s2 AS (SELECT * FROM base UNION ALL SELECT * FROM a),
d3 AS (SELECT * FROM s2 WHERE o_orderkey % 101 = 7),
s3 AS (SELECT * FROM s2 WHERE o_orderkey % 101 <> 7),
u AS (SELECT * FROM s3 WHERE o_orderkey % 103 = 11),
feed AS (
  SELECT 1 AS _commit_version, 'insert' AS _change_type, * FROM base
  UNION ALL SELECT 2, 'insert', * FROM a
  UNION ALL SELECT 3, 'delete', * FROM d3
  UNION ALL SELECT 4, 'delete', * FROM u
  UNION ALL SELECT 4, 'insert', o_orderkey, o_totalprice + 1000.0,
                     o_orderpriority, o_orderstatus FROM u
)
SELECT _commit_version, _change_type, count(*) AS cnt,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       {sql_dsum("o_totalprice", "price_sum")}
FROM feed GROUP BY _commit_version, _change_type
ORDER BY _commit_version, _change_type
"""


@contract("stream_changes_cdf", oracle=_l25_oracle())
def stream_changes_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ROW-LEVEL change feed (Delta's ``readChangeFeed`` on
    the manifest layer — L23's batch shape as a CDC SOURCE): the table
    is created with CDF on, then appended (v2), DV-deleted (v3), and
    merge-updated (v4); the stream delivers each version's EXACT change
    rows tagged (_change_type, _commit_version) — inserts from the
    version diff, deletes/updates from the commit-time ``_changes/``
    records, an update as its delete+insert pair. The hash proves the
    per-version history equals the relational replay, including the
    old-value images of deleted and pre-update rows. Write cost is
    O(changed rows) at each commit, read cost O(changed rows) per
    batch — no per-consumer table diff, which is what makes CDC
    consumable at 100 TB. tests/test_manifest_cdf.py additionally pins
    checkpointed exactly-once resumption and the vacuum interaction."""
    from silvia_spark.functions.numeric import dsum
    from silvia_spark.io import load_table
    from silvia_spark.operators.manifest_table import (commit_append,
                                                       commit_delete,
                                                       commit_merge,
                                                       create_table,
                                                       read_snapshot)
    from silvia_spark.sources.manifest_stream import read_stream_changes

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority",
        "o_orderstatus")
    root = os.path.join(tempfile.mkdtemp(prefix="silvia_mcdf_"), "tbl")
    create_table(od, root, "o_orderstatus", cdf=True)
    commit_append(
        spark, root,
        od.where(F.col("o_orderkey") % 7 == 0)
        .select((F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
                "o_orderpriority", "o_orderstatus"),
        "o_orderstatus")
    commit_delete(
        spark, root,
        read_snapshot(spark, root)
        .where(F.col("o_orderkey") % 101 == 7)
        .select("o_orderkey", "o_orderstatus").distinct(),
        ["o_orderkey", "o_orderstatus"], "o_orderstatus")
    commit_merge(
        spark, root,
        read_snapshot(spark, root)
        .where(F.col("o_orderkey") % 103 == 11)
        .select("o_orderkey",
                (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
                "o_orderpriority", "o_orderstatus",
                F.lit("U").alias("op")),
        ["o_orderkey", "o_orderstatus"], "o_orderstatus")

    feed = read_stream_changes(spark, root)
    out = _run_to_memory(feed, spark)
    return (out.groupBy("_commit_version", "_change_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("o_orderkey").cast("bigint").alias("key_sum"),
                 dsum("o_totalprice", "price_sum"))
            .orderBy("_commit_version", "_change_type"))


# --- L32: CDC table replication (the change feed composing end-to-end) --------

def net_changes(df: DataFrame, keys: list[str]) -> DataFrame:
    """Collapse a window of row-level change records to the NET action
    per key: the latest version wins, and within a version an insert
    outranks the delete it pairs with (an update nets to its
    post-image). Returns the merge-ready frame — ``op`` = 'U' for keys
    whose last action is an insert, 'D' otherwise — so applying a
    replayed window is idempotent by construction (upserts and deletes
    of already-converged keys are no-ops)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col("_commit_version").desc(),
        F.when(F.col("_change_type") == "insert", 1)
        .otherwise(0).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .withColumn("op", F.when(F.col("_change_type") == "insert",
                                     "U").otherwise("D"))
            .drop("__rn", "_change_type", "_commit_version"))


def replicate_table(spark: SparkSession, src: str, dst: str,
                    keys: list[str], part_col: str,
                    checkpoint: str) -> None:
    """Replicate a CDF-enabled manifest table into another via its CDC
    stream (Delta's change-feed replication pattern): each micro-batch
    of row-level changes nets per key and applies as ONE atomic MERGE
    (deletes included) — the replica converges to the source state
    version by version, exactly-once across checkpointed restarts
    (offsets are versions; a crash-replayed batch re-nets to the same
    merge, which is idempotent). Cost per batch is O(changed rows) to
    read + a stats-pruned merge on the replica — never a table diff,
    never a full rewrite: the shape that replicates a 100 TB table
    across regions on commit-sized increments. Runs one availableNow
    drain; call again (same checkpoint) to catch up."""
    from silvia_spark.operators.manifest_table import (commit_merge,
                                                       create_table,
                                                       current_version)
    from silvia_spark.sources.manifest_stream import read_stream_changes

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        net = net_changes(bdf, keys).persist()
        try:
            if current_version(dst) is None:
                create_table(net.where(F.col("op") == "U").drop("op"),
                             dst, part_col)
                rest = net.where(F.col("op") == "D")
                if rest.limit(1).count():
                    commit_merge(spark, dst, rest, keys, part_col)
            else:
                commit_merge(spark, dst, net, keys, part_col)
        finally:
            net.unpersist()

    q = (read_stream_changes(spark, src)
         .writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)


def _l32_oracle() -> str:
    from silvia_spark.functions.numeric import sql_dsum
    return f"""
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
),
a AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice,
         o_orderstatus
  FROM base WHERE o_orderkey % 7 = 0
),
s2 AS (SELECT * FROM base UNION ALL SELECT * FROM a),
s3 AS (SELECT * FROM s2 WHERE o_orderkey % 101 <> 7),
final AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 103 = 11
              THEN o_totalprice + 1000.0 ELSE o_totalprice END
           AS o_totalprice,
         o_orderstatus
  FROM s3
)
SELECT o_orderstatus, count(*) AS cnt,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       {sql_dsum("o_totalprice", "price_sum")}
FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@contract("stream_replicate_table", oracle=_l32_oracle())
def stream_replicate_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC replication end-to-end (L32): the source table takes a
    create → append → DV-delete → merge-update history with the change
    feed on; ``replicate_table`` consumes the CDC STREAM and applies
    each batch as one net-per-key atomic MERGE on the replica. The
    hash proves the replica equals the relational final state — i.e.
    the whole CDC surface (commit-time change records → streaming
    source → net-merge apply) composes into Delta-style table
    replication with nothing lost, duplicated, or misordered.
    tests/test_manifest_cdf.py::test_replicate_* additionally pin
    incremental catch-up and replay idempotence across checkpointed
    restarts."""
    from silvia_spark.functions.numeric import dsum
    from silvia_spark.io import load_table
    from silvia_spark.operators.manifest_table import (commit_append,
                                                       commit_delete,
                                                       commit_merge,
                                                       create_table,
                                                       read_snapshot)

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    base_dir = tempfile.mkdtemp(prefix="silvia_mrep_")
    src = os.path.join(base_dir, "src")
    dst = os.path.join(base_dir, "dst")
    create_table(od, src, "o_orderstatus", cdf=True)
    commit_append(
        spark, src,
        od.where(F.col("o_orderkey") % 7 == 0)
        .select((F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_totalprice", "o_orderstatus"),
        "o_orderstatus")
    commit_delete(
        spark, src,
        read_snapshot(spark, src)
        .where(F.col("o_orderkey") % 101 == 7)
        .select("o_orderkey", "o_orderstatus").distinct(),
        ["o_orderkey", "o_orderstatus"], "o_orderstatus")
    commit_merge(
        spark, src,
        read_snapshot(spark, src)
        .where(F.col("o_orderkey") % 103 == 11)
        .select("o_orderkey",
                (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
                "o_orderstatus", F.lit("U").alias("op")),
        ["o_orderkey", "o_orderstatus"], "o_orderstatus")

    replicate_table(spark, src, dst,
                    ["o_orderkey", "o_orderstatus"], "o_orderstatus",
                    tempfile.mkdtemp(prefix="silvia_repck_"))

    return (read_snapshot(spark, dst)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("o_orderkey").cast("bigint").alias("key_sum"),
                 dsum("o_totalprice", "price_sum"))
            .orderBy("o_orderstatus"))
