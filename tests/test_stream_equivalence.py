"""Batch ≡ stream equivalence — SURVEY.md §5.2.4.

The hash-checked batch twins and the availableNow live variants must agree
on every window the stream has CLOSED. Append-mode streaming only emits a
window once the watermark passes its end, so the tail windows (within
watermark delay of max event time) are legitimately withheld by the live
variant — the assertion models that cutoff exactly rather than papering
over it: live == batch restricted to closed windows, and nothing else.
"""

from __future__ import annotations

import datetime

import pytest

from silvia_spark import registry
from silvia_spark.io import load_table
from tests.conftest import SF_SMALL

registry.load_all_modules()

pytestmark = pytest.mark.slow


def _rows(name, spark, cols):
    df = registry.QUERIES[name](spark, SF_SMALL).select(*cols)
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _max_ts(spark) -> datetime.datetime:
    import pyspark.sql.functions as F
    return load_table(spark, SF_SMALL, "events").agg(
        F.max("ts")).collect()[0][0]


def test_tumbling_batch_eq_live(spark):
    """date_trunc batch buckets == F.window() streaming buckets for every
    window closed by the 1h watermark; the open tail windows are exactly
    the batch-minus-live difference."""
    batch = _rows("stream_tumbling_1h", spark, ["wstart", "event_type", "cnt"])
    live = _rows("stream_tumbling_live", spark, ["wstart", "event_type", "cnt"])
    # window closed ⇔ wstart + 1h (end) ≤ max_ts − 1h (watermark)
    cutoff = _max_ts(spark) - datetime.timedelta(hours=2)
    closed = [r for r in batch
              if datetime.datetime.fromisoformat(r[0]) <= cutoff]
    assert live == closed
    assert set(live) <= set(batch)


def test_session_batch_eq_live(spark):
    """lag/cumsum sessionization == native session_window on every closed
    session: same (user, session_start=min ts, n_events). (session_window's
    *end* is max(ts)+gap by definition, the batch twin's is max(ts); a
    session is closed once the 30m watermark passes end+gap.)"""
    batch_df = registry.QUERIES["stream_session_30m"](spark, SF_SMALL) \
        .select("user_id", "session_start", "session_end", "n_events")
    batch_full = [tuple(r) for r in batch_df.collect()]
    live = _rows("stream_session_live", spark,
                 ["user_id", "session_start", "n_events"])
    cutoff = _max_ts(spark) - datetime.timedelta(minutes=60)
    closed = sorted(
        (str(u), str(s), str(n))
        for (u, s, e, n) in batch_full if e <= cutoff)
    assert live == closed


def test_dedup_batch_eq_live(spark):
    """Doubled-input dropDuplicates == dropDuplicatesWithinWatermark on
    per-type counts (row-level operator: nothing is withheld — every
    arriving row is emitted or dropped immediately)."""
    batch = _rows("stream_dedup_exact", spark, ["event_type", "cnt"])
    live = _rows("stream_dedup_live", spark, ["event_type", "cnt"])
    assert batch == live


def test_transform_with_state_eq_batch(spark):
    """Arbitrary-stateful running (count, max) snapshot == trivial batch
    groupBy (row-level state: nothing watermark-withheld)."""
    import pyspark.sql.functions as F
    live = _rows("stream_transform_with_state", spark,
                 ["user_id", "n_events", "max_value"])
    batch_df = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("user_id") < 40)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.max("value").alias("max_value"))
    )
    batch = sorted(tuple(str(v) for v in r) for r in batch_df.collect())
    assert live == batch


def test_funnel_fn_vectorization_matches_per_event_loop():
    """r04 vectorized _funnel_fn (masked numpy scans) must agree with the
    original per-event Python loop on every input shape: empty batches,
    out-of-order arrivals, repeated stages, skipped stages, resumed state,
    and multi-chunk iterators."""
    import random

    import pandas as pd

    from silvia_spark.streaming.streams import _funnel_fn

    class FakeState:
        def __init__(self, stage=None):
            self.exists = stage is not None
            self.get = (stage,) if stage is not None else None
            self.updated = None

        def update(self, v):
            self.updated = v

    def reference(chunks, start_stage):
        stage = start_stage
        rank = {"view": 1, "click": 2, "purchase": 3}
        for pdf in chunks:
            for et in pdf.sort_values("ts")["event_type"]:
                want = rank.get(et)
                if want is not None and want == stage + 1:
                    stage = want
        return stage

    rng = random.Random(7)
    types = ["view", "click", "purchase", "other"]
    for trial in range(200):
        n_chunks = rng.randint(1, 3)
        chunks = []
        for _ in range(n_chunks):
            n = rng.randint(0, 8)
            chunks.append(pd.DataFrame({
                "ts": [rng.randint(0, 5) for _ in range(n)],
                "event_type": [rng.choice(types) for _ in range(n)],
            }))
        prior = rng.choice([None, 0, 1, 2, 3])
        # pandas sort_values must break ties identically for both paths:
        # it does (same call, same input), so semantics comparison is fair.
        want = reference([c.copy() for c in chunks],
                         prior if prior is not None else 0)
        state = FakeState(prior)
        out = list(_funnel_fn(("u1",), iter([c.copy() for c in chunks]),
                              state))
        assert state.updated == (want,), f"trial {trial}: {state.updated} != {want}"
        assert out[0]["funnel_stage"].iloc[0] == want


TWS_SHIM_DIR = "/root/repo/tools/tws_shim"
_CLOUDSDK_PB = "/usr/lib/google-cloud-sdk/platform/google_appengine"


@pytest.mark.skipif(
    not __import__("os").path.isdir(_CLOUDSDK_PB),
    reason="no local protobuf copy to shim — TWS runner cannot start here")
def test_transform_with_state_real_runner_eq_fallback(tmp_path):
    """Execute the REAL transformWithStateInPandas runner (not the
    applyInPandasWithState fallback) and pin its output to the fallback's.

    The runner needs google.protobuf in driver + every Python worker; the
    container's site-packages has none, but tools/tws_shim/sitecustomize.py
    exposes the Cloud SDK's bundled 6.32 runtime when SILVIA_TWS_PB_SHIM=1.
    sitecustomize runs at interpreter start of each forked worker — the only
    hook early enough — so the probe needs a fresh subprocess with the shim
    dir on PYTHONPATH; patching sys.path in this pytest process would reach
    the driver but not the workers' proto import. Inside the subprocess the
    contract takes the TWS branch (RocksDB state store, typed ValueState
    column families); forcing _tws_available→False re-runs the same state
    program through the fallback, and the two row sets must be identical."""
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("tws-real-runner").config("spark.ui.enabled", "false")
                 .config("spark.sql.shuffle.partitions", "8").getOrCreate())
        from silvia_spark.streaming import streams
        assert streams._tws_available(), "shim failed: protobuf not importable"
        from pyspark.sql.streaming.proto import StateMessage_pb2  # gencode loads
        real = sorted((r.user_id, r.n_events, round(r.max_value, 6))
                      for r in streams.stream_transform_with_state(
                          spark, "/root/testdata/sf0.001").collect())
        streams._tws_available = lambda: False
        fb = sorted((r.user_id, r.n_events, round(r.max_value, 6))
                    for r in streams.stream_transform_with_state(
                        spark, "/root/testdata/sf0.001").collect())
        assert real == fb, f"TWS != fallback:\\n{real}\\n{fb}"
        assert len(real) > 0
        print("TWS_REAL_OK", len(real))
    """)
    env = dict(os.environ)
    env["PYTHONPATH"] = TWS_SHIM_DIR + os.pathsep + "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env["SILVIA_TWS_PB_SHIM"] = "1"
    proc = subprocess.run([sys.executable, "-c", script], env=env,
                          capture_output=True, text=True, timeout=600,
                          cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TWS_REAL_OK" in proc.stdout


def test_moments_live_eq_batch(spark):
    """stream_moments_live's final state must equal the hash-checked batch
    twin EXACTLY — integer moments are order-free, so micro-batch
    splitting cannot perturb them (unlike double accumulation)."""
    from silvia_spark import registry

    registry.load_all_modules()
    live = {r.user_id: (r.n, r.s1, r.s2)
            for r in registry.QUERIES["stream_moments_live"](
                spark, SF_SMALL).collect()}
    batch = {r.user_id: (r.n, r.s1, r.s2)
             for r in registry.QUERIES["stream_running_moments"](
                 spark, SF_SMALL).collect()}
    assert live == batch


def test_moments_live_multi_batch_cadence(spark, tmp_path):
    """Second trigger cadence: the same live query run as FOUR micro-batches
    (4-part events dir + maxFilesPerTrigger=1) must produce state
    bit-identical to the single-batch availableNow run AND the batch twin.
    This is the property every rows-only live contract stands on — GroupState
    accumulation is invariant to how the input is sliced into triggers."""
    from silvia_spark import registry
    from silvia_spark.io import load_table
    from silvia_spark.streaming import streams

    registry.load_all_modules()
    # stage a multi-part corpus: events.parquet as a DIRECTORY of 4 files
    sf2 = str(tmp_path / "sf")
    (load_table(spark, SF_SMALL, "events").repartition(4)
     .write.parquet(f"{sf2}/events.parquet"))
    assert streams.SOURCE_OPTIONS == {}
    streams.SOURCE_OPTIONS["maxFilesPerTrigger"] = "1"
    try:
        multi = {r.user_id: (r.n, r.s1, r.s2)
                 for r in registry.QUERIES["stream_moments_live"](
                     spark, sf2).collect()}
    finally:
        streams.SOURCE_OPTIONS.clear()
    batch = {r.user_id: (r.n, r.s1, r.s2)
             for r in registry.QUERIES["stream_running_moments"](
                 spark, SF_SMALL).collect()}
    assert multi == batch
