"""Round-start corpus canary — catches silent testdata regenerations.

The r04 corpus regeneration flipped events.ts from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS) and was caught late (io.py grew the footer sniff only
after an afternoon of 1970-dated results). This file is alphabetically
first among the corpus-touching tests, so a regenerated corpus fails HERE,
with a message naming the drift, before any contract test runs.

Three guards per sf dir:
 1. every expected table file exists;
 2. events.ts physical unit is one the loader handles (ns or us) and the
    loader surfaces timestamp_ntz regardless of layout;
 3. one events aggregate hash-matches DuckDB end-to-end (exercises the
    full ts reconstruction path — an off-by-1000 lands in 1970 and
    changes every window bucket, so the hash cannot survive a unit bug).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from silvia_spark.schemas import TABLE_NAMES
from tests import parity
from tests.conftest import SF_MID, SF_SMALL

SF_DIRS = [SF_SMALL, SF_MID]

_CANARY_SQL = """
SELECT date_trunc('hour', ts) AS h, event_type,
       count(*) AS cnt
FROM events
GROUP BY h, event_type
ORDER BY h, event_type
"""


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_present(sf_dir):
    missing = [t for t in TABLE_NAMES
               if not os.path.exists(f"{sf_dir}/{t}.parquet")]
    assert not missing, f"corpus drift: {sf_dir} missing tables {missing}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_unit_handled(sf_dir, spark):
    t = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    unit = getattr(t, "unit", None)
    assert unit in ("ns", "us"), (
        f"corpus drift: events.ts unit {unit!r} in {sf_dir} — io.py's "
        "loader handles ns and us only; extend the sniff before running "
        "anything else")
    from silvia_spark.io import load_table
    ts_type = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
    assert ts_type == "timestamp_ntz", (
        f"loader surfaced events.ts as {ts_type} for the {unit} layout — "
        "both branches must normalize to timestamp_ntz")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_hour_counts_hash_match(sf_dir, spark):
    """End-to-end ts reconstruction check: Spark's hourly event counts
    hash-equal DuckDB's over the raw parquet. DuckDB reads the file
    natively (any unit), so a loader unit bug shifts every Spark bucket
    by ~56 years and the fingerprints cannot collide."""
    from pyspark.sql import functions as F

    from silvia_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    sdf = (ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
           .agg(F.count(F.lit(1)).alias("cnt"))
           .orderBy("h", "event_type"))
    s_fp = parity.frame_fingerprint(
        sdf.columns, [tuple(r) for r in sdf.collect()])
    o_cols, o_rows = parity.run_duckdb(_CANARY_SQL, sf_dir)
    o_fp = parity.frame_fingerprint(o_cols, o_rows)
    assert s_fp == o_fp, (
        f"corpus canary MISMATCH in {sf_dir}: spark {s_fp} vs duckdb "
        f"{o_fp} — events.ts reconstruction is wrong for this layout; "
        "fix io.py before trusting any other test")


def test_ns_layout_branch_synthetic(tmp_path, spark):
    """The corpus is currently µs-layout, so the loader's ns branch is
    dead code against /root/testdata — pin it with a synthetic
    TIMESTAMP(NANOS) events file: values must round-trip exactly (integer
    div, truncation toward zero for post-epoch values) and the surfaced
    dtype must be timestamp_ntz like the µs branch."""
    import datetime as dt

    import pyarrow as pa

    from silvia_spark.io import load_table

    ns_vals = [1_700_000_000_123_456_789, 1_700_000_000_000_000_000]
    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["view", "click"]),
        "ts": pa.array(ns_vals, pa.timestamp("ns")),
        "value": pa.array([1.0, 2.0], pa.float64()),
        "props": pa.array(['{"k":1}', '{"k":2}']),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    ev = load_table(spark, str(tmp_path), "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    got = sorted(r.ts for r in ev.select("ts").collect())
    want = sorted(
        dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v // 1000)
        for v in ns_vals)
    assert got == want, f"ns reconstruction drift: {got} != {want}"
