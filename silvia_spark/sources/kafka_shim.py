"""File-backed Kafka transport shim — executes the factory's kafka branch
offline (this sandbox has no broker and no kafka connector jar).

Routing: a ``shim://<dir>`` bootstrap URI makes ``source(spark, "kafka",
subscribe=..., ...)`` return a stream honoring the REAL kafka source's
output contract instead of failing at ``.load()``:

- schema: ``key``/``value`` BINARY, ``topic`` STRING, ``partition`` INT,
  ``offset`` BIGINT, ``timestamp`` TIMESTAMP, ``timestampType`` INT —
  the exact columns Spark's kafka source exposes;
- per-(topic, partition) offsets dense from 0 and monotone across
  ``produce()`` calls. File layout: ``<dir>/<topic>/`` holds one parquet
  file per produce() call named ``p<P>o<start>-<end>.parquet``
  (zero-padded so lexicographic file order == offset order — Spark's
  file-stream source breaks equal-mtime ties by path, and sub-ms
  produce() bursts land in one mtime tick); with
  ``maxFilesPerTrigger=1`` each produce batch replays as its own
  micro-batch — the shim's analogue of broker poll boundaries, which is
  what lets a test drive MULTI-batch stateful replay deterministically;
- ``startingOffsets``: ``earliest`` | ``latest`` | per-partition JSON
  (``{"topic": {"0": 3}}``, non-negative offsets). ``latest`` binds at
  stream-build time, like the real source's query start; partitions not
  named in the JSON default to earliest;
- ``failOnDataLoss``: accepted and ignored — a file topic has no
  retention, so the loss path cannot arise.

- subscription modes: ``subscribe`` (comma list), ``subscribePattern``
  (regex full-matched against the topic dirs at stream-build time), and
  ``assign`` (JSON ``{"topic": [0, 1]}`` per-partition whitelist) —
  exactly one, like the real source.

Deliberately NOT emulated: negative JSON offsets (-1/-2), runtime
discovery of NEW topics matching a subscribePattern (broker metadata
polling; the shim binds the match at build time and raises a typed error
when nothing matches), consumer-group rebalancing, transactional
markers.
Downstream plans see only the output contract, so a query developed
against the shim runs unchanged against a real broker's reader — and the
factory's option plumbing (defaults, overrides, validation) is the SAME
code path either way, which is the point: tests/test_kafka_shim.py gets
to execute it instead of asserting construction only.
"""

from __future__ import annotations

import datetime
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEME = "shim://"

# Spark kafka source output schema (timestampType: 0=CreateTime compat).
KAFKA_SCHEMA = ("key BINARY, value BINARY, topic STRING, partition INT, "
                "offset BIGINT, timestamp TIMESTAMP, timestampType INT")

_FILE_RE = re.compile(r"^p(\d+)o(\d+)-(\d+)\.parquet$")


def _partition_ends(topic_dir: str) -> dict[int, int]:
    """Next-offset per partition from the file names (no data read)."""
    ends: dict[int, int] = {}
    if not os.path.isdir(topic_dir):
        return ends
    for name in os.listdir(topic_dir):
        m = _FILE_RE.match(name)
        if m:
            p, _, end = (int(g) for g in m.groups())
            ends[p] = max(ends.get(p, -1), end)
    return {p: e + 1 for p, e in ends.items()}


def produce(shim_dir: str, topic: str, values: list[str | bytes], *,
            keys: list[str | bytes | None] | None = None,
            partition: int = 0,
            base_ts: str = "2024-01-01T00:00:00+00:00") -> tuple[int, int]:
    """Append one message batch to ``topic`` — one parquet file, hence one
    replayed micro-batch under the shim reader. Returns (first, last)
    assigned offsets. Message timestamps are deterministic (base_ts +
    offset seconds) so replay tests stay hash-stable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    topic_dir = os.path.join(shim_dir, topic)
    os.makedirs(topic_dir, exist_ok=True)
    start = _partition_ends(topic_dir).get(partition, 0)
    n = len(values)
    if n == 0:
        raise ValueError("empty produce batch")
    if keys is not None and len(keys) != n:
        raise ValueError("keys/values length mismatch")
    base = datetime.datetime.fromisoformat(base_ts)

    def as_bytes(v):
        return v.encode("utf-8") if isinstance(v, str) else v

    offsets = list(range(start, start + n))
    table = pa.table({
        "key": pa.array([as_bytes(k) for k in keys] if keys is not None
                        else [None] * n, pa.binary()),
        "value": pa.array([as_bytes(v) for v in values], pa.binary()),
        "topic": pa.array([topic] * n, pa.string()),
        "partition": pa.array([partition] * n, pa.int32()),
        "offset": pa.array(offsets, pa.int64()),
        "timestamp": pa.array(
            [base + datetime.timedelta(seconds=o) for o in offsets],
            pa.timestamp("us", tz="UTC")),
        "timestampType": pa.array([0] * n, pa.int32()),
    })
    pq.write_table(table, os.path.join(
        topic_dir,
        f"p{partition:05d}o{start:012d}-{start + n - 1:012d}.parquet"))
    return start, start + n - 1


def read_batch(spark: SparkSession, shim_dir: str, topic: str) -> DataFrame:
    """The batch view of a shim topic (analogue of spark.read.format
    ("kafka") with earliest→latest bounds) — the equivalence tests'
    ground truth."""
    return spark.read.schema(KAFKA_SCHEMA).parquet(
        os.path.join(shim_dir, topic))


def _resolve_subscription(shim_dir: str, options: dict[str, str]
                          ) -> tuple[list[str],
                                     dict[str, set[int]] | None]:
    """Topics (and, for assign, the partition whitelist) from exactly one
    of subscribe / subscribePattern / assign — the real source's rule
    (passing two is a Kafka config error, not a silent preference).

    subscribePattern binds at stream-BUILD time against the existing
    topic dirs (the real source also discovers new matching topics at
    runtime — a broker-metadata feature a file listing cannot honor;
    deliberate shim limitation, disclosed here)."""
    modes = [k for k in ("subscribe", "subscribePattern", "assign")
             if k in options]
    if len(modes) != 1:
        raise ValueError(
            "kafka source requires exactly one of subscribe= / "
            f"subscribePattern= / assign= (got {modes or 'none'})")
    mode = modes[0]
    if mode == "subscribe":
        topics = [t.strip() for t in options[mode].split(",") if t.strip()]
        if not topics:
            raise ValueError("subscribe= names no topics")
        return topics, None
    if mode == "subscribePattern":
        pat = re.compile(options[mode])
        topics = sorted(
            d for d in (os.listdir(shim_dir)
                        if os.path.isdir(shim_dir) else [])
            if os.path.isdir(os.path.join(shim_dir, d))
            and pat.fullmatch(d))
        if not topics:
            raise ValueError(
                f"subscribePattern {options[mode]!r} matches no existing "
                "shim topic (pattern subscription binds at build time "
                "against the topic dirs)")
        return topics, None
    spec = json.loads(options["assign"])
    if not isinstance(spec, dict) or not spec:
        raise ValueError(
            'assign= must be a non-empty JSON object like '
            '{"topic": [0, 1]}')
    assigned = {t: {int(p) for p in parts} for t, parts in spec.items()}
    return sorted(assigned), assigned


def read_stream(spark: SparkSession, shim_dir: str,
                options: dict[str, str]) -> DataFrame:
    """Build the shim stream for factory.source's kafka branch. ``options``
    is the merged defaults+caller dict the real reader would receive."""
    topics, assigned = _resolve_subscription(shim_dir, options)
    starting = options.get("startingOffsets", "latest")

    # Resolve per-(topic, partition) lower bounds BEFORE building the
    # stream — "latest" must bind at query start, like the real source.
    bounds: dict[tuple[str, int], int] = {}
    if starting == "latest":
        for t in topics:
            for p, nxt in _partition_ends(os.path.join(shim_dir, t)).items():
                bounds[(t, p)] = nxt
    elif starting != "earliest":
        spec = json.loads(starting)
        for t, parts in spec.items():
            for p, off in parts.items():
                if int(off) < 0:
                    raise ValueError(
                        "kafka shim supports non-negative JSON offsets only")
                bounds[(t, int(p))] = int(off)

    streams = []
    for t in topics:
        topic_dir = os.path.join(shim_dir, t)
        os.makedirs(topic_dir, exist_ok=True)
        reader = spark.readStream.schema(KAFKA_SCHEMA)
        reader = reader.option(
            "maxFilesPerTrigger",
            options.get("shim.maxFilesPerTrigger", "1"))
        streams.append(reader.parquet(topic_dir))
    df = streams[0]
    for s in streams[1:]:
        df = df.unionByName(s)

    if assigned is not None:
        # per-partition assignment: only the named (topic, partition)
        # pairs flow — the real source's consumer.assign() semantics
        keep_assigned = F.lit(False)
        for t, parts in sorted(assigned.items()):
            keep_assigned = keep_assigned | (
                (F.col("topic") == t)
                & F.col("partition").isin(sorted(parts)))
        df = df.where(keep_assigned)

    if not bounds:
        return df
    keep = F.lit(False)
    listed = F.lit(False)
    for (t, p), off in sorted(bounds.items()):
        here = (F.col("topic") == t) & (F.col("partition") == p)
        keep = keep | (here & (F.col("offset") >= off))
        listed = listed | here
    # partitions outside the bound set (discovered later) read earliest,
    # matching the real source's new-partition behavior
    return df.where(keep | ~listed)
