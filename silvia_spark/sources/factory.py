"""Streaming source factory — SURVEY.md §2.A note.

One constructor for every streaming input the engine supports; queries name
a kind and pass config instead of hand-building readers:

- ``file``   — file-stream over a directory (schema required). The corpus
  stores one parquet file per table, so a per-sf staging dir of symlinks is
  built on demand (concurrency-safe: the symlink create tolerates a racing
  sibling session).
- ``rate``   — the deterministic ``rate-micro-batch`` synthetic clock.
- ``kafka``  — the production entry on a cluster: ``source(spark, "kafka",
  subscribe="events", **{"kafka.bootstrap.servers": "..."})`` builds the
  standard ``kafka`` format reader. A ``shim://<dir>`` bootstrap URI
  instead routes to the file-backed transport shim
  (sources/kafka_shim.py) that honors the same output contract — offsets,
  startingOffsets, micro-batch replay — so the branch is EXECUTED by
  offline tests, not just constructed (no broker in this environment).
"""

from __future__ import annotations

import os
import tempfile
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from silvia_spark.session import configure_session
from silvia_spark.sources import kafka_shim


def _stage_single_file(path: str) -> str:
    """File-stream sources need a directory; stage a symlink dir for a
    single-file table. Idempotent and race-safe across sessions."""
    stage = os.path.join(
        tempfile.gettempdir(),
        "silvia_stream_" + os.path.dirname(path).strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, os.path.basename(path))
    if not os.path.exists(link):
        try:
            os.symlink(path, link)
        except FileExistsError:
            pass  # concurrent session staged it first — same target
    return stage


def source(spark: SparkSession, kind: str, *,
           path: str | None = None,
           schema: StructType | None = None,
           fmt: str = "parquet",
           **options: str) -> DataFrame:
    """Build a streaming DataFrame for ``kind`` ∈ {file, rate, kafka}."""
    configure_session(spark)
    if kind == "file":
        if path is None or schema is None:
            raise ValueError("file source requires path= and schema=")
        directory = _stage_single_file(path) if os.path.isfile(path) else path
        reader = spark.readStream.schema(schema)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.format(fmt).load(directory)
    if kind == "rate":
        reader = spark.readStream.format("rate-micro-batch")
        defaults = {"rowsPerBatch": "100", "numPartitions": "2",
                    "startTimestamp": "0", "advanceMillisPerBatch": "1000"}
        for k, v in {**defaults, **options}.items():
            reader = reader.option(k, v)
        return reader.load()
    if kind == "kafka":
        # Fail fast on the two configs every Kafka reader needs — a
        # missing bootstrap list or subscription otherwise surfaces as a
        # runtime AdminClient error minutes into a cluster submit.
        if "kafka.bootstrap.servers" not in options:
            raise ValueError(
                "kafka source requires kafka.bootstrap.servers=")
        if not ({"subscribe", "subscribePattern", "assign"} & set(options)):
            raise ValueError("kafka source requires one of subscribe= / "
                             "subscribePattern= / assign=")
        # Engine defaults (caller-overridable): ETL pipelines replay from
        # the checkpoint after first start, so the FIRST run should read
        # the topic's retained history (earliest), and a retention-expiry
        # gap should be surfaced by monitoring, not kill the query
        # (failOnDataLoss=false) — both are the standard long-running
        # ingestion posture.
        kafka_defaults = {"startingOffsets": "earliest",
                          "failOnDataLoss": "false"}
        # Both diverge from Spark's own defaults (latest / fail), and
        # failOnDataLoss=false means retention-expiry gaps are SKIPPED
        # silently — that posture must be a visible caller choice, so an
        # implicit application is surfaced once per call site.
        implicit = sorted(set(kafka_defaults) - set(options))
        if implicit:
            warnings.warn(
                "kafka source applying engine defaults "
                + ", ".join(f"{k}={kafka_defaults[k]}" for k in implicit)
                + " (differ from Spark's latest/failOnDataLoss=true; "
                "failOnDataLoss=false silently skips retention-expired "
                "offsets — pass the option explicitly to silence)",
                stacklevel=2)
        merged = {**kafka_defaults, **options}
        # Broker-less executable mode: a shim:// bootstrap URI routes to
        # the file-backed transport (sources/kafka_shim.py) that honors
        # the real kafka source's output contract — same validation and
        # option plumbing above, different transport below, so offline
        # tests execute this branch instead of stopping at construction.
        bootstrap = merged["kafka.bootstrap.servers"]
        if bootstrap.startswith(kafka_shim.SCHEME):
            return kafka_shim.read_stream(
                spark, bootstrap[len(kafka_shim.SCHEME):], merged)
        reader = spark.readStream.format("kafka")
        for k, v in merged.items():
            reader = reader.option(k, v)
        return reader.load()
    raise ValueError(f"unknown source kind: {kind!r}")
