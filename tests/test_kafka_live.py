"""A15's produce/consume round-trip against a REAL Kafka broker —
env-gated (r09 verdict item 8). The sandbox has no broker and no
spark-sql-kafka connector jar, so offline this module SKIPS cleanly;
the day a broker exists, set

    SILVIA_KAFKA_BOOTSTRAP=host:9092

(and launch Spark with the connector, e.g.
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark ver>``)
and the same factory code path the shim exercises offline
(sources/factory.py's kafka branch — identical option plumbing, real
transport) replays the hash check end-to-end: produce the events
corpus as JSON through Spark's kafka batch sink, stream it back
through ``source(spark, "kafka", ...)``, and compare the aggregate
against the same aggregate computed directly from the table. Uses a
uuid topic per run (requires broker topic auto-creation, the default)."""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SILVIA_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="SILVIA_KAFKA_BOOTSTRAP not set — no live broker available")


def _kafka_format_available(spark) -> bool:
    """The connector jar ships separately from Spark; probe the class
    loader instead of failing minutes later at .load()."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def test_live_kafka_roundtrip_matches_direct_aggregate(spark):
    if not _kafka_format_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")

    from silvia_spark.io import load_table
    from silvia_spark.sources.factory import source
    from silvia_spark.streaming.streams import _run_to_memory

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type")
    topic = f"silvia-live-{uuid.uuid4().hex[:12]}"

    # produce through Spark's own kafka batch sink (no extra client lib)
    (ev.select(F.to_json(F.struct(
        F.col("event_id").alias("i"),
        F.col("event_type").alias("t"))).alias("value"))
     .write.format("kafka")
     .option("kafka.bootstrap.servers", BOOTSTRAP)
     .option("topic", topic).save())

    # consume through the SAME factory branch the shim tests offline
    stream = source(spark, "kafka", subscribe=topic,
                    startingOffsets="earliest", failOnDataLoss="false",
                    **{"kafka.bootstrap.servers": BOOTSTRAP})
    parsed = stream.select(F.from_json(
        F.col("value").cast("string"), "i BIGINT, t STRING").alias("m"))
    agg = (parsed.groupBy(F.col("m.t").alias("event_type"))
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.sum("m.i").alias("id_sum")))
    got = {(r.event_type, r.cnt, r.id_sum)
           for r in _run_to_memory(agg, spark,
                                   output_mode="complete").collect()}

    want = {(r.event_type, r.cnt, r.id_sum)
            for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("event_id").alias("id_sum")).collect()}
    diff = got.symmetric_difference(want)
    assert not diff, (
        f"live-broker round-trip diverged from the direct aggregate: "
        f"{json.dumps(sorted(map(list, diff))[:5], default=str)}")
