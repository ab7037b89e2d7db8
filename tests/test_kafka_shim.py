"""Executed coverage for the factory's kafka branch via the shim://
transport (sources/kafka_shim.py) — batch ≡ replayed-stream equivalence
plus the offset semantics the real source contract promises. The factory
call is the SAME production entry (`source(spark, "kafka", ...)`); only
the bootstrap URI differs, so the validation + option-merge + routing
code path is executed end-to-end, not construction-checked."""

from __future__ import annotations

import json
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

from silvia_spark.sources import factory, kafka_shim


def _messages(event_types):
    return [json.dumps({"event_type": t, "value": i * 1.5})
            for i, t in enumerate(event_types)]


def _run_available_now(df, spark, output_mode="complete"):
    """Run to a memory sink, returning (result_df, non-empty micro-batch
    count) so replay cadence is assertable."""
    name = "k" + uuid.uuid4().hex[:12]
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="silvia_kshim_ckpt_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    return spark.table(name), batches


def _counts(df):
    parsed = df.select(F.get_json_object(
        F.col("value").cast("string"), "$.event_type").alias("t"))
    return parsed.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))


@pytest.mark.full  # CI-mode only (suite-time budget)
def test_batch_eq_replayed_stream_multibatch(spark, tmp_path):
    """Three produce() batches replay as three micro-batches whose final
    aggregate equals the batch run over the same topic — the offline
    batch≡stream equivalence the kafka wiring never had."""
    shim = str(tmp_path)
    kafka_shim.produce(shim, "events", _messages(["click", "view", "click"]))
    kafka_shim.produce(shim, "events", _messages(["view", "view"]))
    kafka_shim.produce(shim, "events", _messages(["error"]))

    stream = factory.source(
        spark, "kafka", subscribe="events",
        startingOffsets="earliest",
        **{"kafka.bootstrap.servers": f"shim://{shim}"})
    got, batches = _run_available_now(_counts(stream), spark)
    assert batches == 3  # one micro-batch per produce() file

    want = _counts(kafka_shim.read_batch(spark, shim, "events"))
    assert (sorted((r.t, r.cnt) for r in got.collect())
            == sorted((r.t, r.cnt) for r in want.collect())
            == [("click", 2), ("error", 1), ("view", 3)])


def test_offsets_dense_and_monotone_across_produces(spark, tmp_path):
    shim = str(tmp_path)
    assert kafka_shim.produce(shim, "t", _messages(["a", "b"])) == (0, 1)
    assert kafka_shim.produce(shim, "t", _messages(["c"])) == (2, 2)
    rows = kafka_shim.read_batch(spark, shim, "t") \
        .orderBy("offset").collect()
    assert [r.offset for r in rows] == [0, 1, 2]
    assert rows[0].topic == "t" and rows[0].partition == 0
    # deterministic timestamps: base + offset seconds
    assert (rows[2].timestamp - rows[0].timestamp).total_seconds() == 2.0


@pytest.mark.full
def test_starting_offsets_json_skips_prefix(spark, tmp_path):
    shim = str(tmp_path)
    kafka_shim.produce(shim, "events", _messages(["a", "b", "c", "d", "e"]))
    stream = factory.source(
        spark, "kafka", subscribe="events",
        startingOffsets=json.dumps({"events": {"0": 2}}),
        **{"kafka.bootstrap.servers": f"shim://{shim}"})
    got, _ = _run_available_now(
        stream.select("offset"), spark, output_mode="append")
    assert sorted(r.offset for r in got.collect()) == [2, 3, 4]


@pytest.mark.full
def test_starting_offsets_latest_binds_at_build(spark, tmp_path):
    """latest must bind at stream-build time: messages produced BEFORE the
    source() call are skipped, messages produced after it are read."""
    shim = str(tmp_path)
    kafka_shim.produce(shim, "events", _messages(["old", "old"]))
    # explicit latest — the ENGINE default is earliest (factory merges
    # startingOffsets=earliest in; the first multibatch test covers it)
    stream = factory.source(
        spark, "kafka", subscribe="events", startingOffsets="latest",
        **{"kafka.bootstrap.servers": f"shim://{shim}"})
    kafka_shim.produce(shim, "events", _messages(["new", "new", "new"]))
    got, _ = _run_available_now(
        stream.select("offset"), spark, output_mode="append")
    assert sorted(r.offset for r in got.collect()) == [2, 3, 4]


def test_subscribe_pattern_matches_topic_dirs(spark, tmp_path):
    """subscribePattern: regex full-matched against the topic dirs at
    build time — matching topics union, non-matching stay out."""
    shim = str(tmp_path)
    kafka_shim.produce(shim, "events_eu", _messages(["click", "view"]))
    kafka_shim.produce(shim, "events_us", _messages(["click"]))
    kafka_shim.produce(shim, "audit", _messages(["error"]))

    stream = factory.source(
        spark, "kafka", subscribePattern=r"events_.*",
        startingOffsets="earliest",
        **{"kafka.bootstrap.servers": f"shim://{shim}"})
    got, _ = _run_available_now(_counts(stream), spark)
    assert {(r.t, r.cnt) for r in got.collect()} == {("click", 2),
                                                     ("view", 1)}


def test_subscribe_pattern_no_match_is_typed_error(spark, tmp_path):
    shim = str(tmp_path)
    kafka_shim.produce(shim, "events", _messages(["click"]))
    with pytest.raises(ValueError, match="matches no existing shim topic"):
        factory.source(
            spark, "kafka", subscribePattern=r"nope_.*",
            **{"kafka.bootstrap.servers": f"shim://{shim}"})


def test_assign_filters_to_named_partitions(spark, tmp_path):
    """assign: only the whitelisted (topic, partition) pairs flow —
    consumer.assign() semantics."""
    shim = str(tmp_path)
    kafka_shim.produce(shim, "events", _messages(["click"]), partition=0)
    kafka_shim.produce(shim, "events", _messages(["view", "view"]),
                       partition=1)
    kafka_shim.produce(shim, "events", _messages(["error"]), partition=2)
    kafka_shim.produce(shim, "other", _messages(["click"]), partition=0)

    stream = factory.source(
        spark, "kafka", assign=json.dumps({"events": [0, 1]}),
        startingOffsets="earliest",
        **{"kafka.bootstrap.servers": f"shim://{shim}"})
    got, _ = _run_available_now(_counts(stream), spark)
    assert {(r.t, r.cnt) for r in got.collect()} == {("click", 1),
                                                     ("view", 2)}


def test_two_subscription_modes_is_typed_error(spark, tmp_path):
    shim = str(tmp_path)
    kafka_shim.produce(shim, "events", _messages(["click"]))
    with pytest.raises(ValueError, match="exactly one of"):
        factory.source(
            spark, "kafka", subscribe="events",
            assign=json.dumps({"events": [0]}),
            **{"kafka.bootstrap.servers": f"shim://{shim}"})
