"""Source-factory config-path tests, including the Kafka branch NO broker
(or kafka connector jar) can exercise here: a recording fake stands in for
spark.readStream, so the options the factory would hand the real reader
are pinned exactly — the production config path can't rot unnoticed.
(silvia's real upstream is a Kafka-shaped event feed; the factory keeps
that branch config-not-code, and THIS is its executable spec.)"""

from __future__ import annotations

import pytest

from silvia_spark.sources import factory


class _FakeReader:
    def __init__(self, calls):
        self.calls = calls

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def option(self, k, v):
        self.calls.setdefault("options", {})[k] = v
        return self

    def schema(self, s):
        self.calls["schema"] = s
        return self

    def load(self, *a):
        self.calls["loaded"] = True
        return self  # stands in for the DataFrame


class _FakeSpark:
    """Duck-types the two attributes factory.source touches."""

    def __init__(self):
        self.calls = {}
        self._silvia_configured = True  # short-circuits configure_session

    @property
    def readStream(self):
        return _FakeReader(self.calls)


def test_kafka_reader_options_pinned():
    fake = _FakeSpark()
    factory.source(
        fake, "kafka",  # type: ignore[arg-type]
        subscribe="events",
        **{"kafka.bootstrap.servers": "broker-1:9092,broker-2:9092"})
    assert fake.calls["format"] == "kafka"
    assert fake.calls["loaded"]
    assert fake.calls["options"] == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "events",
        # engine defaults: replay retained history on first start; a
        # retention gap is a monitoring event, not a query killer
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }


def test_kafka_caller_overrides_defaults():
    fake = _FakeSpark()
    factory.source(
        fake, "kafka",  # type: ignore[arg-type]
        subscribePattern="events-.*",
        startingOffsets="latest", failOnDataLoss="true",
        **{"kafka.bootstrap.servers": "b:9092"})
    assert fake.calls["options"]["startingOffsets"] == "latest"
    assert fake.calls["options"]["failOnDataLoss"] == "true"
    assert fake.calls["options"]["subscribePattern"] == "events-.*"


def test_kafka_missing_bootstrap_fails_fast():
    with pytest.raises(ValueError, match="bootstrap"):
        factory.source(_FakeSpark(), "kafka", subscribe="t")  # type: ignore


def test_kafka_missing_subscription_fails_fast():
    with pytest.raises(ValueError, match="subscribe"):
        factory.source(_FakeSpark(), "kafka",  # type: ignore[arg-type]
                       **{"kafka.bootstrap.servers": "b:9092"})


def test_unknown_kind_rejected():
    with pytest.raises(ValueError, match="unknown source kind"):
        factory.source(_FakeSpark(), "pulsar")  # type: ignore[arg-type]


# --- A17: the Python DataSource writer's commit protocol ----------------------


def test_jsonl_sink_manifest_hides_orphans(tmp_path):
    """A data file NOT listed in the manifest (failed/duplicate task
    attempt, or garbage) must be invisible to the reader half."""
    import json
    import os

    from silvia_spark.sources import jsonl_sink

    out = str(tmp_path / "sink")
    os.makedirs(out)
    with open(os.path.join(out, "part-committed.jsonl"), "w") as f:
        f.write(json.dumps({"k": 1}) + "\n")
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write(json.dumps({"k": 999}) + "\n")
    with open(os.path.join(out, "_MANIFEST"), "w") as f:
        json.dump({"files": ["part-committed.jsonl"], "rows": 1}, f)

    files = jsonl_sink.committed_files(out)
    assert files == [os.path.join(out, "part-committed.jsonl")]


def test_jsonl_sink_end_to_end_commit(spark, tmp_path):
    """Real write through the registered sink: every task file appears in
    the manifest, row counts agree, and the readback equals the input."""
    import json
    import os

    from silvia_spark.sources.jsonl_sink import (JsonLinesSinkDataSource,
                                                 committed_files)

    spark.dataSource.register(JsonLinesSinkDataSource)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id BIGINT, s STRING")
    out = str(tmp_path / "sink")
    (df.repartition(3).write.format("silvia_jsonl")
     .option("path", out).mode("append").save())

    with open(os.path.join(out, "_MANIFEST")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 10
    assert len(manifest["files"]) == 3
    back = spark.read.schema("id BIGINT, s STRING").json(
        committed_files(out))
    assert sorted((r.id, r.s) for r in back.collect()) == \
        [(i, f"v{i}") for i in range(10)]


def test_jsonl_sink_second_append_keeps_first_batch(spark, tmp_path):
    """mode('append') must MEAN append: a second commit merges the
    manifest instead of replacing it, so the first batch's committed
    files stay visible."""
    from silvia_spark.sources.jsonl_sink import (JsonLinesSinkDataSource,
                                                 committed_files)

    spark.dataSource.register(JsonLinesSinkDataSource)
    out = str(tmp_path / "sink")
    for lo, hi in ((0, 5), (5, 10)):
        (spark.createDataFrame([(i,) for i in range(lo, hi)], "id BIGINT")
         .coalesce(1).write.format("silvia_jsonl")
         .option("path", out).mode("append").save())
    back = spark.read.schema("id BIGINT").json(committed_files(out))
    assert sorted(r.id for r in back.collect()) == list(range(10))
