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
