"""Shared fixtures — one session-scoped SparkSession for the whole run.

Spark session startup is ~7 s; per-test sessions would dominate runtime.
local[4] with 4 shuffle partitions: small data, maximum scheduling paths
(multiple partitions exercise shuffle merge order, unlike local[1]).
"""

from __future__ import annotations

import pytest

from silvia_spark import registry
from silvia_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full streaming jobs (availableNow replay)")


@pytest.fixture(scope="session")
def spark():
    s = get_session("silvia-tests", master="local[4]", shuffle_partitions=4)
    registry.load_all_modules()
    yield s
