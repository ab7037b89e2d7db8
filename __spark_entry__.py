"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in the ``silvia_spark`` package; contract names map
1:1 to SURVEY.md §2 rows via silvia_spark.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from silvia_spark import registry
from silvia_spark.session import configure_session

registry.load_all_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 M0): TPC-H Q5-style 6-table star join
    on /root/testdata/sf0.001; driver checks rows>0."""
    configure_session(spark)
    return registry.QUERIES["join_5way_star"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return dict(registry.ORACLE)
