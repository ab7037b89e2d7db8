"""Contract registry — maps SURVEY.md §2 contract names to implementations.

Each operator module registers its queries with the ``@contract`` decorator;
``__spark_entry__.py`` exposes the aggregate dicts to the driver.

A contract entry is:
- a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first implementation)
- optionally an ANSI-SQL oracle string DuckDB runs on the same parquet views
  (omitted → the driver records a weaker rows-only check).

Alias discipline: every computed column is aliased identically in both the
DataFrame code and the oracle SQL — the driver's value-hash sorts columns by
name before hashing (SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def contract(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn
    return deco


def load_all_modules() -> None:
    """Import every operator module so registrations run. Idempotent."""
    from silvia_spark.operators import (  # noqa: F401
        scans,
        projections,
        joins,
        aggregations,
        windows,
        sorts,
        setops,
        scalars,
    )
    from silvia_spark.streaming import batch_twins, streams  # noqa: F401
    from silvia_spark.functions import llm_ops, udfs  # noqa: F401
