"""Numeric aggregation helpers for oracle-exact results.

DOUBLE sums are partition-order sensitive in the last ulps (SURVEY.md §5.2.5)
— Spark's shuffle order varies run to run, so ``sum(double)`` can hash-
mismatch the DuckDB oracle. These helpers aggregate through DECIMAL(38,10)
(exact, order-independent), round to a declared scale, and cast back to
DOUBLE. Oracle SQL must use the matching snippet builders below so both
engines compute the identical value.

At scale this costs one extra cast per row inside codegen — negligible next
to the shuffle it sits on top of.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent double sum: sum(decimal(38,10)) → round → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, in double, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(c), scale
    ).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB oracle snippet matching ``dsum``."""
    return (
        f"CAST(round(sum(CAST(({expr}) AS DECIMAL(38,10))), {scale}) "
        f"AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    """DuckDB oracle snippet matching ``davg``."""
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(38,10))) AS DOUBLE) "
        f"/ count({expr}), {scale}) AS {alias}"
    )
