"""Numeric aggregation helpers for oracle-exact results.

DOUBLE sums are partition-order sensitive in the last ulps (SURVEY.md §5.2.5)
— Spark's shuffle order varies run to run, so ``sum(double)`` can hash-
mismatch the DuckDB oracle. These helpers make sums order-independent by
summing on a fixed 1e-6 grid as LONGs:

    sum(CAST(round(x * 1e6) AS BIGINT)) / 1e6

- round(x*1e6) is per-row IEEE-deterministic and identical in both engines
  (Spark HALF_UP and DuckDB half-away agree for the same double, and the
  result is integral so the long cast is exact);
- the long sum is exact and order-independent;
- the final division is one double op on identical operands.

Long sums beat DECIMAL(38,10) aggregation ~2.3× (decimal aggregates fall out
of the compact codegen path) and raw doubles by only ~2×. Overflow headroom:
|Σ x·1e6| < 9.2e18, i.e. ~9.2e12 in value units — fine for any per-group
aggregate here; a 100-TB global sum of large monetary values should group
first or fall back to decimal (documented in SCALE.md).

No rounding is applied AFTER aggregation: a final round() on a double is
itself a cross-engine hazard (Spark rounds the shortest-repr BigDecimal,
DuckDB the binary value — they can disagree on values sitting near a decimal
boundary). Identical inputs + identical ops need no reconciliation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GRID = 1_000_000  # 1e-6 value grid


def _as_grid(c: Column) -> Column:
    return F.round(c * GRID).cast("bigint")


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent double sum on the 1e-6 grid (scale kept for API
    compatibility; grid precision is fixed)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_as_grid(c)) / F.lit(float(GRID))).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent mean: exact grid sum, then two double divisions in
    a fixed order mirrored by ``sql_davg``."""
    c = F.col(col) if isinstance(col, str) else col
    return ((F.sum(_as_grid(c)) / F.lit(float(GRID))) / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB oracle snippet matching ``dsum``."""
    return (f"(sum(CAST(round(({expr}) * 1000000) AS BIGINT)) / 1000000.0) "
            f"AS {alias}")


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    """DuckDB oracle snippet matching ``davg``."""
    return (f"((sum(CAST(round(({expr}) * 1000000) AS BIGINT)) / 1000000.0) "
            f"/ count({expr})) AS {alias}")
