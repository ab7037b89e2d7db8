"""Projection / filter / predicate operators — SURVEY.md §2.B (B1–B5).

All pure narrow transformations: no shuffle, fully pipelined inside
whole-stage codegen, filters and column pruning pushed into the parquet scan
by Catalyst. These are the operators where the engine's job is to stay out
of the optimizer's way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silvia_spark.io import load_table
from silvia_spark.registry import contract


# --- B1: arithmetic projection ----------------------------------------------

_B1_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross
FROM lineitem
WHERE l_orderkey < 1000
ORDER BY l_orderkey, l_linenumber
"""


@contract("proj_select_alias", oracle=_B1_ORACLE)
def proj_select_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw double expressions, deliberately unrounded: per-row IEEE arithmetic
    is bit-identical across engines, whereas round()-on-double half-way
    semantics differ (Spark HALF_UP via exact BigDecimal vs DuckDB C-style)
    — rounding here would *break* the hash match, not protect it."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            net.alias("net"),
            (net * (1 + F.col("l_tax"))).alias("gross"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- B2: compound predicates -------------------------------------------------

_B2_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH')
       AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-06-30')
   OR (NOT o_orderstatus = 'F' AND o_totalprice > 400000)
ORDER BY o_orderkey
"""


@contract("filter_compound", oracle=_B2_ORACLE)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    fclause = (
        (F.col("o_orderstatus") == "F")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-06-30").cast("timestamp_ntz"),
        )
    )
    other = (~(F.col("o_orderstatus") == "F")) & (F.col("o_totalprice") > 400000)
    return (
        o.where(fclause | other)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --- B3: three-valued logic --------------------------------------------------

_B3_ORACLE = """
SELECT
  count(*) AS total_rows,
  count(nullif(l_discount, 0.0)) AS nonzero_disc_rows,
  CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_disc_rows,
  CAST(sum(CASE WHEN nullif(l_discount, 0.0) > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS big_disc_rows,
  CAST(sum(CASE WHEN NOT (nullif(l_discount, 0.0) > 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS not_big_disc_rows
FROM lineitem
"""


@contract("filter_null_semantics", oracle=_B3_ORACLE)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic: NULL > x is neither true nor false — the NOT
    bucket excludes NULLs too, so big + not_big < count(*)."""
    li = load_table(spark, sf_dir, "lineitem")
    nd = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count(nd).alias("nonzero_disc_rows"),
        F.sum(F.when(nd.isNull(), 1).otherwise(0)).alias("null_disc_rows"),
        F.sum(F.when(nd > 0.05, 1).otherwise(0)).alias("big_disc_rows"),
        F.sum(F.when(~(nd > 0.05), 1).otherwise(0)).alias("not_big_disc_rows"),
    )


# --- B4: distinct projection -------------------------------------------------

_B4_ORACLE = """
SELECT DISTINCT c_nationkey, c_mktsegment
FROM customer
ORDER BY c_nationkey, c_mktsegment
"""


@contract("proj_distinct", oracle=_B4_ORACLE)
def proj_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct = groupBy on all projected columns: partial dedup map-side,
    one shuffle on the pair key."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_mktsegment").distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --- B5: LIKE / regexp -------------------------------------------------------

_B5_ORACLE = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE 'ECON%' OR p_name LIKE '%gear'
   OR regexp_matches(p_name, '^(red|blue) [a-z]+$')
ORDER BY p_partkey
"""


@contract("filter_like_regexp", oracle=_B5_ORACLE)
def filter_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix/suffix + anchored regexp. Note dialect drift: Spark
    ``rlike`` and DuckDB ``regexp_matches`` are both substring-search
    semantics (unanchored unless ^$ given) — anchors written explicitly."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.where(F.col("p_type").like("ECON%")
                | F.col("p_name").like("%gear")
                | F.col("p_name").rlike("^(red|blue) [a-z]+$"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


# --- B6: correlated scalar subquery ------------------------------------------

# Identical SQL text runs on BOTH engines: Spark parses it through the SQL
# entry point (SURVEY.md §3 EP2) and Catalyst decorrelates the scalar
# subquery (RewriteCorrelatedScalarSubquery) into the aggregate+join the
# DataFrame form would hand-write; DuckDB runs its own decorrelation. The
# per-group mean is a grid sum (numeric.py discipline) so the comparison
# threshold is bit-identical in both engines.
_B6_SQL = """
SELECT o.o_orderpriority AS priority, count(*) AS n_above
FROM orders o
WHERE o.o_totalprice >
      (SELECT sum(CAST(round(o2.o_totalprice * 1000000) AS BIGINT))
              / 1000000.0 / count(*)
       FROM orders o2
       WHERE o2.o_orderpriority = o.o_orderpriority)
GROUP BY o.o_orderpriority
ORDER BY priority
"""


@contract("subquery_scalar", oracle=_B6_SQL)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above their priority class's
    mean price) through the SQL entry point — the oracle IS the query,
    verbatim, so the contract pins Spark's subquery decorrelation against
    an independent implementation of the same ANSI semantics. At scale
    the decorrelated plan is one partial-agg shuffle on the correlation
    key plus a broadcast-able 5-row join — no per-row re-execution."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_B6_SQL)
