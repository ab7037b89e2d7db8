"""Sort / limit / top-k operators — SURVEY.md §2.F (F1–F3).

Scale notes: a global orderBy is a range-partitioned shuffle (sampled
boundaries) — fine once per query output. orderBy+limit never does that:
Catalyst plans TakeOrderedAndProject (per-partition top-k heap, then k·p
merge on the driver), so F2 is cheap even on a 100-TB fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silvia_spark.io import load_table
from silvia_spark.registry import contract


# --- F1: multi-key sort with NULL placement ----------------------------------

_F1_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       nullif(o_orderpriority, '5-LOW') AS prio,
       o_totalprice
FROM orders
WHERE o_orderkey < 3000
ORDER BY prio ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
"""


@contract("sort_multikey_nulls", oracle=_F1_ORACLE)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 3000)
    return (
        o.select(
            "o_orderkey", "o_orderstatus",
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("prio"),
            "o_totalprice",
        )
        .orderBy(F.col("prio").asc_nulls_first(),
                 F.col("o_totalprice").desc(),
                 F.col("o_orderkey").asc())
    )


# --- F2: top-k ---------------------------------------------------------------

_F2_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
"""


@contract("topk_limit", oracle=_F2_ORACLE)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 with deterministic tiebreak. Plans as TakeOrderedAndProject —
    no global sort shuffle; verified via .explain in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# --- F3: limit + offset ------------------------------------------------------

_F3_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100 OFFSET 100
"""


@contract("limit_offset", oracle=_F3_ORACLE)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows 101–200 of the sorted stream. offset+limit collapses into one
    driver-side take of offset+limit rows — acceptable for page-sized
    offsets; deep pagination at scale should keyset-paginate instead
    (WHERE sortkey < last_seen), which stays a pushed filter."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(100)
        .limit(100)
    )
