"""Set operators — SURVEY.md §2.G (G1–G4).

UNION ALL is a zero-shuffle concatenation of partitions; the distinct
variants add one shuffle on the full row. INTERSECT/EXCEPT plan as
left-semi/left-anti joins after dedup — same machinery as §2.C, same
scale behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silvia_spark.io import load_table, load_tables
from silvia_spark.registry import contract


def _hi_lo(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    hi = o.where(F.col("o_totalprice") > 300000).select("o_orderkey", "o_custkey")
    lo = o.where(F.col("o_totalprice") < 50000).select("o_orderkey", "o_custkey")
    return hi, lo


_G1_ORACLE = """
SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000
UNION ALL
SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice < 50000
ORDER BY o_orderkey
"""


@contract("set_union_all", oracle=_G1_ORACLE)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    hi, lo = _hi_lo(spark, sf_dir)
    return hi.unionByName(lo).orderBy("o_orderkey")


_G2_ORACLE = """
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_nationkey
"""


@contract("set_union_distinct", oracle=_G2_ORACLE)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_nationkey")
    return a.unionByName(b).distinct().orderBy("c_nationkey")


_G3_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY c_custkey
"""


@contract("set_intersect", oracle=_G3_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    bld = (t["customer"].where(F.col("c_mktsegment") == "BUILDING")
           .select("c_custkey"))
    urg = (t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
           .select(F.col("o_custkey").alias("c_custkey")))
    return bld.intersect(urg).orderBy("c_custkey")


_G4_ORACLE = """
SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
EXCEPT
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY o_orderkey
"""


@contract("set_except", oracle=_G4_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-value order keys minus urgent order keys (parts-never-ordered is
    empty in this corpus — every part key appears in lineitem). EXCEPT =
    dedup + left-anti join under the hood."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.where(F.col("o_totalprice") > 200000).select("o_orderkey")
    urg = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return hi.subtract(urg).orderBy("o_orderkey")


# --- G5/G6: multiset (ALL) variants ------------------------------------------

# EXCEPT ALL / INTERSECT ALL keep DUPLICATE multiplicity — min/difference
# of per-row counts, not membership — a different operator from G3/G4
# (Spark plans them as count-annotated joins via Expand, not semi/anti).
# Output is aggregated to (value, cnt) so the hash check pins the exact
# multiset, not an arbitrary row order.

_G5_ORACLE = """
SELECT o_orderpriority, count(*) AS cnt
FROM (
  SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@contract("set_except_all", oracle=_G5_ORACLE)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: per-value multiplicity max(n_left − n_right, 0) — the
    multiset difference G4's distinct EXCEPT cannot express (a value
    appearing 100× left and 1× right survives 99×, not 0×). Spark plans
    this as a count-annotated aggregate join (Expand + sum of signed
    counts), one shuffle on the value. 100 TB: state is per-DISTINCT
    value, not per row — the same partial-agg compression as any
    groupBy count."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.where(F.col("o_totalprice") > 150000).select("o_orderpriority")
    fin = o.where(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return (
        hi.exceptAll(fin)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderpriority")
    )


_G6_ORACLE = """
SELECT o_orderpriority, count(*) AS cnt
FROM (
  SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
  INTERSECT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@contract("set_intersect_all", oracle=_G6_ORACLE)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: per-value multiplicity min(n_left, n_right) — the
    multiset intersection. Same count-annotated join plan as G5; the
    (value, cnt) aggregate output makes the hash check exact on the
    multiset instead of depending on which physical duplicates
    survive."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.where(F.col("o_totalprice") > 150000).select("o_orderpriority")
    fin = o.where(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return (
        hi.intersectAll(fin)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderpriority")
    )
