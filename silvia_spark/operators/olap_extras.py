"""OLAP composites round 2 — SURVEY.md §2 M6–M10 + D12.

Five more TPC-H-class query shapes (adapted to the corpus's trimmed
columns — no l_shipmode/l_commitdate/c_phone, so Q4/Q19/Q22 use the
equivalent predicate structure over the columns that exist) plus a
deterministic mode aggregate:

- M6 ``q5_local_supplier`` — TPC-H Q5: 6-table join (lineitem, orders,
  customer, supplier, nation, region) with the c_nationkey = s_nationkey
  co-location constraint; revenue by nation for one region-year.
- M7 ``q4_order_priority`` — TPC-H Q4 shape: EXISTS semi-join with a
  non-equi correlation (late-shipped lineitem), order counts by priority.
- M8 ``q14_promo_revenue`` — TPC-H Q14 shape: conditional-aggregate
  ratio (promo revenue share) per month of one year.
- M9 ``q19_disjunctive`` — TPC-H Q19 shape: OR-of-ANDs band predicate
  across the join (brand × size × quantity), one-row revenue summary.
- M10 ``q22_dormant_customers`` — TPC-H Q22 shape: uncorrelated scalar
  subquery threshold + anti-join against recent orders, per-segment
  accounting of dormant high-balance customers.
- D12 ``agg_mode_frequent`` — deterministic MODE: per customer segment,
  the most frequent order priority of its customers' orders with an
  explicit (count desc, value asc) tiebreak so the answer is unique and
  engine-independent (bare ``mode()``'s tie choice is not portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.functions.numeric import dsum, sql_dsum
from silvia_spark.io import load_table, load_tables
from silvia_spark.registry import contract

# --- M6: TPC-H Q5 — local supplier volume ------------------------------------

_M6_ORACLE = f"""
SELECT n_name,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@contract("q5_local_supplier", oracle=_M6_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where the customer and the line's
    supplier share a nation, one region, one year. The fact table
    shuffles ONCE (on l_orderkey, against date-filtered orders); every
    other input is a broadcast dim — including the c_nationkey =
    s_nationkey constraint, which rides the supplier broadcast as a
    second equi-key instead of forcing a nationkey shuffle. 100 TB:
    customer is the one dim that can outgrow broadcast; AQE demotes that
    join to shuffled-hash on the already-partitioned orderkey stream
    without touching this plan declaration."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem",
                    "supplier", "nation", "region")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --- M7: TPC-H Q4 — order priority checking ----------------------------------

_M7_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@contract("q4_order_priority", oracle=_M7_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one
    late-shipped line (shipped > 90 days after order date — the corpus
    has no commitdate/receiptdate, so lateness is relative to the order
    date; the EXISTS structure is Q4's). The non-equi correlation rides
    a LEFT SEMI join keyed on l_orderkey: one shuffle of the
    quarter-filtered orders against lineitem, existence short-circuits
    per key, no row multiplication ever reaches the aggregate. 100 TB:
    semi-join emits each order at most once, so the agg input is bounded
    by the orders slice, not by lineitem fan-out."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz")))
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
    return (
        orders.join(t["lineitem"], late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- M8: TPC-H Q14 — promotion effect ----------------------------------------

_M8_ORACLE = f"""
SELECT month(l_shipdate) AS ship_month,
       {sql_dsum("CASE WHEN p_type = 'PROMO' "
                 "THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
                 "promo_revenue")},
       {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY month(l_shipdate)
ORDER BY ship_month
"""


@contract("q14_promo_revenue", oracle=_M8_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo vs total revenue per ship month of one
    year (conditional aggregation — the CASE rides INSIDE the grid sum,
    so both engines sum exactly the same integers). part is a broadcast
    dim keyed on p_partkey; lineitem never shuffles before the 12-group
    aggregate, whose partials collapse map-side. The promo share is left
    as the two exact sums rather than a post-aggregate division: callers
    divide, and the contract stays free of the double-division rounding
    hazard (numeric.py)."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(t["part"]),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(dsum(promo, "promo_revenue"), dsum(rev, "total_revenue"))
        .orderBy("ship_month")
    )


# --- M9: TPC-H Q19 — disjunctive band predicate ------------------------------

_M9_ORACLE = f"""
SELECT count(*) AS matched_lines,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@contract("q19_disjunctive", oracle=_M9_ORACLE)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs band predicate spanning both join
    sides (brand × size × quantity). Catalyst splits the disjunction:
    the part-only factor (brand ∈ {12,23,34}, size ≤ 15) prunes the
    broadcast build side and the quantity range prunes the probe scan
    BEFORE the join — the cross-side residual evaluates on the joined
    row. The plan's PushedFilters on both scans is the point of the
    contract; a naive engine evaluates the whole disjunction post-join.
    One-row output keeps the hash check on the aggregate, not row sets."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]),
              F.col("l_partkey") == F.col("p_partkey"))
        .where(band)
        .agg(F.count(F.lit(1)).alias("matched_lines"), dsum(rev, "revenue"))
    )


# --- M10: TPC-H Q22 — dormant high-balance customers -------------------------

# Threshold = mean positive balance on the 1e-6 grid (numeric.py): the
# exact long sum divides once per engine, so both compare against the
# bit-identical double.
_M10_ORACLE = f"""
WITH thresh AS (
  SELECT sum(CAST(round(c_acctbal * 1000000) AS BIGINT)) / 1000000.0
         / count(*) AS cutoff
  FROM customer WHERE c_acctbal > 0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1999-07-01'
)
SELECT c_mktsegment, count(*) AS dormant_cnt,
       {sql_dsum("c_acctbal", "dormant_bal")}
FROM customer, thresh
WHERE c_acctbal > cutoff
  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@contract("q22_dormant_customers", oracle=_M10_ORACLE)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers holding above-average positive balance
    with NO order in the trailing window (the corpus has no c_phone, so
    the country-code filter becomes the recency filter; the
    scalar-subquery + anti-join structure is Q22's). The threshold is a
    1-row broadcast crossJoin (no driver round-trip, stays one job);
    dormancy is a LEFT ANTI join against the date-filtered DISTINCT
    custkeys. 100 TB: the anti-join build side is distinct ids of recent
    buyers — orders of magnitude under the customer table and the only
    shuffled input; customer itself aggregates map-side per segment."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    cutoff = (t["customer"].where(F.col("c_acctbal") > 0)
              .agg(((F.sum(F.round(F.col("c_acctbal") * 1_000_000)
                           .cast("bigint")) / F.lit(1_000_000.0))
                    / F.count(F.lit(1))).alias("cutoff")))
    recent = (t["orders"]
              .where(F.col("o_orderdate")
                     >= F.lit("1999-07-01").cast("timestamp_ntz"))
              .select("o_custkey").distinct())
    return (
        t["customer"].crossJoin(F.broadcast(cutoff))
        .where(F.col("c_acctbal") > F.col("cutoff"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("dormant_cnt"),
             dsum("c_acctbal", "dormant_bal"))
        .orderBy("c_mktsegment")
    )


# --- D12: deterministic mode (most frequent value per group) -----------------

_D12_ORACLE = """
WITH freq AS (
  SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY count(*) DESC, o_orderpriority) AS rn
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment, o_orderpriority
)
SELECT c_mktsegment, o_orderpriority AS modal_priority, cnt AS modal_cnt
FROM freq WHERE rn = 1
ORDER BY c_mktsegment
"""


@contract("agg_mode_frequent", oracle=_D12_ORACLE)
def agg_mode_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: the most frequent order priority per
    customer segment. Built as count-then-rank (groupBy → 1-partition-key
    window → rn=1) instead of the native ``mode()`` aggregate because
    mode's tie choice is engine-arbitrary — the explicit (count DESC,
    value ASC) tiebreak makes the answer unique, so the contract is
    hash-checkable and rerun-stable. 100 TB: the heavy reduction is the
    partial-agg groupBy (segment × priority ≈ 25 groups); the window
    sees only those 25 rows — mode at scale is an aggregate problem,
    never a sort-all-rows problem."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    freq = (
        t["orders"]
        .join(F.broadcast(t["customer"]),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rn = F.row_number().over(
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("cnt").desc(), "o_orderpriority"))
    return (
        freq.withColumn("rn", rn).where(F.col("rn") == 1)
        .select("c_mktsegment",
                F.col("o_orderpriority").alias("modal_priority"),
                F.col("cnt").alias("modal_cnt"))
        .orderBy("c_mktsegment")
    )
