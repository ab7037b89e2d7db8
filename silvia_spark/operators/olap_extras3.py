"""OLAP composites round 3 — SURVEY.md §2 M11–M16.

Six more TPC-H-class query shapes (adapted to the corpus's trimmed
columns — no l_commitdate/l_receiptdate, so Q21's "kept waiting" is
lateness relative to the order date; the correlation structure is the
original's). Together they cover the remaining classic plan shapes the
first two OLAP batches didn't: symmetric nation-pair disjunction (Q7),
conditional market-share over a 7-table star (Q8), outer-join histogram
(Q13), argmax-vs-aggregate scalar subquery (Q15), per-group correlated
scalar threshold (Q17), and the EXISTS / NOT-EXISTS double correlation
(Q21).

Numeric discipline: every revenue aggregate rides the 1e-6 grid
(silvia_spark.functions.numeric) so both engines sum exact longs;
ratio-shaped outputs stay as (numerator, denominator) column pairs —
callers divide, contracts don't (double-division hazard, numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.functions.numeric import dsum, sql_dsum
from silvia_spark.io import load_tables, managed_persist
from silvia_spark.registry import contract

# --- M11: TPC-H Q7 — volume shipping between two nations ----------------------

_M11_ORACLE = f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       year(l_shipdate) AS ship_year,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY cust_nation, supp_nation, ship_year
"""


@contract("q7_volume_shipping", oracle=_M11_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between a symmetric pair of nations per
    ship year. The nation table joins TWICE (customer side and supplier
    side) — both as broadcasts, aliased so the pair disjunction
    ((A,B) or (B,A)) evaluates on the joined row. The fact table
    shuffles once on l_orderkey; the nation-pair filter cannot prune
    either scan alone (it spans both dims), so the contract checks that
    the two broadcast probes still each prune to the 2-nation subset via
    the per-side implied filter n_name IN (A, B), which Catalyst derives
    from the disjunction. 100 TB: two-broadcast double-dim joins are the
    canonical star pattern; nothing here scales with more than the
    date-sliced fact."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer",
                    "supplier", "nation")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"),
                            F.col("n_name").alias("cust_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("supp_nation"))
    pair = (
        ((F.col("cust_nation") == "NATION_1")
         & (F.col("supp_nation") == "NATION_2"))
        | ((F.col("cust_nation") == "NATION_2")
           & (F.col("supp_nation") == "NATION_1"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("cust_nation", "supp_nation",
                 F.year("l_shipdate").alias("ship_year"))
        .agg(dsum(rev, "revenue"))
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


# --- M12: TPC-H Q8 — national market share ------------------------------------

_M12_ORACLE = f"""
SELECT year(o_orderdate) AS o_year,
       {sql_dsum("CASE WHEN n2.n_name = 'NATION_3' "
                 "THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
                 "nation_revenue")},
       {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


@contract("q8_market_share", oracle=_M12_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: the target nation's share of ASIA customers' STANDARD-
    part purchases per order year — the widest star in the suite
    (7 tables: fact + 6 broadcast dims, nation twice). The market-share
    CASE rides INSIDE the grid sum so both engines aggregate identical
    longs; the share itself stays a (nation_revenue, total_revenue)
    pair. Catalyst prunes the part broadcast to one p_type and the
    customer-side nation broadcast through the region filter before any
    probe. 100 TB: one fact shuffle on l_orderkey against the date-
    sliced orders; all six dim probes are map-side."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "orders", "customer",
                    "supplier", "nation", "region")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"),
                            F.col("n_regionkey").alias("n1_regionkey"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].where(F.col("p_type") == "STANDARD")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n1_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(dsum(nat, "nation_revenue"), dsum(rev, "total_revenue"))
        .orderBy("o_year")
    )


# --- M13: TPC-H Q13 — customer order-count distribution -----------------------

_M13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS order_cnt
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT order_cnt, count(*) AS cust_cnt
FROM per_cust
GROUP BY order_cnt
ORDER BY cust_cnt DESC, order_cnt DESC
"""


@contract("q13_order_distribution", oracle=_M13_ORACLE)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the distribution of non-urgent order counts per
    customer — a histogram OVER an aggregate. The outer join keeps
    order-less customers (order_cnt 0, count(o_orderkey) skips the null
    fill), and the non-join predicate lives in the JOIN condition, not
    WHERE — moving it to WHERE would silently drop the zero bucket, the
    classic outer-join rewrite bug this contract pins. 100 TB: first
    aggregate shuffles on c_custkey (same key as the join — one
    exchange serves both), second input is one row per customer,
    third is ~tens of buckets; the histogram is map-side."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"].join(
            t["orders"].where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )
    return (
        per_cust.groupBy("order_cnt")
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
        .orderBy(F.col("cust_cnt").desc(), F.col("order_cnt").desc())
    )


# --- M14: TPC-H Q15 — top supplier(s) by quarter revenue ----------------------

_M14_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey,
         {sql_dsum("l_extendedprice * (1 - l_discount)", "total_rev")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""


@contract("q15_top_supplier", oracle=_M14_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose quarter revenue EQUALS the
    maximum — argmax against an aggregate, not a top-1 sort (ties must
    all surface). The equality compare is only sound because both
    engines derive total_rev from the same exact long grid sum
    (numeric.py) — with naive double sums this contract would flap.
    r14: the max is a SCALAR aggregate of the persisted per-supplier
    revenue, broadcast back as a 1-row equality join. Lineitem is still
    scanned and aggregated exactly ONCE (the cache barrier is what makes
    the double reference safe — without it Catalyst recomputes the whole
    fact subtree for the max branch, the measured r07 rejection; AQE
    plans the branches as separate stages so ReusedExchange never fires,
    re-verified r14). This replaces the r07 full-frame window, which
    funnelled the ENTIRE supplier-level aggregate through a single
    partition (guide §2.5: at 100 TB that is |suppliers| rows in one
    task); the scalar agg is a partial→final tree with no single-
    partition stage, and the warm sweep also drops 53 → 39 ms at sf0.1.
    100 TB: the fact-side work is the one suppkey shuffle; everything
    after it is sized by |suppliers| and cached once per invocation
    (io.managed_persist slot, supplier-count × 16 B)."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = managed_persist(
        t["lineitem"]
        .where((F.col("l_shipdate")
                >= F.lit("1997-01-01").cast("timestamp_ntz"))
               & (F.col("l_shipdate")
                  < F.lit("1997-04-01").cast("timestamp_ntz")))
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "total_rev")),
        "q15_top_supplier.rev")
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# --- M15: TPC-H Q17 — small-quantity-order revenue ----------------------------

_M15_ORACLE = f"""
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'
), li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
), thresh AS (
  SELECT l_partkey, 0.2 * (sum(CAST(round(l_quantity * 1000000) AS BIGINT))
                           / 1000000.0 / count(*)) AS qty_cut
  FROM li GROUP BY l_partkey
)
SELECT count(*) AS small_lines,
       {sql_dsum("l_extendedprice", "small_revenue")}
FROM li JOIN thresh USING (l_partkey)
WHERE l_quantity < qty_cut
"""


@contract("q17_small_quantity", oracle=_M15_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: lines of one brand's parts whose quantity falls under
    20% of that part's own average quantity — a correlated scalar
    subquery PER GROUP, decorrelated into a per-part aggregate joined
    back to the same slice. The brand filter applies BEFORE the average
    (a part's lineitems are all retained — brand is a part attribute,
    so the per-part mean over the slice equals the mean over the full
    table). The threshold math (exact grid sum → one division → one
    0.2 multiply) runs in the same order in both engines. 100 TB: the
    brand slice shuffles once on l_partkey, and the per-part mean is a
    WINDOW over that one exchange — the aggregate-join-back form
    referenced the slice twice and Catalyst materialized (and scanned)
    the fact subtree twice; TPC-H's per-row subquery never exists."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = (
        t["lineitem"]
        .join(F.broadcast(t["part"].where(F.col("p_brand") == "Brand#23")
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    w = Window.partitionBy("l_partkey")
    qty_cut = (F.lit(0.2)
               * (F.sum(F.round(F.col("l_quantity") * 1_000_000)
                        .cast("bigint")).over(w) / F.lit(1_000_000.0)
                  / F.count(F.lit(1)).over(w)))
    return (
        li.withColumn("qty_cut", qty_cut)
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.count(F.lit(1)).alias("small_lines"),
             dsum("l_extendedprice", "small_revenue"))
    )


# --- M16: TPC-H Q21 — sole late supplier on multi-supplier orders -------------

_M16_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders o    ON o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@contract("q21_waiting_orders", oracle=_M16_ORACLE)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the ONLY late supplier on a multi-
    supplier finished order (lateness = shipped > 60 days after order
    date; the corpus has no commit/receipt dates, the EXISTS / NOT
    EXISTS correlation is the original's). The double correlation
    decorrelates into ONE window pass over the orderkey-joined fact:
    per order, count distinct suppliers and distinct LATE suppliers —
    a late line survives iff suppliers > 1 and late-suppliers == 1.
    That turns two correlated semi/anti probes of lineitem into a
    single shuffle the join already paid for. Deterministic LIMIT:
    (numwait DESC, s_name) totally orders ties. 100 TB: one l_orderkey
    exchange feeds join + both window aggregates; the alternative
    triple-scan of lineitem never happens."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    lo = (
        t["lineitem"]
        .join(t["orders"].where(F.col("o_orderstatus") == "F"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    )
    w = Window.partitionBy("l_orderkey")
    per_order = (
        lo.withColumn("n_supp",
                      F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(
                F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)))
    )
    return (
        per_order
        .where(F.col("is_late") & (F.col("n_supp") > 1)
               & (F.col("n_late_supp") == 1))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --- M18: TPC-H Q12 — priority counts per line class --------------------------

_M18_ORACLE = """
SELECT l_returnflag AS line_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_returnflag IN ('A', 'R')
GROUP BY l_returnflag
ORDER BY line_class
"""


@contract("q12_shipmode_priority", oracle=_M18_ORACLE)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line class (returnflag stands in for the
    corpus's missing l_shipmode), how many lines belong to high- vs
    low-priority orders — the canonical pivot-by-CASE inside a join
    aggregate. With this row every TPC-H query expressible over the
    corpus's tables (no partsupp, no shipmode/commitdate columns) has a
    contract: Q1,3,4,5,6,7,8,10,12,13,14,15,17,18,19,21,22. 100 TB: the
    date-sliced fact shuffles once on orderkey; the CASE counts collapse
    map-side into two longs per class."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & F.col("l_returnflag").isin("A", "R"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("line_class"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("line_class")
    )
