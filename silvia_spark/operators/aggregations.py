"""Aggregation operators — SURVEY.md §2.D (contracts D1–D9).

Spark always plans partial→final aggregation (map-side combine before the
shuffle), so every groupBy here ships only partial states across the wire —
the property that makes these hold at 100 TB. ROLLUP/CUBE/GROUPING SETS
expand in the optimizer to a single shuffle with grouping-id, not N passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silvia_spark.io import load_table, load_tables
from silvia_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from silvia_spark.registry import contract


# --- D1: TPC-H Q1 pricing summary -------------------------------------------

_D1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity", "sum_qty")},
       {sql_dsum("l_extendedprice", "sum_base_price")},
       {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       {sql_davg("l_quantity", "avg_qty")},
       {sql_davg("l_extendedprice", "avg_price")},
       {sql_davg("l_discount", "avg_disc")},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@contract("agg_pricing_summary", oracle=_D1_ORACLE)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1. One shuffle on a 6-value grouping key; all arithmetic stays
    in whole-stage codegen; date filter pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q3 composite (C1+D1+F2): shipping priority ------------------------------

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@contract("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join, revenue per order,
    top-10. Customer (filtered, dimension-sized) broadcasts; lineitem
    shuffles once on orderkey; top-k avoids the global sort."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    li = t["lineitem"].where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz"))
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- D2: exact count distinct ------------------------------------------------

_D2_ORACLE = f"""
SELECT event_type,
       count(DISTINCT user_id) AS distinct_users,
       {sql_davg("value", "avg_value")}
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("agg_count_distinct", oracle=_D2_ORACLE)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct: Spark expands to a two-stage agg (dedup on
    (event_type,user_id), then count) — correct but a full extra shuffle at
    100 TB; D3 is the cheap approximate alternative."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("distinct_users"),
             davg("value", "avg_value"))
        .orderBy("event_type")
    )


# --- D3: approximate distinct (HLL) ------------------------------------------


@contract("agg_approx_distinct")  # rows-only: HLL sketches differ by engine
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users at 2% rsd: single-pass, fixed-size sketch
    per group — the 100-TB path where exact distinct would shuffle TBs.
    Rows-only check (sketch estimates are engine-specific); the in-repo test
    asserts the estimate is within rsd bounds of the exact count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02)
             .alias("approx_users"))
        .orderBy("event_type")
    )


# --- D4: ROLLUP --------------------------------------------------------------

_D4_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS cnt,
       {sql_dsum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@contract("agg_rollup", oracle=_D4_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("l_quantity", "sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


# --- D5: CUBE ----------------------------------------------------------------

_D5_ORACLE = f"""
SELECT c_mktsegment, n_name,
       count(*) AS cust_cnt,
       {sql_dsum("c_acctbal", "sum_bal")}
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE(c_mktsegment, n_name)
ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST
"""


@contract("agg_cube", oracle=_D5_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .cube("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("cust_cnt"), dsum("c_acctbal", "sum_bal"))
        .orderBy(F.col("c_mktsegment").asc_nulls_first(),
                 F.col("n_name").asc_nulls_first())
    )


# --- D6: GROUPING SETS -------------------------------------------------------

_D6_ORACLE = f"""
SELECT p_brand, p_type,
       count(*) AS part_cnt,
       {sql_davg("p_retailprice", "avg_price")}
FROM part
GROUP BY GROUPING SETS ((p_brand), (p_type), ())
ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST
"""


@contract("agg_grouping_sets", oracle=_D6_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (the SQL-friendlier construct —
    SURVEY §3 entry point 2): by-brand, by-type, and grand-total in one
    shuffle with grouping-id expansion."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql("""
        SELECT p_brand, p_type,
               count(*) AS part_cnt,
               ((sum(CAST(round(p_retailprice * 1000000) AS BIGINT))
                 / CAST(1000000 AS DOUBLE)) / count(p_retailprice))
                 AS avg_price
        FROM part
        GROUP BY GROUPING SETS ((p_brand), (p_type), ())
        ORDER BY p_brand ASC NULLS FIRST, p_type ASC NULLS FIRST
    """)


# --- D7: HAVING --------------------------------------------------------------

_D7_ORACLE = """
SELECT o_custkey, count(*) AS order_cnt
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 15
ORDER BY order_cnt DESC, o_custkey
"""


@contract("agg_having", oracle=_D7_ORACLE)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .where(F.col("order_cnt") >= 15)
        .orderBy(F.col("order_cnt").desc(), "o_custkey")
    )


# --- D8: statistical aggregates ----------------------------------------------

_D8_ORACLE = """
SELECT o_orderpriority,
       round(min(o_totalprice), 4) AS min_price,
       round(max(o_totalprice), 4) AS max_price,
       round(stddev_samp(o_totalprice), 4) AS sd_price,
       round(var_samp(o_totalprice), 2) AS var_price,
       round(median(o_totalprice), 4) AS median_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@contract("agg_stats", oracle=_D8_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/stddev/variance/median per priority. ``F.median`` is Spark's
    exact percentile (sort-based within group); stddev/var rounded because
    the one-pass moment formulas differ across engines in last ulps."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
            F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
            F.round(F.median("o_totalprice"), 4).alias("median_price"),
        )
        .orderBy("o_orderpriority")
    )


# --- D9: sorted collect ------------------------------------------------------

_D9_ORACLE = """
SELECT n_name,
       array_to_string(list(s_name ORDER BY s_name), '|') AS suppliers,
       count(*) AS supplier_cnt
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@contract("agg_collect_sorted", oracle=_D9_ORACLE)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation sorted supplier list. collect_list is shuffle-order
    nondeterministic, so sort_array makes the result canonical — required
    for hash-matching and good hygiene at scale anyway. The list is emitted
    as a '|'-joined string: the driver's pandas canonicalizer cannot hash
    ArrayType cells (r01 TypeError), and the string carries identical
    information for the value-hash."""
    t = load_tables(spark, sf_dir, "supplier", "nation")
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("s_name"))).alias("suppliers"),
            F.count(F.lit(1)).alias("supplier_cnt"),
        )
        .orderBy("n_name")
    )


# --- D10: exact percentiles ---------------------------------------------------

_D10_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99,
       quantile_cont(l_extendedprice, 0.75)
         - quantile_cont(l_extendedprice, 0.25) AS iqr,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@contract("agg_percentiles", oracle=_D10_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation): Spark ``percentile()`` and
    DuckDB ``quantile_cont`` implement the same (n-1)p rank interpolation —
    verified bit-identical on this corpus. Exact percentile is a full sort
    per group (Spark collects per-group value buffers); the 100-TB form is
    ``percentile_approx`` (t-digest sketch, mergeable map-side) traded in
    exactly like D3's HLL swap — documented here, exact kept for the
    oracle gate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5D)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9D)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99D)").alias("p99"),
            F.expr("percentile(l_extendedprice, 0.75D)"
                   " - percentile(l_extendedprice, 0.25D)").alias("iqr"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --- D11: multi-resolution time rollup (hypertable-style) --------------------

_D11_ORACLE = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CASE WHEN GROUPING(date_trunc('hour', ts)) = 1 THEN NULL
            ELSE CAST(date_trunc('hour', ts) AS TIMESTAMP) END AS hour,
       CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS is_day_level,
       count(*) AS cnt,
       {sql_dsum("value", "sum_value")}
FROM events
GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                        (date_trunc('day', ts)))
ORDER BY day, is_day_level, hour
"""


@contract("agg_rollup_multires", oracle=_D11_ORACLE)
def agg_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly AND daily rollups of
    the event stream in ONE pass — GROUPING SETS expands to a single
    shuffle with a grouping id, not two scans. This is the batch form of
    the multi-resolution materialized rollup a time-series store keeps;
    at 100 TB the day partitions of the sink are exactly these grouping
    keys, so refresh is partition-aligned."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    hour = F.date_trunc("hour", "ts").cast("timestamp_ntz")
    g = (
        ev.select(day.alias("day"), hour.alias("hour"), "value")
        .groupingSets([["day", "hour"], ["day"]], "day", "hour")
        .agg(F.grouping("hour").cast("int").alias("is_day_level"),
             F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
    )
    return (
        g.select("day", "hour", "is_day_level", "cnt", "sum_value")
        .orderBy("day", "is_day_level", "hour")
    )


# --- Q6-style forecast revenue (composite: range filters + global agg) -------

_Q6_ORACLE = f"""
SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
       count(*) AS qualifying_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@contract("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical scan-dominated query — three range
    predicates and a global sum, no join, no grouping. The whole plan is
    one codegen stage; every predicate reaches the parquet scan
    (PushedFilters), which at 100 TB makes this query I/O-bound on
    exactly the row groups whose statistics overlap the ranges."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
             F.count(F.lit(1)).alias("qualifying_lines"))
    )


# --- Q18-style large orders (composite: agg-filter join + top-k) -------------

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 1000000) AS BIGINT)) / 1000000.0 > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {sql_dsum("l_quantity", "total_qty")}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN big ON big.l_orderkey = o_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 20
"""


@contract("q18_large_orders", oracle=_Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: aggregate-derived semi-join (orders whose line quantity
    exceeds 300) feeding a 3-table join and a top-20. The HAVING subquery
    becomes a left-semi join on the aggregated key set — lineitem is
    scanned twice but shuffled on the same key both times, and the final
    ordering is a TakeOrderedAndProject, never a global sort. Quantity
    sums ride the 1e-6 grid so the >300 cut is partition-order-exact."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"].groupBy("l_orderkey")
        .agg((F.sum(F.round(F.col("l_quantity") * 1_000_000).cast("bigint"))
              / 1_000_000.0).alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey",
              "left_semi")
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(20)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
    )


# --- D14: approximate percentiles (KLL/GK-style sketch, bounded) -------------

@contract("agg_approx_percentile")
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of order value per priority via
    ``percentile_approx`` (accuracy 10 000 → rank error ≤ 1/10 000).
    Rows-only for the driver, like D3: the sketch's chosen element is
    engine-specific, so there is no hash oracle — but the estimate is
    NOT assertion-free: tests/test_parity.py bounds every output
    between the exact p−ε and p+ε rank quantiles computed by DuckDB
    (test_approx_percentile_within_rank_bounds). 100 TB: the sketch is
    mergeable — partial per partition, merged on the driver-side final
    agg — so percentile cost is one pass and O(sketch) shuffle, the
    whole reason approx beats exact sort-based percentiles at scale."""
    o = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10_000)
    return (
        o.groupBy("o_orderpriority")
        .agg(pct.getItem(0).alias("p50"),
             pct.getItem(1).alias("p90"),
             pct.getItem(2).alias("p99"))
        .orderBy("o_orderpriority")
    )


# --- D15: equi-width histogram ------------------------------------------------

_D15_ORACLE = """
SELECT CAST(least(greatest(CAST(floor(o_totalprice / 25000) AS INT) + 1, 0),
            21) AS INT) AS bucket,
       count(*) AS cnt
FROM orders
GROUP BY bucket
ORDER BY bucket
"""


@contract("agg_histogram_width", oracle=_D15_ORACLE)
def agg_histogram_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value: 20 buckets over [0, 500k)
    via the native ``width_bucket``. The oracle replicates the bucket
    function as explicit floor math (DuckDB 1.0 has no width_bucket) —
    exact because the bucket width divides the range evenly and floor of
    an IEEE division is bit-identical in both engines; the
    least/greatest clamp replicates width_bucket's out-of-range
    semantics (underflow → 0, overflow → num_buckets+1 = 21) so a corpus
    regeneration with o_totalprice ≥ 500k (real TPC-H reaches ~555k)
    cannot silently diverge the two sides. 100 TB: histogram
    = partial-agg groupBy on a computed key; bucket count bounds the
    exchange regardless of row count — the building block behind every
    range-partitioner sampler and data-profile dashboard."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.width_bucket("o_totalprice", F.lit(0.0),
                                 F.lit(500_000.0), F.lit(20)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


# --- D16: bitwise aggregates --------------------------------------------------

_D16_ORACLE = """
SELECT event_type,
       bit_or(CAST(props ->> 'k' AS INT)) AS k_or,
       bit_and(CAST(props ->> 'k' AS INT)) AS k_and,
       bit_xor(CAST(props ->> 'k' AS INT)) AS k_xor
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("agg_bitwise", oracle=_D16_ORACLE)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise OR/AND/XOR aggregates over the JSON k attribute per event
    type — the flag-set union/intersection/parity reductions behind
    permission masks and bloom-style bitsets. All three are associative
    and commutative, so partition order cannot perturb them (XOR is the
    one people doubt; it is abelian too) — exact cross-engine by
    construction. 100 TB: partial-agg friendly single-long state per
    group, the cheapest aggregate family there is."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(F.bit_or(k).alias("k_or"),
             F.bit_and(k).alias("k_and"),
             F.bit_xor(k).alias("k_xor"))
        .orderBy("event_type")
    )


# --- D17: exact cross-engine correlation --------------------------------------

# Native corr() is single-pass with order-dependent update formulas that
# differ between engines in the last ulps — unhashable. This contract
# derives Pearson r from EXACT integer moments on the value grids
# (x = value on the 0.01 grid, y = the JSON k attribute, already integer):
# r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²)),
# every operand an exact long, then the same three double ops in the same
# order in both engines → bit-identical. Overflow headroom: (Σx)² is the
# binding term, ~10× under int64 at sf0.1 group sizes; coarsen the grid
# beyond that (documented, like E10).
_D17_ORACLE = """
WITH g AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS x,
         CAST(props ->> 'k' AS BIGINT) AS y
  FROM events
), m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM g GROUP BY event_type
)
SELECT event_type, n,
       (n * sxy - sx * sy)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_xy
FROM m
ORDER BY event_type
"""


@contract("agg_corr_exact", oracle=_D17_ORACLE)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of value vs the JSON k attribute per event
    type, computed from exact integer moments so the result is
    BIT-IDENTICAL across engines — native corr()'s streaming update
    order makes its last ulps engine-dependent and unhashable, which is
    why no one can usually oracle-check a correlation. Five long sums +
    three double ops; the moments are the same partial-agg shape as
    I11/E10. 100 TB: one exchange of six longs per group."""
    ev = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("bigint")
    y = F.get_json_object("props", "$.k").cast("bigint")
    m = (ev.select("event_type", x.alias("x"), y.alias("y"))
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                 .cast("double")
                 * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                 .cast("double"))
    return (m.select("event_type", "n", (num / den).alias("corr_xy"))
            .orderBy("event_type"))


# --- D18: boolean quantifier aggregates ---------------------------------------

_D18_ORACLE = """
SELECT event_type,
       bool_and(value > 0) AS all_positive,
       bool_or(value > 400) AS any_large,
       bool_and(user_id % 2 = 0) AS all_even_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("agg_bool_quantifiers", oracle=_D18_ORACLE)
def agg_bool_quantifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean quantifier aggregates — EVERY / SOME as data-quality
    assertions pushed into the aggregation layer ("all values positive",
    "any outlier present") instead of a second filtering pass. AND/OR
    are idempotent-associative-commutative, so partition order is
    irrelevant by construction. 100 TB: one bit of state per group per
    predicate — the natural form for per-partition validation sweeps
    whose results collapse map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.every(F.col("value") > 0).alias("all_positive"),
             F.some(F.col("value") > 400).alias("any_large"),
             F.every(F.col("user_id") % 2 == 0).alias("all_even_users"))
        .orderBy("event_type")
    )


# --- D19: FILTER-clause aggregation -------------------------------------------

_D19_ORACLE = f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       {sql_dsum("o_totalprice", "total_all")},
       (sum(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(round(o_totalprice * 1000000) AS BIGINT)
                 ELSE 0 END) / 1000000.0) AS total_finished
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@contract("agg_filtered_counts", oracle=_D19_ORACLE)
def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation — several differently-predicated aggregates
    in ONE pass over the group (SQL's FILTER clause; count_if +
    conditional grid sum on the Spark side) instead of N filtered
    scans unioned back together. 100 TB: the difference between one
    shuffle and N; every conditional rides map-side partials."""
    o = load_table(spark, sf_dir, "orders")
    fin = F.col("o_orderstatus") == "F"
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.count_if(fin).alias("n_finished"),
             dsum("o_totalprice", "total_all"),
             (F.sum(F.when(fin, F.round(F.col("o_totalprice") * 1_000_000)
                           .cast("bigint")).otherwise(F.lit(0)))
              / F.lit(1_000_000.0)).alias("total_finished"))
        .orderBy("o_orderpriority")
    )


# --- D20: deterministic string aggregation (listagg) --------------------------

_D20_ORACLE = """
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
         AS priorities,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@contract("agg_string_listagg", oracle=_D20_ORACLE)
def agg_string_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LISTAGG: the distinct priorities seen per order
    status, joined in sorted order — Spark has no string_agg, so the
    portable form is array_join(array_sort(collect_set())), and the
    EXPLICIT sort is what makes the string hashable (a bare listagg's
    concatenation order is shuffle-dependent in any engine). 100 TB:
    collect_set state is bounded by the distinct-value count, so this is
    only for low-cardinality label sets — the docstring is the guard."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",")
             .alias("priorities"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )
