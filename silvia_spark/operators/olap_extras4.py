"""OLAP composites round 4 — SURVEY.md §2 M24–M28: the five TPC-H shapes
that complete the 22-query set (Q2, Q9, Q11, Q16, Q20).

The corpus has no ``partsupp`` table, so the supplier↔part relation is
DERIVED from lineitem — the distinct ``(l_partkey, l_suppkey)`` pairs a
warehouse would call the "observed supply graph" — and the per-pair cost /
quantity facts come from the same lines. Each contract documents its
adaptation; the plan shapes keep the originals' SEMANTICS while the
correlated/self-referencing parts take the repo's Q15 window form —
referencing a derived aggregate twice makes Catalyst materialize the
shared fact subtree twice (no plan-level CSE), so Q2's per-part min,
Q11's global threshold and Q20's per-part total are all WINDOWS over the
one aggregate instead of aggregate-join-backs: one fact scan each,
verified by tests/test_scale_guards.py.

Numeric discipline (functions/numeric.py): money sums ride the 1e-6
BIGINT grid; Q11's threshold compares SCALED GRID LONGS (1000·value >
total) so the cut is integer-exact in both engines; Q20's quantity
dominance compares 10·qty > 3·total on BIGINTs (quantities are integral);
Q2 outputs the raw IEEE division both engines compute identically and
never re-rounds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.functions.numeric import dsum, sql_dsum
from silvia_spark.io import load_tables, managed_persist
from silvia_spark.registry import contract

# --- M24: TPC-H Q2 — minimum-cost supplier per part ---------------------------

_M24_ORACLE = """
WITH offers AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
eu_offers AS (
  SELECT o.pk, o.sk, o.unit_cost, s.s_name, s.s_acctbal, s.n_name
  FROM offers o JOIN eu_supp s ON o.sk = s.s_suppkey
),
mn AS (SELECT pk, min(unit_cost) AS min_cost FROM eu_offers GROUP BY pk)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
       e.unit_cost AS min_cost
FROM eu_offers e
JOIN mn ON e.pk = mn.pk AND e.unit_cost = mn.min_cost
JOIN part p ON e.pk = p.p_partkey
WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@contract("q2_min_cost_supplier", oracle=_M24_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each qualifying part, the in-region supplier offering
    the minimum cost. Adaptation (no partsupp): the supply offer is the
    observed minimum unit price ``min(l_extendedprice / l_quantity)`` per
    (part, supplier) pair from lineitem. The correlated
    ``= (SELECT min(...))`` becomes a per-part min WINDOW over the offer
    aggregate with an equality filter — same fixpoint as the oracle's
    decorrelated join-back, but the fact subtree is built ONCE (a
    join-back referencing the aggregate twice is materialized twice by
    Catalyst). The equality on doubles is safe because both sides ARE
    the same double (min selects, never recombines, and the division is
    per-row IEEE); the output carries the raw double, never a re-round
    (numeric.py).

    Plan: offers = one (pk, sk) exchange over the fact; region-filtered
    suppliers broadcast onto it; one pk window exchange for the min;
    part attributes broadcast; deterministic top-100 via
    TakeOrderedAndProject over the full tie-break key."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation",
                    "region", "part")
    offers = (t["lineitem"]
              .groupBy(F.col("l_partkey").alias("pk"),
                       F.col("l_suppkey").alias("sk"))
              .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("unit_cost")))
    eu_supp = (t["supplier"]
               .join(F.broadcast(t["nation"]),
                     F.col("s_nationkey") == F.col("n_nationkey"))
               .join(F.broadcast(t["region"].where(
                   F.col("r_name") == "EUROPE")),
                     F.col("n_regionkey") == F.col("r_regionkey"))
               .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    eu_offers = offers.join(F.broadcast(eu_supp),
                            offers["sk"] == eu_supp["s_suppkey"])
    # Per-part min as a WINDOW over the offer aggregate, not an aggregate
    # joined back: referencing eu_offers twice would make Catalyst build
    # (and scan) the whole fact subtree twice — the Q15 lesson
    # (olap_extras3). One window exchange on pk replaces the join.
    mn_w = Window.partitionBy("pk")
    pq = (t["part"].where((F.col("p_size") <= 10)
                          & (F.col("p_type") == "LARGE"))
          .select("p_partkey", "p_brand"))
    return (eu_offers
            .withColumn("min_cost", F.min("unit_cost").over(mn_w))
            .where(F.col("unit_cost") == F.col("min_cost"))
            .join(F.broadcast(pq), F.col("pk") == F.col("p_partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                    F.col("unit_cost").alias("min_cost"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


# --- M25: TPC-H Q9 — product-type profit by nation and year -------------------

_M25_ORACLE = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {sql_dsum("l_extendedprice * (1 - l_discount)"
                 " - p_retailprice * l_quantity * 0.1", "profit")}
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


@contract("q9_product_profit", oracle=_M25_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on a product line by supplier nation and order
    year. Adaptation (no partsupp.ps_supplycost): unit cost is proxied as
    10% of ``p_retailprice`` — the profit expression keeps the original's
    structure (revenue minus quantity-scaled cost) and every join of the
    original EXCEPT the partsupp hop, whose (partkey, suppkey) linkage
    lineitem already carries.

    Plan: the name-filtered part, supplier and nation dims all broadcast
    onto the fact; orders joins on the one l_orderkey exchange; the
    profit expression folds into partial grid-sum aggregates map-side
    (1e-6 BIGINT grid — the per-row expression is IEEE-identical in both
    engines, the long sum order-free)."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier",
                    "nation", "orders")
    pf = t["part"].where(F.col("p_name").like("%red%")) \
        .select("p_partkey", "p_retailprice")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") * 0.1)
    return (t["lineitem"]
            .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(t["supplier"]),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(t["nation"]),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(dsum(profit, "profit"))
            .orderBy("nation", F.col("o_year").desc()))


# --- M26: TPC-H Q11 — important parts by in-nation supply value ---------------

_M26_ORACLE = """
WITH v AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS val_grid
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'
  GROUP BY l_partkey
),
tot AS (SELECT sum(val_grid) AS total_grid FROM v)
SELECT l_partkey AS partkey, (val_grid / 1000000.0) AS value
FROM v, tot
WHERE 1000 * val_grid > total_grid
ORDER BY val_grid DESC, partkey
"""


@contract("q11_important_parts", oracle=_M26_ORACLE)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose in-nation supply value exceeds a fraction of
    the nation's total. Adaptation (no partsupp availqty/supplycost):
    supply value is the lineitem revenue routed through the nation's
    suppliers. The HAVING-vs-global-scalar structure is the original's:
    per-part grid sums, with the global total as a FULL-FRAME window
    over that (dimension-sized) aggregate — Q15's one-scan pattern; a
    scalar cross join would reference the aggregate twice and recompute
    the fact subtree for the total branch. The 0.1% cut compares
    ``1000·value > total`` on the BIGINT grid so the threshold is
    integer-exact in both engines (a double multiply at the cut would be
    a knife-edge hazard for parts sitting exactly on it). Ordering on
    the grid long, not the derived double, for the same reason."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_supp = (t["supplier"]
                .join(F.broadcast(t["nation"].where(
                    F.col("n_name") == "NATION_9")),
                      F.col("s_nationkey") == F.col("n_nationkey"))
                .select("s_suppkey"))
    v = (t["lineitem"]
         .join(F.broadcast(nat_supp),
               F.col("l_suppkey") == F.col("s_suppkey"))
         .groupBy("l_partkey")
         .agg(F.sum(F.round(F.col("l_extendedprice") * 1000000)
                    .cast("bigint")).alias("val_grid")))
    # r14: global total as a SCALAR aggregate of the persisted per-part
    # frame, broadcast back as a 1-row nested-loop join (Q15's r14
    # pattern). The cache barrier keeps lineitem scanned once despite
    # the double reference (without it Catalyst recomputes the fact
    # subtree for the total branch — the measured r07 rejection); the
    # r07 full-frame window it replaces funnelled the entire part-level
    # aggregate through ONE partition (guide §2.5 — at 100 TB that is
    # |parts| rows in a single task).
    v = managed_persist(v, "q11_important_parts.v")
    total = v.agg(F.sum("val_grid").alias("total_grid"))
    return (v.join(F.broadcast(total),
                   1000 * F.col("val_grid") > F.col("total_grid"))
            .select(F.col("l_partkey").alias("partkey"),
                    (F.col("val_grid") / 1000000.0).alias("value"),
                    "val_grid")
            .orderBy(F.col("val_grid").desc(), "partkey")
            .drop("val_grid"))


# --- M27: TPC-H Q16 — supplier counts by part attribute -----------------------

_M27_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#15'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@contract("q16_supplier_part_counts", oracle=_M27_ORACLE)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many suppliers can provide parts of each
    (brand, type, size) combination, excluding a brand/type family and a
    complaint-flagged supplier set. Adaptation: the part↔supplier
    relation is the distinct (l_partkey, l_suppkey) pairs observed in
    lineitem; "customer complaints" is proxied by a negative account
    balance (disclosed — the corpus has no supplier comment text).

    Plan: the distinct-pair reduction is the only fact-sized exchange;
    the filtered part dim broadcasts onto it; the excluded suppliers
    attach as a broadcast LEFT ANTI (NOT IN with non-nullable keys);
    the final count-distinct runs partial→final over attribute-grouped
    rows. Pure integer output — no numeric reconciliation needed."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    pf = (t["part"].where((F.col("p_brand") != "Brand#15")
                          & (F.col("p_type") != "PROMO")
                          & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (pairs
            .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(bad),
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


# --- M28: TPC-H Q20 — dominant suppliers of a product line --------------------

_M28_ORACLE = """
WITH qps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(l_quantity) AS BIGINT) AS qty_ps
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
qp AS (SELECT l_partkey, sum(qty_ps) AS qty_p FROM qps GROUP BY 1),
dominant AS (
  SELECT DISTINCT qps.l_suppkey
  FROM qps JOIN qp ON qps.l_partkey = qp.l_partkey
  WHERE 10 * qps.qty_ps > 3 * qp.qty_p
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
"""


@contract("q20_dominant_suppliers", oracle=_M28_ORACLE)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in one region who dominate the supply of a
    product line in a year. Adaptation (no partsupp.ps_availqty): a
    supplier qualifies when its shipped quantity of a part exceeds 30%
    of that part's total shipped quantity in the window — the original's
    ``availqty > 0.5 × part-year demand`` correlated comparison with
    shipments standing in for stock.

    The nested IN(IN(...)) chain decorrelates to ONE aggregation plus a
    per-part sum WINDOW over it (a re-aggregate joined back would
    reference the aggregate twice and Catalyst would scan the fact
    twice), the integer dominance cut (``10·qty_ps > 3·qty_p`` on
    BIGINTs — quantities are integral, so the 30% threshold is exact),
    then ONE distinct-supplier semi-set that LEFT SEMI joins the
    region-filtered supplier dim. No fact columns survive past the
    aggregate; the semi set shuffles bare supplier ids."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier",
                    "nation", "region")
    pf = t["part"].where(F.col("p_name").like("small%")) \
        .select("p_partkey")
    qps = (t["lineitem"]
           .where((F.col("l_shipdate") >= F.lit("1997-01-01").cast(
               "timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast(
                      "timestamp")))
           .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
           .groupBy("l_partkey", "l_suppkey")
           .agg(F.sum("l_quantity").cast("bigint").alias("qty_ps")))
    # Per-part total as a WINDOW over the (part, supplier) aggregate:
    # deriving qp from qps and joining back references qps twice, and
    # Catalyst materializes the shared subtree TWICE (no plan-level CSE
    # for this shape) — two full fact scans at 100 TB. One pk-window
    # exchange over the already-aggregated pairs replaces both.
    dominant = (qps.withColumn(
                    "qty_p",
                    F.sum("qty_ps").over(Window.partitionBy("l_partkey")))
                .where(10 * F.col("qty_ps") > 3 * F.col("qty_p"))
                .select("l_suppkey").distinct())
    asia = (t["supplier"]
            .join(F.broadcast(t["nation"]),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey", "s_name", "s_acctbal"))
    return (asia.join(dominant,
                      asia["s_suppkey"] == dominant["l_suppkey"],
                      "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))
