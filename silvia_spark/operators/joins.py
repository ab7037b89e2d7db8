"""Join operators — SURVEY.md §2.C (contracts C1–C11).

Spark-first design: every join is declared with the DataFrame API and left to
Catalyst + AQE for physical strategy; explicit ``F.broadcast`` marks the
dimension sides that are always small relative to the fact table (region 5
rows, nation 25, supplier/part dimension-scale) so a 1000-executor plan never
shuffles the fact table for them. The two ops Spark lacks natively (as-of
join C9, banded range join C8) are compositions: equi-join on a derived
bucket/band key + window dedup — both shuffle on a real key instead of
falling into a broadcast-nested-loop cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.io import load_table, load_tables
from silvia_spark.functions.numeric import dsum, sql_dsum
from silvia_spark.registry import contract


# --- C10 flagship: TPC-H Q5-style star join ---------------------------------

_Q5_ORACLE = f"""
SELECT n_name,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@contract("join_5way_star", oracle=_Q5_ORACLE)
def join_5way_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table star join with region filter (TPC-H Q5 shape).

    Scale notes: lineitem (the 100-TB fact) shuffles only twice — on
    o_orderkey to meet orders⋈customer and on nothing else: supplier,
    nation, region are broadcast, so the region filter prunes via the
    broadcast hash sides. AQE would pick broadcast for these anyway at
    runtime; the hints make the plan deterministic.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem",
                    "supplier", "nation", "region")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    asia_nations = (
        t["nation"].join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --- C1 inner equi-join ------------------------------------------------------

_C1_ORACLE = f"""
SELECT c_mktsegment,
       count(*) AS order_cnt,
       {sql_dsum("o_totalprice", "segment_value")}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@contract("join_inner_equi", oracle=_C1_ORACLE)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer on custkey; shuffle/sort-merge at scale (both sides
    large), AQE free to switch to broadcast when customer fits."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    return (
        t["orders"].join(t["customer"],
                         F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("order_cnt"),
             dsum("o_totalprice", "segment_value"))
        .orderBy("c_mktsegment")
    )


# --- C2 broadcast dimension join --------------------------------------------

_C2_ORACLE = f"""
SELECT p_brand,
       count(*) AS li_cnt,
       {sql_dsum("l_extendedprice", "brand_revenue")}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 20
GROUP BY p_brand
ORDER BY p_brand
"""


@contract("join_broadcast", oracle=_C2_ORACLE)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): no shuffle of lineitem at all — the 100-TB-scale
    pattern for dimension enrichment."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    part = t["part"].where(F.col("p_size") <= 20)
    return (
        t["lineitem"].join(F.broadcast(part),
                           F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("li_cnt"),
             dsum("l_extendedprice", "brand_revenue"))
        .orderBy("p_brand")
    )


# --- C3 left outer -----------------------------------------------------------

_C3_ORACLE = """
SELECT c_custkey, count(o_orderkey) AS order_cnt
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY order_cnt DESC, c_custkey
LIMIT 500
"""


@contract("join_left_outer", oracle=_C3_ORACLE)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"].join(t["orders"],
                           F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
        .orderBy(F.col("order_cnt").desc(), "c_custkey")
        .limit(500)
    )


# --- C4 full outer -----------------------------------------------------------

_C4_ORACLE = """
SELECT s.s_suppkey, s.s_name, n.n_nationkey, n.n_name
FROM supplier s
FULL JOIN (SELECT * FROM nation WHERE n_nationkey < 10) n
  ON s.s_nationkey = n.n_nationkey
ORDER BY s.s_suppkey NULLS FIRST, n.n_nationkey NULLS FIRST
"""


@contract("join_full_outer", oracle=_C4_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer on partial key overlap: suppliers of nations ≥10 keep a NULL
    nation side; nations <10 with no supplier keep a NULL supplier side."""
    t = load_tables(spark, sf_dir, "supplier", "nation")
    nation = t["nation"].where(F.col("n_nationkey") < 10)
    return (
        t["supplier"]
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"), "full")
        .select("s_suppkey", "s_name", "n_nationkey", "n_name")
        .orderBy(F.col("s_suppkey").asc_nulls_first(),
                 F.col("n_nationkey").asc_nulls_first())
    )


# --- C5 left semi ------------------------------------------------------------

_C5_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


@contract("join_left_semi", oracle=_C5_ORACLE)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having ≥1 URGENT order; semi-join never duplicates the left
    side, so no post-distinct and no wide shuffle of order payload columns."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- C6 left anti ------------------------------------------------------------

_C6_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


@contract("join_left_anti", oracle=_C6_ORACLE)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order (complement of C5; every customer has
    *some* order in this corpus, so plain no-orders would be empty)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- C7 cross join -----------------------------------------------------------

_C7_ORACLE = """
SELECT r_name, n_name
FROM region CROSS JOIN nation
WHERE r_regionkey <> n_regionkey
ORDER BY r_name, n_name
"""


@contract("join_cross", oracle=_C7_ORACLE)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny × tiny cross product with post-filter. Only legitimate on
    dimension-scale inputs; the engine never cross-joins a fact table."""
    t = load_tables(spark, sf_dir, "region", "nation")
    return (
        t["region"].crossJoin(t["nation"])
        .where(F.col("r_regionkey") != F.col("n_regionkey"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


# --- C8 banded/theta range join ---------------------------------------------

_C8_ORACLE = """
SELECT p_brand, count(*) AS pair_cnt
FROM part JOIN lineitem
  ON l_partkey = p_partkey
 AND l_quantity BETWEEN p_size - 2 AND p_size + 2
GROUP BY p_brand
ORDER BY p_brand
"""


@contract("join_theta_range", oracle=_C8_ORACLE)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + band predicate. The equi key (partkey) carries the shuffle; the
    band is a residual filter on the hash-join output — Catalyst plans this
    as a hash join with extra condition, never a nested-loop. A pure banded
    join with no equi key would instead bucketize the band (floor(x/w))
    and explode each probe row to adjacent buckets."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    return (
        t["lineitem"].join(
            F.broadcast(t["part"]),
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_quantity") >= F.col("p_size") - 2)
            & (F.col("l_quantity") <= F.col("p_size") + 2),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .orderBy("p_brand")
    )


# --- C9 as-of join -----------------------------------------------------------

# Explicit arg-max oracle rather than DuckDB's ASOF JOIN: ASOF's tie-break
# among equal o_orderdate values is unspecified, so both sides pin the same
# (o_orderdate DESC, o_orderkey DESC) order — deterministic at every scale.
_C9_ORACLE = """
WITH ev AS (
  SELECT event_id, ts, user_id % 1000 AS bucket
  FROM events WHERE event_id < 20
),
j AS (
  SELECT ev.event_id, ev.bucket, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY ev.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
           AS rn
  FROM ev
  LEFT JOIN (SELECT o_orderkey, o_orderdate, o_custkey % 1000 AS bucket
             FROM orders) o
    ON ev.bucket = o.bucket AND o.o_orderdate <= ev.ts
)
SELECT event_id, bucket,
       o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
FROM j WHERE rn = 1
ORDER BY event_id
"""


@contract("join_asof", oracle=_C9_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event, per bucket.

    Spark has no native ASOF JOIN; the composition is equi-join on the
    bucket key + time filter + per-left-row ``row_number()=1`` on
    (o_orderdate DESC, o_orderkey DESC). The oracle uses the identical
    explicit arg-max (not DuckDB's ASOF JOIN, whose tie-break among equal
    dates is unspecified) so both engines pin the same winner. LEFT join so
    unmatched events survive. At 100 TB: both sides shuffle once on the
    bucket key; the window sort is per-event (tiny groups), not global.
    """
    t = load_tables(spark, sf_dir, "events", "orders")
    ev = (
        t["events"].where(F.col("event_id") < 20)
        .select("event_id", "ts", (F.col("user_id") % 1000).alias("bucket"))
    )
    orders = t["orders"].select(
        "o_orderkey", "o_orderdate",
        (F.col("o_custkey") % 1000).alias("obucket"),
    )
    joined = ev.join(
        orders,
        (F.col("bucket") == F.col("obucket"))
        & (F.col("o_orderdate") <= F.col("ts")),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc_nulls_last(),
        F.col("o_orderkey").desc_nulls_last(),
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id", "bucket",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_orderdate").alias("asof_orderdate"),
        )
        .orderBy("event_id")
    )


# --- C11 self join (adjacency) ----------------------------------------------

_C11_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, event_type, ts,
         lead(event_id) OVER w AS next_event_id,
         lead(event_type) OVER w AS next_event_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, event_type, next_event_id, next_event_type
FROM seq
WHERE next_event_id IS NOT NULL AND user_id < 50
ORDER BY user_id, event_id
"""


@contract("join_self", oracle=_C11_ORACLE)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-event pairs per user. Expressed as ``lead`` over a user
    window rather than a literal self-join: one shuffle on user_id instead
    of two scan+shuffle passes — the scale-correct form of C11."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id", "event_id", "event_type", "ts",
            F.lead("event_id").over(w).alias("next_event_id"),
            F.lead("event_type").over(w).alias("next_event_type"),
        )
        .where(F.col("next_event_id").isNotNull() & (F.col("user_id") < 50))
        .select("user_id", "event_id", "event_type",
                "next_event_id", "next_event_type")
        .orderBy("user_id", "event_id")
    )


# --- C12: null-safe equi-join ------------------------------------------------

_C12_ORACLE = """
WITH a AS (SELECT c_custkey, nullif(c_nationkey, 3) AS nk FROM customer),
     b AS (SELECT s_suppkey, nullif(s_nationkey, 3) AS nk FROM supplier)
SELECT a.nk AS nk, count(*) AS pairs
FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
GROUP BY a.nk
ORDER BY nk NULLS FIRST
"""


@contract("join_null_safe", oracle=_C12_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — the semantics ETL needs when an
    unknown dimension key must still land in an 'unknown' bucket rather
    than silently dropping rows. eqNullSafe keys still hash-partition
    (NULLs co-locate in one partition), so the join stays a standard
    shuffle/broadcast hash join — no fallback to a theta join; a
    NULL-heavy key column is a skew hazard handled by the L2 salting
    pattern."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    a = t["customer"].select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(3)).alias("nk"))
    b = t["supplier"].select(
        "s_suppkey", F.nullif(F.col("s_nationkey"), F.lit(3)).alias("nk_b"))
    return (
        a.join(F.broadcast(b), a.nk.eqNullSafe(F.col("nk_b")))
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("pairs"))
        .orderBy(F.col("nk").asc_nulls_first())
    )


# --- C13: nearest-direction as-of join ---------------------------------------

_C13_TOL_US = 30 * 86_400_000_000  # ±30 days

_C13_ORACLE = f"""
WITH ev AS (
  SELECT event_id, ts, user_id % 1000 AS bucket
  FROM events WHERE event_id < 40
),
j AS (
  SELECT ev.event_id, ev.bucket, o.o_orderkey, o.o_orderdate,
         abs(epoch_us(CAST(ev.ts AS TIMESTAMP))
             - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) AS dist_us,
         row_number() OVER (
           PARTITION BY ev.event_id
           ORDER BY abs(epoch_us(CAST(ev.ts AS TIMESTAMP))
                        - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) ASC,
                    o.o_orderdate ASC, o.o_orderkey ASC) AS rn
  FROM ev
  LEFT JOIN (SELECT o_orderkey, o_orderdate, o_custkey % 1000 AS bucket
             FROM orders) o
    ON ev.bucket = o.bucket
   AND abs(epoch_us(CAST(ev.ts AS TIMESTAMP))
           - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) <= {_C13_TOL_US}
)
SELECT event_id, bucket,
       o_orderkey AS near_orderkey, o_orderdate AS near_orderdate,
       dist_us
FROM j WHERE rn = 1
ORDER BY event_id
"""


def nearest_asof(left: DataFrame, right: DataFrame,
                 on: tuple[str, str], ts_us: tuple[str, str],
                 left_id: str, right_order: list[str],
                 tol_us: int) -> DataFrame:
    """Nearest-direction as-of kernel: per ``left`` row (identified by
    ``left_id``), keep the ``right`` row with the same ``on`` key whose
    ``ts_us`` µs timestamp is |Δt|-closest within ``tol_us`` — either
    direction; rows with nothing in tolerance survive with NULLs (LEFT
    semantics). Equidistant ties resolve by ascending ``right_order``
    columns, making the winner fully deterministic. Adds ``dist_us``.
    One shuffle per side on the key; per-left-row window sorts over the
    tolerance-bounded candidates only."""
    lk, rk = on
    lt, rt = ts_us
    dist = F.abs(F.col(lt) - F.col(rt))
    joined = left.join(
        right, (F.col(lk) == F.col(rk)) & (dist <= F.lit(tol_us)), "left")
    w = Window.partitionBy(left_id).orderBy(
        dist.asc_nulls_last(),
        *[F.col(c).asc_nulls_last() for c in right_order])
    return (joined.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .withColumn("dist_us", dist)
            .drop("__rn"))


@contract("join_asof_nearest", oracle=_C13_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join with tolerance — C9's missing sibling
    (pandas merge_asof direction='nearest'): per event, the order in the
    same bucket minimizing |o_orderdate − ts|, but only within ±30 days;
    events with nothing in tolerance survive with NULLs (LEFT semantics).
    Sensor-fusion / trade-quote alignment shape: backward-only as-of is
    wrong when the closest reading may be ahead of the probe.

    DuckDB's native ASOF JOIN is backward-only too, so BOTH engines run
    the same explicit composition: bucket equi-join + |Δt| ≤ tol filter +
    per-event row_number over (|Δt| ASC, date ASC, key ASC) — the
    distance arg-min with a fully deterministic tie order (equidistant
    before/after resolves to the EARLIER order). At 100 TB the shape is
    C9's: one shuffle per side on the bucket key, per-event window sorts
    over tiny groups; the tolerance predicate bounds kept pairs, and a
    time-banded pre-join (L9's banding on floor(ts/tol)) is the
    drop-in candidate generator when buckets alone are too wide."""
    t = load_tables(spark, sf_dir, "events", "orders")
    ev = (
        t["events"].where(F.col("event_id") < 40)
        .select("event_id",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
                (F.col("user_id") % 1000).alias("bucket"))
    )
    orders = t["orders"].select(
        "o_orderkey", "o_orderdate",
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .alias("ot_us"),
        (F.col("o_custkey") % 1000).alias("obucket"),
    )
    return (
        nearest_asof(ev, orders, on=("bucket", "obucket"),
                     ts_us=("t_us", "ot_us"), left_id="event_id",
                     right_order=["o_orderdate", "o_orderkey"],
                     tol_us=_C13_TOL_US)
        .select(
            "event_id", "bucket",
            F.col("o_orderkey").alias("near_orderkey"),
            F.col("o_orderdate").alias("near_orderdate"),
            "dist_us",
        )
        .orderBy("event_id")
    )
