"""Window function operators — SURVEY.md §2.E (E1–E6).

Each window spec is one shuffle on its partition key + per-partition sort;
specs are shared across functions in the same query so Spark plans a single
Window exchange. Partition keys here (customer, user, priority) are
high-cardinality — no single-partition global windows except E4/E5, which
are post-aggregation (input already reduced to one row per day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.io import load_table
from silvia_spark.functions.numeric import dsum, sql_dsum
from silvia_spark.registry import contract


# --- E1: rank top-N per group ------------------------------------------------

_E1_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
WHERE rnk <= 3
ORDER BY o_custkey, rnk, o_orderkey
"""


@contract("window_rank_topn", oracle=_E1_ORACLE)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. rank<=N filters push into the Window op
    (Spark's WindowGroupLimit) so each partition keeps only N rows —
    the grouped-top-k pattern that scales."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice",
                 F.rank().over(w).alias("rnk"))
        .where(F.col("rnk") <= 3)
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


# --- E2: row_number / dense_rank / ntile / percent_rank ----------------------

_E2_ORACLE = """
SELECT o_orderkey,
       row_number()   OVER w AS rn,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 8) AS pct_rank
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_orderkey
"""


@contract("window_row_dense_ntile", oracle=_E2_ORACLE)
def window_row_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        )
        .orderBy("o_orderkey")
    )


# --- E3: lag/lead ------------------------------------------------------------

_E3_ORACLE = """
SELECT user_id, event_id, ts,
       CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_sec
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


@contract("window_lag_lead", oracle=_E3_ORACLE)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap in whole seconds. Computed on the exact µs
    timestamps via unix epoch subtraction (DuckDB date_diff('second')
    truncates toward the epoch ordering — both sides use second floors)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000))
        - F.floor(F.unix_micros(prev.cast("timestamp")) / F.lit(1000000))
    )
    return (
        ev.select("user_id", "event_id", "ts", gap.alias("gap_sec"))
        .orderBy("user_id", "event_id")
    )


# --- E4: moving frame (ROWS) -------------------------------------------------

_E4_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         {sql_dsum("o_totalprice", "day_total")}
  FROM orders GROUP BY 1
)
SELECT day, day_total,
       CAST(round(sum(CAST(day_total AS DECIMAL(38,10)))
            OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
            AS DOUBLE) AS mov_sum_7d,
       round(CAST(sum(CAST(day_total AS DECIMAL(38,10)))
            OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
            / count(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
            6) AS mov_avg_7d
FROM daily
ORDER BY day
"""


@contract("window_moving_frame", oracle=_E4_ORACLE)
def window_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving sum/avg over daily totals. The windowed input is already
    one row per day (post-agg), so the unpartitioned window sorts ~2.4k rows
    — fine at any source scale; the heavy lifting happened in the groupBy."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", F.col("o_orderdate"))
                  .cast("timestamp_ntz").alias("day"))
        .agg(dsum("o_totalprice", "day_total"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    dec_sum = F.sum(F.col("day_total").cast("decimal(38,10)")).over(w)
    return (
        daily.select(
            "day", "day_total",
            F.round(dec_sum, 4).cast("double").alias("mov_sum_7d"),
            F.round(dec_sum.cast("double") / F.count(F.lit(1)).over(w), 6)
            .alias("mov_avg_7d"),
        )
        .orderBy("day")
    )


# --- E5: range frame (running total, ties collapse) --------------------------

_E5_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
         {sql_dsum("l_extendedprice * (1 - l_discount)", "day_rev")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT day, day_rev,
       CAST(round(sum(CAST(day_rev AS DECIMAL(38,10)))
            OVER (ORDER BY day RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            4) AS DOUBLE) AS running_rev
FROM daily
ORDER BY day
"""


@contract("window_range_frame", oracle=_E5_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
    daily = (
        o.groupBy(F.date_trunc("day", F.col("l_shipdate"))
                  .cast("timestamp_ntz").alias("day"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "day_rev"))
    )
    w = (Window.orderBy("day")
         .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        daily.select(
            "day", "day_rev",
            F.round(F.sum(F.col("day_rev").cast("decimal(38,10)")).over(w), 4)
            .cast("double").alias("running_rev"),
        )
        .orderBy("day")
    )


# --- E6: first/last value ----------------------------------------------------

_E6_ORACLE = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type)  OVER w AS last_type,
       first_value(ts) OVER w AS first_ts,
       last_value(ts)  OVER w AS last_ts
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id
"""


@contract("window_first_last", oracle=_E6_ORACLE)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event per user over a full frame (default frame would stop
    last_value at CURRENT ROW — explicit unbounded frame on both sides)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.first("ts").over(w).alias("first_ts"),
            F.last("ts").over(w).alias("last_ts"),
        )
        .distinct()
        .orderBy("user_id")
    )


# --- E7: distribution window functions ---------------------------------------

_E7_ORACLE = """
SELECT c_custkey, c_nationkey,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_in_nation
FROM customer
WHERE c_custkey < 500
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


@contract("window_percent_rank", oracle=_E7_ORACLE)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank ((rank-1)/(n-1)) and cume_dist (rows≤current / n): both
    are one integer division on exact ranks, bit-identical cross-engine.
    The tie-break (c_acctbal, c_custkey) is total, so ranks are
    deterministic. Same single-shuffle window shape as E1–E6."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_nationkey")
    return (
        c.select(
            "c_custkey", "c_nationkey",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.count(F.lit(1)).over(wn).alias("n_in_nation"),
        )
        .orderBy("c_custkey")
    )


# --- E8: IGNORE NULLS window navigation --------------------------------------

_E8_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
  FROM events WHERE user_id < 40
)
SELECT user_id, ts, event_id, purchase_value,
       last_value(purchase_value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_purchase_value
FROM e
ORDER BY user_id, ts, event_id
"""


@contract("window_ignore_nulls", oracle=_E8_ORACLE)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value IGNORE NULLS — the gaps-carry-forward idiom (each event
    row carries the user's most recent purchase value; non-purchase rows
    are NULL and must be skipped, not propagated). This is the standard
    'last observation carried forward' enrichment in event analytics;
    RESPECT NULLS (the default) would erase the carried value on every
    non-purchase row. Same single user_id window shuffle as E1-E7."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        ev.select("user_id", "ts", "event_id", pv.alias("purchase_value"))
        .withColumn("last_purchase_value",
                    F.last("purchase_value", ignorenulls=True).over(w))
        .orderBy("user_id", "ts", "event_id")
    )


# --- E11: trailing time-interval range frame ----------------------------------

# Trailing 1-hour frames over EVENT TIME (not row counts): the frame is
# defined by a timestamp interval, so it holds however many rows fall in
# the hour — the op behind every "last-60-minutes" metric. Spark's
# rangeBetween needs a numeric ordering column, so ts is projected to
# epoch MICROSECONDS (exact BIGINTs — epoch seconds would be fractional
# in DuckDB's epoch() and truncated by Spark's cast, two different
# roundings); the oracle runs the IDENTICAL epoch-µs formulation, making
# the frame boundary arithmetic engine-portable by construction
# (DuckDB's native RANGE INTERVAL form is semantically equal, but the
# shared integer form removes any boundary-inclusion doubt). Counts
# only — no float sums in a frame whose membership is data-dependent.
_E11_ORACLE = """
WITH t AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us
  FROM events WHERE user_id < 40
)
SELECT user_id, event_id, ts,
       count(*) OVER (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         AS n_last_hour
FROM t
ORDER BY user_id, ts, event_id
"""


@contract("window_trailing_interval", oracle=_E11_ORACLE)
def window_trailing_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 1-hour activity count per user — the
    time-interval RANGE frame (distinct from E4's row frame and E5's
    unbounded range): frame membership follows event TIME, so bursts
    hold many rows and quiet hours few. One user_id exchange + one sort
    serves the whole metric; at 100 TB this is the standard
    sliding-telemetry shape (rate limiting, burst detection, trailing
    engagement), and the epoch-µs ordering key keeps the frame
    arithmetic in exact integers on both engines (ntz → UTC timestamp
    is value-preserving under the pinned session zone)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        ev.select("user_id", "event_id", "ts",
                  F.count(F.lit(1)).over(
                      Window.partitionBy("user_id").orderBy(us)
                      .rangeBetween(-3_600_000_000, Window.currentRow))
                  .alias("n_last_hour"))
        .orderBy("user_id", "ts", "event_id")
    )
