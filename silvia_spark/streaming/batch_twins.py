"""Batch twins of the streaming operators — SURVEY.md §2.I.

Structured Streaming's batch/stream unification means the SAME DataFrame
logic runs incrementally on a stream and completely on the static table; the
batch form is what the DuckDB oracle can hash-check, and the live variants in
silvia_spark.streaming.streams re-run these transformations through
readStream + availableNow to prove the incremental path (rows-only check).

Contract names here are the §2.I names — they are the hash-checked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.io import load_table, load_tables
from silvia_spark.functions.numeric import dsum, sql_dsum
from silvia_spark.registry import contract


# --- I1: tumbling window -----------------------------------------------------

_I1_ORACLE = f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart,
       event_type,
       count(*) AS cnt,
       {sql_dsum("value", "sum_value")}
FROM events
GROUP BY 1, 2
ORDER BY wstart, event_type
"""


@contract("stream_tumbling_1h", oracle=_I1_ORACLE)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per (1-hour tumbling window, type). The batch twin buckets
    with date_trunc — a plain scalar groupBy key that stays in compact
    whole-stage codegen (the struct-producing F.window() costs ~2× at
    batch; measured in BENCH_r01). The live variant (stream_tumbling_live)
    keeps F.window(), which is what runs incrementally under a watermark —
    both produce identical (wstart, event_type) groups, asserted by
    tests/test_stream_equivalence.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("wstart"),
            "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .orderBy("wstart", "event_type")
    )


# --- I2: sliding window ------------------------------------------------------

_I2_ORACLE = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts)
           - (k * INTERVAL '15 minutes') AS wstart,
         ts
  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
)
SELECT CAST(wstart AS TIMESTAMP) AS wstart, count(*) AS cnt
FROM expanded
WHERE ts >= wstart AND ts < wstart + INTERVAL '1 hour'
GROUP BY 1
ORDER BY wstart
"""


@contract("stream_sliding", oracle=_I2_ORACLE)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 min: each event lands in 4 windows.
    Spark's window() expands rows internally (×4 state, the real cost of
    sliding windows at scale — slide/width ratio is the amplification)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("wstart"), "cnt")
        .orderBy("wstart")
    )


# --- I3: sessionization (30-min gap) -----------------------------------------

_I3_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


@contract("stream_session_30m", oracle=_I3_ORACLE)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, batch form: lag → break flag → running sum.
    One shuffle on user_id; both windows share the same spec so Spark plans
    a single sort. (Streaming twin uses session_window — see streams.py.)"""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - \
        F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.lag("ts").over(w).isNull()
               | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0).alias("brk"),
    )
    wsum = (Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sess = flagged.select(
        "user_id", "ts", F.sum("brk").over(wsum).alias("session_no"))
    agg = (sess.groupBy("user_id", "session_no")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end")))
    # r15 (r14 verdict item 7): barrier before the global sort — the
    # orderBy's range-sampling pass re-executed the whole windows+agg
    # subtree on a cold run (measured −22% fresh-plan at sf0.1: 0.60 →
    # 0.47 s; warm neutral, output identical INCLUDING order). The
    # session-level aggregate is the natural cut: one cached copy feeds
    # both the sampler and the sort, and managed_persist bounds a
    # long-lived session to one live slot.
    from silvia_spark.io import managed_persist

    agg = managed_persist(agg, "stream_session_30m.agg")
    return agg.orderBy("user_id", "session_no")


# --- I5: exact dedup of at-least-once delivery -------------------------------

_I5_ORACLE = """
WITH doubled AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
),
deduped AS (
  SELECT DISTINCT event_id, ts, user_id, event_type, value, props
  FROM doubled
)
SELECT event_type, count(*) AS cnt, count(DISTINCT event_id) AS distinct_ids
FROM deduped
GROUP BY event_type
ORDER BY event_type
"""


@contract("stream_dedup_exact", oracle=_I5_ORACLE)
def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowplow delivers at-least-once; silvia must dedup on event_id. The
    twin doubles the input (simulated redelivery) then dropDuplicates on
    event_id — safe because redelivered rows are bit-identical. Streaming
    form: dropDuplicatesWithinWatermark bounds the dedup state."""
    ev = load_table(spark, sf_dir, "events")
    doubled = ev.unionByName(ev)
    deduped = doubled.dropDuplicates(["event_id"])
    return (
        deduped.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.countDistinct("event_id").alias("distinct_ids"))
        .orderBy("event_type")
    )


# --- I6: stateful funnel -----------------------------------------------------

_I6_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT u.user_id,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
ORDER BY u.user_id
"""


@contract("stream_stateful_funnel", oracle=_I6_ORACLE)
def stream_stateful_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase per user, batch form: first view,
    first click strictly after it, first purchase strictly after that.

    ONE pass, ONE user_id exchange: per user, aggregate the first-view ts
    plus the (tiny) click/purchase ts lists, then resolve the sequential
    dependency — first click after v_ts, first purchase after that — with
    array HOFs on the aggregated row. The r14-before form expressed each
    stage as ev ⋈ prev-stage → min, which Catalyst expands into SEVEN
    events scans and six user_id exchanges (the v/c subtrees are
    re-derived inside c/p AND in the final left joins — no subtree reuse
    across branches). Strictly-after filters on a NULL bound drop every
    element (x > NULL is NULL), so users without the prerequisite stage
    get NULL exactly as the join form produced. Per-user state is the
    click+purchase ts lists — the same bound as the streaming form's
    per-key state, partial-aggregated map-side. (The arbitrary-stateful
    streaming form with applyInPandasWithState is stream_funnel_live.)"""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view",
                         F.col("ts"))).alias("v_ts"),
            F.collect_list(F.when(F.col("event_type") == "click",
                                  F.col("ts"))).alias("cl"),
            F.collect_list(F.when(F.col("event_type") == "purchase",
                                  F.col("ts"))).alias("pu"),
        )
        .withColumn("c_ts", F.array_min(
            F.filter(F.col("cl"), lambda x: x > F.col("v_ts"))))
        .withColumn("p_ts", F.array_min(
            F.filter(F.col("pu"), lambda x: x > F.col("c_ts"))))
        .select(
            "user_id",
            F.when(F.col("p_ts").isNotNull(), 3)
            .when(F.col("c_ts").isNotNull(), 2)
            .when(F.col("v_ts").isNotNull(), 1)
            .otherwise(0).alias("funnel_stage"),
        )
        .orderBy("user_id")
    )


# --- I7: stream-static enrichment join ---------------------------------------

_I7_ORACLE = f"""
SELECT n_name, count(*) AS cnt, {sql_dsum("value", "sum_value")}
FROM events JOIN nation ON user_id % 25 = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@contract("stream_static_join", oracle=_I7_ORACLE)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Snowplow 'enrich' stage: stream ⋈ broadcast static dimension.
    Broadcast means zero shuffle of the stream — per-micro-batch map-side
    hash lookup, the only join shape that holds at full event-stream rate."""
    t = load_tables(spark, sf_dir, "events", "nation")
    return (
        t["events"]
        .join(F.broadcast(t["nation"]),
              (F.col("user_id") % 25) == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .orderBy("n_name")
    )


# --- I8: stream-stream interval join -----------------------------------------

_I8_ORACLE = """
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS sec_before_purchase
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL '10 minutes' AND p.ts
WHERE p.user_id < 30
ORDER BY p.user_id, purchase_id, click_id
"""


@contract("stream_stream_join", oracle=_I8_ORACLE)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases ⋈ clicks within the 10 min before each purchase, per user.
    Equi on user_id carries the shuffle; the interval is a residual range
    predicate. In the live form both sides are watermarked so the join
    state stays bounded to the interval width."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"))
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"))
    sec = (
        F.floor(F.unix_micros(F.col("p_ts").cast("timestamp")) / 1_000_000)
        - F.floor(F.unix_micros(F.col("c_ts").cast("timestamp")) / 1_000_000)
    )
    return (
        p.join(c, (F.col("user_id") == F.col("c_user"))
               & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
               & (F.col("c_ts") <= F.col("p_ts")))
        .select("user_id", "purchase_id", "click_id",
                sec.alias("sec_before_purchase"))
        .orderBy("user_id", "purchase_id", "click_id")
    )


# --- I11 twin: per-user running integer moments -------------------------------

_I11_ORACLE = """
SELECT user_id, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
       CAST(sum(CAST(round(value * 100) AS BIGINT)
                * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@contract("stream_running_moments", oracle=_I11_ORACLE)
def stream_running_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count and first two power sums of the 0.01-grid value —
    the sufficient statistics for mean/variance/z-score (E10 reuses the
    same grid), kept as exact integers so batch and streaming state
    agree to the BIT, not to an epsilon. This is the hash-checked batch
    twin of ``stream_moments_live``'s arbitrary-stateful accumulation:
    integer moments are associative and commutative, so micro-batch
    arrival order cannot change the final state — the property that
    makes the live variant's equivalence test exact. 100 TB: one
    user_id partial-agg shuffle; three longs per user of state."""
    ev = load_table(spark, sf_dir, "events")
    g = F.round(F.col("value") * 100).cast("bigint")
    return (
        ev.select("user_id", g.alias("gv"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("gv").alias("s1"),
             F.sum(F.col("gv") * F.col("gv")).alias("s2"))
        .orderBy("user_id")
    )
