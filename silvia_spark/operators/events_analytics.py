"""Event-log analytics — SURVEY.md §2 E9, M17, D13.

Product-analytics shapes over the ``events`` table that the first window
and composite batches didn't cover:

- E9 ``window_gaps_islands`` — per-user longest consecutive-day purchase
  streak via the gaps-and-islands (date − row_number) anchor trick.
- M17 ``events_retention_cohort`` — the classic cohort-retention matrix:
  users bucketed by first-active week, counted per week offset.
- D13 ``agg_heavy_hitters`` — exact frequent-entity detection with a
  RELATIVE support threshold (share of total events), the exact-oracle
  twin of sketch-based heavy hitters: two aggregates and an integer
  cross-multiplied comparison, no doubles anywhere.

Numeric discipline: thresholds compare integers cross-multiplied
(``cnt * 1000 >= total * 8``), never ratios — no float division exists in
any of these contracts, so cross-engine hashing is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.io import load_table
from silvia_spark.registry import contract

# --- E9: gaps-and-islands — longest per-user purchase-day streak --------------

_E9_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'
), grp AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT)
           AS anchor
  FROM days
), streaks AS (
  SELECT user_id, min(d) AS streak_start, count(*) AS streak_len
  FROM grp GROUP BY user_id, anchor
), best AS (
  SELECT user_id, streak_start, streak_len,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY streak_len DESC, streak_start) AS rn
  FROM streaks
)
SELECT user_id, streak_start, streak_len
FROM best WHERE rn = 1
ORDER BY user_id
"""


@contract("window_gaps_islands", oracle=_E9_ORACLE)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive purchase
    days. Consecutive dates collapse to one group because (date −
    row_number) is constant within a run — the island anchor — so the
    whole streak structure falls out of one window + one groupBy, no
    self-join, no iteration. Tie-break: longest first, then earliest
    start, so the per-user winner is unique. 100 TB: one user_id
    shuffle serves the distinct, the anchor window, and the final
    argmax; group state is bounded by days-per-user, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    streaks = (
        days.withColumn("anchor", F.date_sub("d", rn))
        .groupBy("user_id", "anchor")
        .agg(F.min("d").alias("streak_start"),
             F.count(F.lit(1)).alias("streak_len"))
    )
    best = F.row_number().over(
        Window.partitionBy("user_id")
        .orderBy(F.col("streak_len").desc(), "streak_start"))
    return (
        streaks.withColumn("rn", best).where(F.col("rn") == 1)
        .select("user_id", "streak_start", "streak_len")
        .orderBy("user_id")
    )


# --- M17: cohort retention matrix --------------------------------------------

_M17_ORACLE = """
WITH firstw AS (
  SELECT user_id,
         CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
)
SELECT cohort_week,
       CAST((w - cohort_week) // 7 AS INT) AS week_offset,
       count(*) AS active_users
FROM act JOIN firstw USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@contract("events_retention_cohort", oracle=_M17_ORACLE)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by FIRST active ISO week, then
    counted once per (cohort, week offset) they were active in — the
    matrix behind every retention curve. Week truncation is Monday-
    anchored in both engines (ISO), and the offset is an exact integer:
    day difference of two Monday dates floor-divided by 7 (both engines
    do integer division on integers — no float ever exists). 100 TB:
    two aggregates share one user_id shuffle (first-week min and the
    distinct active weeks); the join input is one row per user-week, and
    the final matrix is tiny (weeks × offsets)."""
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.select("user_id",
                  F.date_trunc("week", "ts").cast("date").alias("w"))
        .distinct()
    )
    firstw = act.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    return (
        act.join(firstw, "user_id")
        .groupBy("cohort_week",
                 (F.datediff("w", "cohort_week") / 7).cast("int")
                 .alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --- D13: exact heavy hitters with relative support ---------------------------

_D13_ORACLE = """
WITH tot AS (SELECT count(*) AS n FROM events),
cnt AS (SELECT user_id, count(*) AS evt_cnt FROM events GROUP BY user_id)
SELECT user_id, evt_cnt
FROM cnt, tot
WHERE evt_cnt * 1000 >= n * 8
ORDER BY evt_cnt DESC, user_id
"""


@contract("agg_heavy_hitters", oracle=_D13_ORACLE)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: users responsible for ≥ 0.8% of all events.
    The support test cross-multiplies integers (cnt·1000 ≥ n·8) so no
    ratio is ever computed — the contract is float-free end to end.
    The global total rides a 1-row broadcast crossJoin onto the
    per-user aggregate (one job, no driver round-trip). 100 TB: the
    per-key count is the canonical partial-agg reduction; the threshold
    self-scales with n, so the output stays the tail of the skew
    distribution at every scale — this exact form is the oracle twin a
    count-min/SpaceSaving sketch would be validated against."""
    ev = load_table(spark, sf_dir, "events")
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    cnt = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("evt_cnt"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .where(F.col("evt_cnt") * 1000 >= F.col("n") * 8)
        .select("user_id", "evt_cnt")
        .orderBy(F.col("evt_cnt").desc(), "user_id")
    )


# --- E10: integer-exact z-score anomaly detection -----------------------------

_E10_ORACLE = """
WITH g AS (
  SELECT event_id, user_id, value,
         CAST(round(value * 100) AS BIGINT) AS gv
  FROM events
), s AS (
  SELECT event_id, user_id, value, gv,
         count(*) OVER w AS n,
         CAST(sum(gv) OVER w AS BIGINT) AS s1,
         CAST(sum(gv * gv) OVER w AS BIGINT) AS s2
  FROM g WINDOW w AS (PARTITION BY user_id)
)
SELECT event_id, user_id, value
FROM s
WHERE (n * gv - s1) * (n * gv - s1) > 9 * (n * s2 - s1 * s1)
ORDER BY event_id
"""


@contract("window_anomaly_zscore", oracle=_E10_ORACLE)
def window_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers — events whose value sits more than 3
    population standard deviations from the user's own mean — computed
    ENTIRELY in integer arithmetic: (x−μ)² > 9σ² cross-multiplied by n²
    becomes (n·g − S1)² > 9·(n·S2 − S1²) on the 0.01 value grid (the
    data's native precision), so the classically float-fragile variance
    comparison is bit-exact across engines with no epsilon anywhere.
    Overflow headroom: |n·g| < 3·10⁹ holds for n ≤ ~60 k events per user
    at this value scale (int64 square bound); beyond that, coarsen the
    grid — documented, not silent. 100 TB: one user_id exchange feeds
    all three full-frame window aggregates; the filter is a map-side
    projection after it."""
    ev = load_table(spark, sf_dir, "events")
    g = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("user_id")
    s = (ev.select("event_id", "user_id", "value", g.alias("gv"))
         .withColumn("n", F.count(F.lit(1)).over(w))
         .withColumn("s1", F.sum("gv").over(w))
         .withColumn("s2", F.sum(F.col("gv") * F.col("gv")).over(w)))
    d = F.col("n") * F.col("gv") - F.col("s1")
    var_n2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        s.where(d * d > 9 * var_n2)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )
