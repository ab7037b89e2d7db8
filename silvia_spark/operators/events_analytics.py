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
    the first-week min is a per-user WINDOW over the distinct
    user-weeks, so both it and the offset bucketing ride ONE user_id
    exchange and one events scan (the aggregate-join-back form
    referenced the distinct set twice and Catalyst scanned events
    twice); the final matrix is tiny (weeks × offsets)."""
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.select("user_id",
                  F.date_trunc("week", "ts").cast("date").alias("w"))
        .distinct()
    )
    cohort = F.min("w").over(Window.partitionBy("user_id"))
    return (
        act.withColumn("cohort_week", cohort)
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
    per-key count is the canonical partial-agg reduction, persisted
    once so the total DERIVES from it — summing the cached per-user
    counts instead of re-aggregating the source, which referenced the
    events scan twice (a full-frame window would be wrong here: the
    per-user aggregate is user-cardinality, not dimension-sized, so it
    must never collapse to one partition). The threshold self-scales
    with n, so the output stays the tail of the skew distribution at
    every scale — this exact form is the oracle twin a
    count-min/SpaceSaving sketch would be validated against."""
    from silvia_spark.io import managed_persist

    ev = load_table(spark, sf_dir, "events")
    cnt = managed_persist(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("evt_cnt")),
        slot="heavy_hitters_cnt")
    tot = cnt.agg(F.sum("evt_cnt").alias("n"))
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


# --- M19: ordered funnel conversion -------------------------------------------

_M19_ORACLE = """
WITH w1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS vt
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > vt THEN ts END)
              OVER (PARTITION BY user_id) AS ct
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > ct THEN ts END)
              OVER (PARTITION BY user_id) AS pt
  FROM w2
), u AS (
  SELECT user_id, min(vt) AS vt, min(ct) AS ct, min(pt) AS pt
  FROM w3 GROUP BY user_id
)
SELECT count(vt) AS n_view,
       count(ct) AS n_click_after_view,
       count(pt) AS n_purchase_after_click
FROM u
"""


@contract("events_funnel_conversion", oracle=_M19_ORACLE)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED funnel: users who viewed, then clicked strictly after their
    first view, then purchased strictly after that first qualifying
    click. Min-per-type alone is wrong (a click before any view must not
    count) — the stage anchors chain: vt = first view, ct = first click
    > vt, pt = first purchase > ct, each a full-frame window over the
    SAME user_id partitioning, so Catalyst plans ONE user_id exchange
    for all three Window nodes, the per-user reduction reuses that
    partitioning shuffle-free, and only the 3-counter final aggregate
    crosses the wire. At 100 TB that is one events-sized shuffle total —
    the same cost as any single per-user metric."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    vt = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = ev.withColumn("vt", vt)
    ct = F.min(F.when((F.col("event_type") == "click")
                      & (F.col("ts") > F.col("vt")), F.col("ts"))).over(w)
    s2 = s1.withColumn("ct", ct)
    pt = F.min(F.when((F.col("event_type") == "purchase")
                      & (F.col("ts") > F.col("ct")), F.col("ts"))).over(w)
    s3 = s2.withColumn("pt", pt)
    u = s3.groupBy("user_id").agg(F.min("vt").alias("vt"),
                                  F.min("ct").alias("ct"),
                                  F.min("pt").alias("pt"))
    return u.agg(F.count("vt").alias("n_view"),
                 F.count("ct").alias("n_click_after_view"),
                 F.count("pt").alias("n_purchase_after_click"))


# --- M20: last-touch attribution ----------------------------------------------

_M20_ORACLE = """
WITH w AS (
  SELECT user_id, ts, event_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src_ts,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM events
)
SELECT touch_type, count(*) AS attributed
FROM w
WHERE event_type = 'purchase' AND src_ts IS NOT NULL
  AND src_ts >= ts - INTERVAL '30 minutes'
GROUP BY touch_type
ORDER BY touch_type
"""


@contract("events_attribution_touch", oracle=_M20_ORACLE)
def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent non-purchase event within the preceding 30 minutes. The
    look-back is E8's last-IGNORE-NULLS running frame (two projections
    of the same window pick ts and type from the SAME row — their NULL
    gates are identical), ordered (ts, event_id) so same-timestamp ties
    are pinned. One user_id exchange, one sort, then a 5-row aggregate:
    the attribution table for a day of events costs the same shuffle as
    any per-user sessionization. Window-frame attribution beats an
    as-of self-join here because every row needs only its OWN prefix —
    no join materialization at all."""
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    not_p = F.col("event_type") != "purchase"
    src_ts = F.last(F.when(not_p, F.col("ts")), ignorenulls=True).over(w)
    touch = F.last(F.when(not_p, F.col("event_type")),
                   ignorenulls=True).over(w)
    return (
        ev.select("user_id", "ts", "event_type",
                  src_ts.alias("src_ts"), touch.alias("touch_type"))
        .where((F.col("event_type") == "purchase")
               & F.col("src_ts").isNotNull()
               & (F.col("src_ts")
                  >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")))
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("attributed"))
        .orderBy("touch_type")
    )


# --- M21: UA / referer enrichment (the Snowplow enrichment shape) -------------

# UA strings and referer URLs are planted deterministically from event_id
# arithmetic; classification happens INDEPENDENTLY in each engine (Spark:
# when/contains chains, DuckDB: CASE/LIKE), so the two orderings of the
# classic UA pitfalls — Chrome UAs contain "Safari/", iPhone UAs contain
# "like Mac OS X" — are pinned against each other.
_M21_ORACLE = """
WITH planted AS (
  SELECT event_id, user_id,
         CASE event_id % 4
           WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) '
                       || 'AppleWebKit/537.36 (KHTML, like Gecko) '
                       || 'Chrome/120.0.0.0 Safari/537.36'
           WHEN 1 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) '
                       || 'AppleWebKit/605.1.15 (KHTML, like Gecko) '
                       || 'Version/17.0 Safari/605.1.15'
           WHEN 2 THEN 'Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like '
                       || 'Mac OS X) AppleWebKit/605.1.15 (KHTML, like '
                       || 'Gecko) Version/17.0 Mobile/15E148 Safari/604.1'
           ELSE 'curl/8.4.0'
         END AS ua,
         CASE event_id % 5
           WHEN 0 THEN 'https://www.google.com/search?q=x'
           WHEN 1 THEN 'https://news.ycombinator.com/item?id=1'
           WHEN 2 THEN 'https://example.com/internal/page'
           WHEN 3 THEN ''
           ELSE 'https://duckduckgo.com/?q=y'
         END AS referer
  FROM events
),
cls AS (
  SELECT user_id,
         CASE WHEN ua LIKE 'curl/%' THEN 'bot'
              WHEN ua LIKE '%Chrome/%' THEN 'chrome'
              WHEN ua LIKE '%Safari/%' THEN 'safari'
              ELSE 'other' END AS browser,
         CASE WHEN ua LIKE '%iPhone OS%' THEN 'ios'
              WHEN ua LIKE '%Mac OS X%' THEN 'macos'
              WHEN ua LIKE '%Windows NT%' THEN 'windows'
              ELSE 'other' END AS os,
         CASE WHEN ua LIKE '%Mobile/%' THEN 'mobile'
              ELSE 'desktop' END AS device,
         CASE WHEN referer = '' THEN 'direct'
              WHEN regexp_extract(referer, '^[a-z]+://([^/]+)', 1)
                   = 'example.com' THEN 'internal'
              WHEN regexp_extract(referer, '^[a-z]+://([^/]+)', 1)
                   IN ('www.google.com', 'duckduckgo.com') THEN 'search'
              ELSE 'referral' END AS referer_medium
  FROM planted
)
SELECT browser, os, device, referer_medium,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM cls
GROUP BY browser, os, device, referer_medium
ORDER BY browser, os, device, referer_medium
"""


@contract("etl_ua_referer_enrich", oracle=_M21_ORACLE)
def etl_ua_referer_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-agent + referer enrichment — the Snowplow enrichment stage the
    reference's event ETL runs before warehouse load: classify browser /
    os / device from the UA string and the acquisition medium (direct /
    internal / search / referral) from the referer host, then roll up
    traffic by the enriched dimensions.

    Classification order IS the semantics, and both engines encode it
    independently: Chrome must be tested before Safari (every Chrome UA
    carries 'Safari/537.36'), iOS before macOS (iPhone UAs carry 'like
    Mac OS X'), bots first. Referer medium keys off the parsed host
    (parse_url vs anchored regex) against a search-engine list, with
    empty referer → direct and own-domain → internal. Everything is
    when/contains codegen — zero Python, zero shuffle until the final
    small groupBy; at 100 TB this is the canonical scan-rate map stage
    ahead of a partitioned lake write (A6/A13)."""
    ev = load_table(spark, sf_dir, "events")
    m4, m5 = F.col("event_id") % 4, F.col("event_id") % 5
    ua = (F.when(m4 == 0, F.lit(
              "Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
              "AppleWebKit/537.36 (KHTML, like Gecko) "
              "Chrome/120.0.0.0 Safari/537.36"))
          .when(m4 == 1, F.lit(
              "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
              "AppleWebKit/605.1.15 (KHTML, like Gecko) "
              "Version/17.0 Safari/605.1.15"))
          .when(m4 == 2, F.lit(
              "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) "
              "AppleWebKit/605.1.15 (KHTML, like Gecko) "
              "Version/17.0 Mobile/15E148 Safari/604.1"))
          .otherwise(F.lit("curl/8.4.0")))
    referer = (F.when(m5 == 0, F.lit("https://www.google.com/search?q=x"))
               .when(m5 == 1, F.lit("https://news.ycombinator.com/item?id=1"))
               .when(m5 == 2, F.lit("https://example.com/internal/page"))
               .when(m5 == 3, F.lit(""))
               .otherwise(F.lit("https://duckduckgo.com/?q=y")))
    p = ev.select("user_id", ua.alias("ua"), referer.alias("referer"))
    browser = (F.when(F.col("ua").startswith("curl/"), "bot")
               .when(F.col("ua").contains("Chrome/"), "chrome")
               .when(F.col("ua").contains("Safari/"), "safari")
               .otherwise("other"))
    os_c = (F.when(F.col("ua").contains("iPhone OS"), "ios")
            .when(F.col("ua").contains("Mac OS X"), "macos")
            .when(F.col("ua").contains("Windows NT"), "windows")
            .otherwise("other"))
    device = (F.when(F.col("ua").contains("Mobile/"), "mobile")
              .otherwise("desktop"))
    host = F.parse_url("referer", F.lit("HOST"))
    medium = (F.when(F.col("referer") == "", "direct")
              .when(host == "example.com", "internal")
              .when(host.isin("www.google.com", "duckduckgo.com"), "search")
              .otherwise("referral"))
    return (
        p.select(browser.alias("browser"), os_c.alias("os"),
                 device.alias("device"), medium.alias("referer_medium"),
                 "user_id")
        .groupBy("browser", "os", "device", "referer_medium")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("browser", "os", "device", "referer_medium")
    )


# --- M22: IP → geo range-lookup enrichment ------------------------------------

# Deterministic plant: each event's "IP" is a Knuth multiplicative hash of
# its user_id into the 32-bit space; the geo table is 32 arithmetic,
# non-overlapping [start, end) ranges with real GAPS between them (about
# 20% of the space is unmapped → 'unknown'), so the lookup exercises the
# miss path, not just interval membership.
_M22_BAND = 134_217_728  # 2^27: every geo range spans ≤ 2 bands

_M22_ORACLE = f"""
WITH ips AS (
  SELECT event_id, user_id,
         (user_id * 2654435761) % 4294967296 AS ip
  FROM events
),
geo AS (
  SELECT k * {_M22_BAND} + (k % 5) * 1000000 AS r_start,
         k * {_M22_BAND} + (k % 5) * 1000000
           + 100000000 + (k % 7) * 4000000 AS r_end,
         'cc_' || CAST(k % 10 AS VARCHAR) AS country
  FROM (SELECT unnest(generate_series(0, 31)) AS k)
),
looked AS (
  SELECT i.event_id, i.user_id, g.country
  FROM ips i LEFT JOIN geo g
    ON i.ip >= g.r_start AND i.ip < g.r_end
)
SELECT coalesce(country, 'unknown') AS country,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM looked
GROUP BY coalesce(country, 'unknown')
ORDER BY country
"""


@contract("etl_ip_geo_range", oracle=_M22_ORACLE)
def etl_ip_geo_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP → geography enrichment — the range-table lookup of Snowplow's IP
    enrichment: every event's 32-bit address resolves to the ONE geo
    range containing it (or 'unknown' in the gaps), then traffic rolls up
    per country.

    Plain `ip BETWEEN start AND end` against a range table is a
    nested-loop join. Here the geo table replicates each range to the ≤ 2
    2^27-wide bands it spans (L9's decomposition), then pre-aggregates to
    ONE row per band carrying its ranges as an array — so the lookup is a
    BROADCAST hash join that emits exactly one row per event (no fan-out,
    no collapse groupBy), and the containing range resolves inline with a
    higher-order filter over the ≤ 2-element array. A MaxMind-scale
    table is a few MB in this shape, the canonical broadcast dimension;
    the event scan never shuffles until the final country rollup. Gap
    addresses coalesce to 'unknown' instead of dropping — at 100 TB
    silent row loss in an enrichment join is the classic accounting bug.
    The geo dimension itself is BUILT from spark.range arithmetic
    (DuckDB: generate_series), so both engines derive identical tables
    with no fixture file."""
    ev = load_table(spark, sf_dir, "events")
    ips = ev.select(
        "event_id", "user_id",
        ((F.col("user_id") * 2654435761) % 4294967296).alias("ip"))
    k = F.col("id")
    start = k * _M22_BAND + (k % 5) * 1000000
    geo = spark.range(32).select(
        start.alias("r_start"),
        (start + 100000000 + (k % 7) * 4000000).alias("r_end"),
        F.concat(F.lit("cc_"), (k % 10).cast("string")).alias("country"))
    geo_band = (geo.withColumn(
        "band", F.explode(F.sequence(
            F.floor(F.col("r_start") / F.lit(_M22_BAND)),
            F.floor((F.col("r_end") - 1) / F.lit(_M22_BAND)))))
        .groupBy("band")
        .agg(F.collect_list(
            F.struct("r_start", "r_end", "country")).alias("ranges")))
    ip = F.col("ip")
    hit = F.filter("ranges", lambda r: (ip >= r["r_start"])
                   & (ip < r["r_end"]))
    # try_element_at: a gap address yields an EMPTY filtered array (ANSI
    # element_at throws on it), and a band with no ranges at all yields a
    # NULL array from the left join — both must read as 'unknown'.
    country = F.coalesce(F.try_element_at(hit, F.lit(1))["country"],
                         F.lit("unknown"))
    return (
        ips.withColumn("band", F.floor(ip / F.lit(_M22_BAND)))
        .join(F.broadcast(geo_band), "band", "left")
        .select(country.alias("country"), "user_id")
        .groupBy("country")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("country")
    )


# --- M23: currency-conversion enrichment --------------------------------------

# The rate table is DENSE — one row per (currency, 10-day period) spanning
# the full order-date range — which is what makes the lookup an EQUI join
# on the period key instead of an as-of fan-out: each order matches
# exactly one rate row. Sparse/event-driven rate feeds are C9/C13's
# as-of territory; densifying the feed (forward-fill to periods) is the
# standard preprocessing that buys this join shape at scale.
_M23_EPOCH = "1992-01-01"
_M23_STEP_DAYS = 10
_M23_PERIODS = 400          # 400 × 10 d ≈ 11 y ≥ the corpus date span
_M23_CURRENCIES = 4

_M23_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_totalprice, o_orderdate,
         CASE o_orderkey % 4 WHEN 0 THEN 'usd' WHEN 1 THEN 'eur'
                             WHEN 2 THEN 'gbp' ELSE 'jpy' END AS currency,
         date_diff('day', DATE '{_M23_EPOCH}',
                   CAST(o_orderdate AS DATE)) // {_M23_STEP_DAYS} AS period
  FROM orders
),
rates AS (
  SELECT k % {_M23_PERIODS} AS period,
         CASE k // {_M23_PERIODS} WHEN 0 THEN 'usd' WHEN 1 THEN 'eur'
                                  WHEN 2 THEN 'gbp' ELSE 'jpy' END
           AS currency,
         1.0 + CAST((k * 7) % 50 AS DOUBLE) / 100.0 AS rate
  FROM (SELECT unnest(generate_series(0, {_M23_PERIODS * _M23_CURRENCIES
                                          - 1})) AS k)
)
SELECT o.currency, count(*) AS n_orders,
       (sum(CAST(round(o.o_totalprice * r.rate * 1000000) AS BIGINT))
        / 1000000.0) AS base_total
FROM o JOIN rates r ON o.currency = r.currency AND o.period = r.period
GROUP BY o.currency
ORDER BY o.currency
"""


@contract("etl_currency_convert", oracle=_M23_ORACLE)
def etl_currency_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency-conversion enrichment — the last of the Snowplow
    enrichment shapes (UA M21, referer M21, IP-geo M22, currency here):
    every order's total converts to the base currency at the rate in
    force on its date, then revenue rolls up per source currency.

    The rate dimension is DENSE (one row per currency per 10-day
    period), so the temporal lookup is a plain broadcast EQUI join on
    (currency, period) — exactly one rate row per order, no as-of
    fan-out, no window pass, and the fact scan never shuffles before
    the rollup. That density is a design choice, not luck: production
    rate feeds are forward-filled to a period grid precisely to buy
    this join shape; a sparse feed falls back to C9's as-of
    composition. INNER join is safe (the grid covers the full date
    span — a gap would silently drop orders, which is why the period
    table is sized off the corpus range with headroom). Conversion
    sums use the 1e-6 BIGINT grid; the rate table derives from range
    arithmetic identically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    cur = (F.when(F.col("o_orderkey") % 4 == 0, "usd")
           .when(F.col("o_orderkey") % 4 == 1, "eur")
           .when(F.col("o_orderkey") % 4 == 2, "gbp")
           .otherwise("jpy"))
    period = F.floor(
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit(_M23_EPOCH).cast("date"))
        / _M23_STEP_DAYS)
    facts = o.select(cur.alias("currency"), period.alias("period"),
                     "o_totalprice")
    k = F.col("id")
    kc = (k / _M23_PERIODS).cast("bigint")
    rates = spark.range(_M23_PERIODS * _M23_CURRENCIES).select(
        (k % _M23_PERIODS).alias("period"),
        (F.when(kc == 0, "usd").when(kc == 1, "eur")
         .when(kc == 2, "gbp").otherwise("jpy")).alias("currency"),
        (1.0 + ((k * 7) % 50).cast("double") / 100.0).alias("rate"))
    converted = facts.join(F.broadcast(rates), ["currency", "period"])
    grid = F.sum(F.round(F.col("o_totalprice") * F.col("rate")
                         * 1000000).cast("bigint"))
    return (
        converted.groupBy("currency")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             (grid / 1000000.0).alias("base_total"))
        .orderBy("currency")
    )
