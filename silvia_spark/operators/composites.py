"""Composite pipelines — multi-stage queries exercising many operators at
once (SURVEY.md §2 M-rows).

- M1 ``etl_events_enriched`` — the reference's actual job shape end-to-end
  in one plan (BASELINE.json north star: Snowplow/Adjust event ETL): dedup →
  JSON parse → quality filter → broadcast-dim enrich → aggregate. The batch
  twin of the I-family stages composed; the streaming forms of every stage
  exist in streaming/streams.py.
- M2 ``q10_returned_items`` — TPC-H Q10: 4-table join, returnflag filter,
  revenue top-20 (joins + agg + top-k in one plan).
- M3 ``agg_time_gapfill`` — gap-filled hourly rollup (TimescaleDB
  time_bucket_gapfill): a generated dense hour×type grid left-joined onto
  the data so empty buckets surface as explicit zero rows.
- M4 ``text_tfidf`` — tf-idf scoring on top of J7's tf-df machinery:
  corpus-size N and document frequency feed ln(N/df), top-3 terms per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.functions.numeric import dsum, sql_dsum
from silvia_spark.io import load_table, load_tables
from silvia_spark.registry import contract

# --- M1: the silvia job, composed --------------------------------------------

_M1_ORACLE = f"""
WITH dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY event_id
                                 ORDER BY ts, value NULLS FIRST,
                                          props NULLS FIRST) AS rn
    FROM events) WHERE rn = 1
), parsed AS (
  SELECT user_id, event_type, value,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM dedup
  WHERE value IS NOT NULL
    AND json_extract_string(props, '$.k') IS NOT NULL
), enriched AS (
  SELECT n.n_name, p.event_type, p.value, p.k
  FROM parsed p JOIN nation n ON p.user_id % 25 = n.n_nationkey
)
SELECT n_name, event_type, count(*) AS cnt,
       {sql_dsum("value", "sum_value")},
       CAST(sum(k) AS BIGINT) AS sum_k
FROM enriched
GROUP BY n_name, event_type
ORDER BY n_name, event_type
"""


@contract("etl_events_enriched", oracle=_M1_ORACLE)
def etl_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's job shape in ONE declarative plan: at-least-once
    dedup (deterministic keep-first-by-ts, I5's semantics) → typed JSON
    parse (single from_json per row) → quality filter → broadcast
    dimension enrich (I7's shape) → partial-aggregated rollup. The value/k
    filters run AFTER the event_id Window — Catalyst cannot push a
    non-partition-key predicate below it, and that ordering is REQUIRED:
    the oracle also dedups first, and filtering first could let a
    different row survive rn=1. The dim join is a map-side hash lookup and
    exactly two shuffles exist end-to-end (event_id dedup, final groupBy)
    — at stream rate the same plan runs under foreachBatch with the JDBC
    upsert sink (I9)."""
    ev = load_table(spark, sf_dir, "events")
    n = load_table(spark, sf_dir, "nation")
    # Full ordering inside the dedup window: replayed duplicates share
    # (event_id, ts), so ts alone would leave the survivor to partition
    # luck — value/props break the tie identically in both engines
    # (NULLS FIRST matches Spark's asc default; DuckDB defaults NULLS
    # LAST, hence the explicit markers in _M1_ORACLE).
    rn = F.row_number().over(
        Window.partitionBy("event_id").orderBy(
            F.col("ts").asc(),
            F.col("value").asc_nulls_first(),
            F.col("props").asc_nulls_first()))
    k = F.from_json(F.col("props"), "k INT").getField("k")
    dedup = (ev.withColumn("rn", rn).where(F.col("rn") == 1)
             .withColumn("k", k)
             .where(F.col("value").isNotNull() & F.col("k").isNotNull()))
    return (
        dedup.join(F.broadcast(n),
                   (F.col("user_id") % 25) == F.col("n_nationkey"))
        .groupBy("n_name", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             dsum("value", "sum_value"),
             F.sum("k").alias("sum_k"))
        .orderBy("n_name", "event_type")
    )


# --- M2: TPC-H Q10 -----------------------------------------------------------

_M2_ORACLE = f"""
SELECT c_custkey, c_name,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@contract("q10_returned_items", oracle=_M2_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers ranked by revenue lost to returned items in a
    quarter. lineitem (returnflag-filtered) shuffles once on orderkey;
    date-filtered orders joins there; the result (customer grain) joins
    broadcast customer+nation; TakeOrderedAndProject caps the output.
    Deterministic under ties via the c_custkey tiebreak (revenue is an
    exact grid sum, so tie behavior is engine-identical)."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz")))
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- M3: gap-filled hourly rollup --------------------------------------------

_M3_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
  FROM events
), grid AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS h FROM bounds
), types AS (SELECT DISTINCT event_type FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT t.event_type AS event_type, g.h AS bucket, coalesce(a.c, 0) AS cnt
FROM grid g CROSS JOIN types t
LEFT JOIN agg a ON a.h = g.h AND a.event_type = t.event_type
ORDER BY t.event_type, bucket
"""


@contract("agg_time_gapfill", oracle=_M3_ORACLE)
def agg_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup (the hypertable time_bucket_gapfill
    surface): a dense hour grid is GENERATED from the observed bounds
    (sequence + explode — one row in, rows out, no driver loop), crossed
    with the observed type dimension, and the real rollup left-joins onto
    it so silent gaps become explicit zeros — what downstream forecasting
    (q6) and anomaly scoring need.

    Scale: grid size = hours×types (~10⁵/decade) — broadcast-sized
    regardless of fact volume; the only full-data pass is the rollup
    itself. The bounds agg is a 1-row all-reduce."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.agg(F.min(hour).alias("mn"), F.max(hour).alias("mx"))
    grid = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR")))
        .alias("bucket"))
    types = ev.select("event_type").distinct()
    agg = (ev.groupBy(hour.alias("bucket"), "event_type")
           .agg(F.count(F.lit(1)).alias("c")))
    return (
        grid.crossJoin(F.broadcast(types))
        .join(agg, ["bucket", "event_type"], "left")
        .select("event_type", "bucket",
                F.coalesce("c", F.lit(0)).alias("cnt"))
        .orderBy("event_type", "bucket")
    )


# --- M4: tf-idf --------------------------------------------------------------

_M4_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(n.n * 1.0 / df.df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
  WHERE tf.doc_id < 25
), ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rk
  FROM scored
)
SELECT doc_id, rk, term, round(score, 6) AS tfidf
FROM ranked WHERE rk <= 3
ORDER BY doc_id, rk
"""


@contract("text_tfidf", oracle=_M4_ORACLE)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf: term frequency × ln(N/df), top-3 terms per document (J7's
    tf-df tables composed into a score). The idf factor is computed once
    per TERM (df grain, ~vocabulary-sized) and joined in — never
    recomputed per (doc, term) row. N arrives via a broadcast 1-row cross
    join. Rank ties (equal tf and df ⟹ bit-identical scores) break on the
    term itself, so ordering is engine-deterministic; ln() on identical
    double inputs agrees across engines well inside the 6-dp rounding."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(F.split(F.lower("text"), " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf25 = tf.where(F.col("doc_id") < 25)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    score = F.col("tf") * F.log(F.col("n") * F.lit(1.0) / F.col("df"))
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term"))
    # Join direction matters at corpus scale: the planner used to broadcast
    # the FULL-vocabulary df table (unbounded — distinct tokens grow with
    # the corpus) to probe a 25-doc tf side. Build on the bounded side
    # instead: broadcast tf25 (≤ the 25 target docs' terms) and stream the
    # vocabulary through it. Time-neutral at sf0.1 (0.462 vs 0.457 s
    # min-of-5 interleaved), inner-join output identical (r14, §3.1).
    return (
        df.join(F.broadcast(tf25), "term").crossJoin(F.broadcast(n))
        .select("doc_id", "term", score.alias("score"))
        .withColumn("rk", rk)
        .where(F.col("rk") <= 3)
        .select("doc_id", "rk", "term", F.round("score", 6).alias("tfidf"))
        .orderBy("doc_id", "rk")
    )


# --- M5: the full corpus-curation pipeline -----------------------------------

_M5_ORACLE = """
WITH tgt AS (
  SELECT * FROM documents WHERE lang IN ('en', 'de', 'es', 'fr')
), q AS (
  SELECT * FROM tgt WHERE n_chars BETWEEN 150 AND 450
), e AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM q) WHERE rn = 1
), s AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w)-2)]) AS sh
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM e)
), dups AS (
  SELECT DISTINCT b.doc_id AS doc_id
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.sh, b.sh)) * 1.0
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
), kept AS (
  SELECT e.* FROM e LEFT JOIN dups ON e.doc_id = dups.doc_id
  WHERE dups.doc_id IS NULL
)
SELECT t.lang,
       count(*) AS total,
       count(*) - (SELECT count(*) FROM q WHERE q.lang = t.lang)
         AS q_dropped,
       (SELECT count(*) FROM q WHERE q.lang = t.lang)
         - (SELECT count(*) FROM e WHERE e.lang = t.lang) AS exact_dropped,
       (SELECT count(*) FROM e WHERE e.lang = t.lang)
         - (SELECT count(*) FROM kept WHERE kept.lang = t.lang)
         AS neardup_dropped,
       (SELECT count(*) FROM kept WHERE kept.lang = t.lang) AS kept,
       coalesce((SELECT CAST(sum(len(string_split(lower(kept.text), ' ')))
                        AS BIGINT)
                 FROM kept WHERE kept.lang = t.lang), 0) AS kept_tokens
FROM tgt t
GROUP BY t.lang
ORDER BY t.lang
"""


@contract("curation_pipeline", oracle=_M5_ORACLE)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation pipeline end-to-end with per-stage, per-lang
    accounting: language allowlist → length bounds (J10's rules) → exact
    dedup (keep-min-doc_id per sha2 digest) → near-dup removal (exact
    3-gram Jaccard ≥ 0.8 via the J21 inverted-index kernel, smaller-id
    canonical) → kept docs + token budget. This is the whole
    training-data story in one declarative plan; the report row per lang
    is what a dataset card publishes.

    100 TB: every stage is the scale-documented form — digest-keyed dedup
    shuffle (32-byte keys), inverted-index candidates (see SCALE.md
    §Curation for the df-cap hazard; swap J2's MinHash kernel in for
    boilerplate-heavy corpora), and the accounting aggregates are
    lang-grained (broadcast-sized)."""
    from silvia_spark.functions.training_ops import jaccard_pairs
    from silvia_spark.io import managed_persist

    d = load_table(spark, sf_dir, "documents")
    tgt = d.where(F.col("lang").isin("en", "de", "es", "fr"))
    # ONE annotated lineage instead of per-stage re-derivations: the old
    # per_lang(tgt)/per_lang(q)/per_lang(e)/kept_stats join re-referenced
    # the stage frames and Catalyst materialized the base scan FIVE times
    # (no plan-level common-subtree elimination). Stage membership is now
    # a set of flags on one frame, persisted once (it feeds the jaccard
    # kernel AND the accounting), and the report is a single conditional
    # aggregation — one documents scan, cache reads after it.
    rn = F.row_number().over(
        Window.partitionBy(F.sha2(F.col("text"), 256), F.col("is_q"))
        .orderBy("doc_id"))
    base = managed_persist(
        tgt.select("doc_id", "lang", "text",
                   F.col("n_chars").between(150, 450).alias("is_q"))
        .withColumn("is_e", F.col("is_q") & (rn == 1)),
        slot="curation_pipeline_base")
    dups = (jaccard_pairs(base.where("is_e").select("doc_id", "text"), 0.8)
            .select(F.col("doc_b").alias("dup_id")).distinct())
    flagged = (base.join(dups, base.doc_id == dups.dup_id, "left")
               .withColumn("is_kept",
                           F.col("is_e") & F.col("dup_id").isNull()))

    tok = F.size(F.split(F.lower("text"), " "))
    out = flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if("is_q").alias("n_q"),
        F.count_if("is_e").alias("n_e"),
        F.count_if("is_kept").alias("n_kept"),
        F.sum(F.when(F.col("is_kept"), tok).otherwise(0))
        .alias("kept_tokens"))
    return (
        out.select(
            "lang", "total",
            (F.col("total") - F.col("n_q")).alias("q_dropped"),
            (F.col("n_q") - F.col("n_e")).alias("exact_dropped"),
            (F.col("n_e") - F.col("n_kept")).alias("neardup_dropped"),
            F.col("n_kept").alias("kept"),
            "kept_tokens")
        .orderBy("lang")
    )
