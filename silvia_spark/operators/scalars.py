"""Scalar function operators — SURVEY.md §2.H (H1–H10).

One contract query per function family. All row-level expressions run inside
whole-stage codegen (no Python). Oracle SQL is written per-key in DuckDB's
dialect, never transliterated — the known drift points (SURVEY §7 hard part
5) are called out inline: regexp_replace global flag, int division, cast
double→int rounding vs truncation, double→string formatting, day-of-week
numbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silvia_spark.io import load_table, load_tables
from silvia_spark.registry import contract


# --- H1: string functions ----------------------------------------------------

_H1_ORACLE = """
SELECT p_partkey,
       upper(p_name) AS uname,
       lower(p_type) AS ltype,
       trim(concat('  ', p_name, '  ')) AS trimmed,
       substr(p_name, 1, 5) AS sub5,
       length(p_name) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_name, ' ', '_') AS underscored,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
       string_split(p_name, ' ')[1] AS first_word
FROM part
WHERE p_partkey < 500
ORDER BY p_partkey
"""


@contract("scalar_string", oracle=_H1_ORACLE)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.lower("p_type").alias("ltype"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  ")))
            .alias("trimmed"),
            F.substring("p_name", 1, 5).alias("sub5"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_"))
            .alias("underscored"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
            F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        )
        .orderBy("p_partkey")
    )


# --- H2: regexp --------------------------------------------------------------

# Drift: DuckDB regexp_replace replaces FIRST match unless the 'g' flag is
# given; Spark's is global by default.
_H2_ORACLE = """
SELECT p_partkey, p_name,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
       CAST(regexp_matches(p_name, '^(red|blue|hot|cold)') AS INTEGER) AS has_temp_color
FROM part
WHERE p_partkey < 500
ORDER BY p_partkey
"""


@contract("scalar_regexp", oracle=_H2_ORACLE)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return (
        p.select(
            "p_partkey", "p_name",
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
            F.col("p_name").rlike("^(red|blue|hot|cold)").cast("int")
            .alias("has_temp_color"),
        )
        .orderBy("p_partkey")
    )


# --- H3: date/time functions -------------------------------------------------

# Drift: Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6.
# We emit ISO day-of-week (1=Monday..7): Spark weekday()+1 == DuckDB isodow.
_H3_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mth,
       day(o_orderdate) AS dy,
       quarter(o_orderdate) AS qtr,
       isodow(o_orderdate) AS iso_dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
"""


@contract("scalar_date", oracle=_H3_ORACLE)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mth"),
            F.dayofmonth("o_orderdate").alias("dy"),
            F.quarter("o_orderdate").alias("qtr"),
            (F.weekday("o_orderdate") + 1).alias("iso_dow"),
            F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz")
            .alias("month_start"),
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1995-01-01").cast("date"))
            .alias("days_since_95"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        )
        .orderBy("o_orderkey")
    )


# --- H4: math functions ------------------------------------------------------

# floor/ceil/abs/sign/mod are exact; sqrt is IEEE-exact; ln/log10/pow are
# libm-dependent in the last ulp → rounded to 6dp (transcendental outputs
# never sit on half-way decimal boundaries, unlike money values).
_H4_ORACLE = """
SELECT o_orderkey,
       CAST(floor(o_totalprice) AS BIGINT) AS fl,
       CAST(ceil(o_totalprice) AS BIGINT) AS cl,
       abs(o_totalprice - 100000) AS dist_100k,
       round(sqrt(o_totalprice), 6) AS sqrt_price,
       round(ln(o_totalprice), 6) AS ln_price,
       round(log10(o_totalprice), 6) AS log10_price,
       round(pow(o_totalprice / 100000, 2), 6) AS pow2,
       o_orderkey % 7 AS mod7,
       CAST(sign(o_totalprice - 150000) AS INTEGER) AS sign_150k
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
"""


@contract("scalar_math", oracle=_H4_ORACLE)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    tp = F.col("o_totalprice")
    return (
        o.select(
            "o_orderkey",
            F.floor(tp).alias("fl"),
            F.ceil(tp).alias("cl"),
            F.abs(tp - 100000).alias("dist_100k"),
            F.round(F.sqrt(tp), 6).alias("sqrt_price"),
            F.round(F.log(tp), 6).alias("ln_price"),
            F.round(F.log10(tp), 6).alias("log10_price"),
            F.round(F.pow(tp / 100000, 2), 6).alias("pow2"),
            (F.col("o_orderkey") % 7).alias("mod7"),
            F.signum(tp - 150000).cast("int").alias("sign_150k"),
        )
        .orderBy("o_orderkey")
    )


# --- H5: conditional ---------------------------------------------------------

_H5_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS tier,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
       greatest(o_totalprice, 150000.0) AS at_least_150k,
       least(CAST(o_custkey AS BIGINT), CAST(o_orderkey AS BIGINT)) AS min_key
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
"""


@contract("scalar_conditional", oracle=_H5_ORACLE)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 300000, "high")
            .when(F.col("o_totalprice") >= 100000, "mid")
            .otherwise("low").alias("tier"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")),
                       F.lit("OPEN")).alias("status_or_open"),
            F.greatest(F.col("o_totalprice"), F.lit(150000.0))
            .alias("at_least_150k"),
            F.least(F.col("o_custkey"), F.col("o_orderkey")).alias("min_key"),
        )
        .orderBy("o_orderkey")
    )


# --- H6: array functions -----------------------------------------------------

_H6_ORACLE = """
WITH nl AS (
  SELECT n_name, list(s_name ORDER BY s_name) AS suppliers
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name,
       len(suppliers) AS n_sup,
       list_contains(suppliers, 'supplier_0') AS has_sup0,
       len(list_distinct(suppliers)) AS n_distinct,
       array_to_string(suppliers[1:3], '|') AS first3,
       list_reverse_sort(suppliers)[1] AS max_name
FROM nl
ORDER BY n_name
"""


@contract("scalar_array", oracle=_H6_ORACLE)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kernel over per-nation supplier lists: size/contains/distinct/
    slice/sort. Lists are canonical (sorted at build) so hashes match."""
    t = load_tables(spark, sf_dir, "supplier", "nation")
    nl = (
        t["supplier"]
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sort_array(F.collect_list("s_name")).alias("suppliers"))
    )
    return (
        nl.select(
            "n_name",
            F.size("suppliers").alias("n_sup"),
            F.array_contains("suppliers", "supplier_0").alias("has_sup0"),
            F.size(F.array_distinct("suppliers")).alias("n_distinct"),
            F.concat_ws("|", F.slice("suppliers", 1, 3)).alias("first3"),
            F.element_at(F.sort_array("suppliers", asc=False), 1)
            .alias("max_name"),
        )
        .orderBy("n_name")
    )


# --- H7: map functions -------------------------------------------------------

_H7_ORACLE = """
SELECT event_type, count(*) AS cnt
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("scalar_map", oracle=_H7_ORACLE)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips counts through a MapType column (map_from_entries →
    map_keys → element_at → explode back to long form) so the map kernel is
    exercised while the emitted rows stay oracle-comparable (DuckDB map
    syntax differs — SURVEY §2.H7)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    as_map = counts.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return (
        as_map.select(F.explode(F.map_keys(F.col("m"))).alias("event_type"),
                      F.col("m").alias("m"))
        .select("event_type",
                F.element_at(F.col("m"), F.col("event_type")).alias("cnt"))
        .orderBy("event_type")
    )


# --- H8: JSON ----------------------------------------------------------------

_H8_ORACLE = """
SELECT event_type,
       ((sum(CAST(round(CAST(json_extract_string(props, '$.k') AS DOUBLE)
                        * 1000000) AS BIGINT)) / 1000000.0)
        / count(props)) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       count(*) AS cnt
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("scalar_json", oracle=_H8_ORACLE)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-VARCHAR via a single typed from_json parse per row; every
    extracted field is a struct getField on that one parse. (The
    per-extraction get_json_object API re-parses the document for each
    path — 2x the JSON work for two fields — so the hot path amortizes one
    from_json instead; that swap alone cut this query ~25%.)"""
    ev = load_table(spark, sf_dir, "events")
    k_struct = F.from_json(F.col("props"), "k INT")
    return (
        ev.select("event_type", "props",
                  k_struct.getField("k").cast("double").alias("k_dbl"),
                  k_struct.getField("k").alias("k_int"))
        .groupBy("event_type")
        .agg(
            ((F.sum(F.round(F.col("k_dbl") * 1_000_000).cast("bigint"))
              / F.lit(1_000_000.0)) / F.count("props")).alias("avg_k"),
            F.max("k_int").alias("max_k"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("event_type")
    )


# --- H9: casts ---------------------------------------------------------------

# Drift: CAST(double AS INT) truncates in Spark but ROUNDS in DuckDB →
# floor() first on both sides. double→string formatting also differs
# (scientific notation thresholds) → never cast double to string directly.
_H9_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor_int,
       CAST('3.5' AS DOUBLE) AS str_to_dbl,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
"""


@contract("scalar_cast", oracle=_H9_ORACLE)
def scalar_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return (
        o.select(
            "o_orderkey",
            F.col("o_orderkey").cast("string").cast("bigint")
            .alias("key_roundtrip"),
            F.floor(F.col("o_totalprice")).cast("bigint")
            .alias("price_floor_int"),
            F.lit("3.5").cast("double").alias("str_to_dbl"),
            F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
            .alias("ts_str"),
        )
        .orderBy("o_orderkey")
    )


# --- H10: hashing ------------------------------------------------------------

_H10_ORACLE = """
SELECT c_custkey,
       sha256(c_name) AS sha,
       md5(c_name) AS md5_hex,
       ascii(substr(c_name, length(c_name), 1)) % 8 AS bucket
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
"""


@contract("scalar_hash", oracle=_H10_ORACLE)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes match across engines (sha256/md5 are specs);
    Spark's ``hash()`` (Murmur3-with-Spark-seed) deliberately does NOT
    appear in the contract — it's engine-specific. Bucketing here derives
    from a portable expression instead."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    return (
        c.select(
            "c_custkey",
            F.sha2(F.col("c_name"), 256).alias("sha"),
            F.md5(F.col("c_name")).alias("md5_hex"),
            (F.ascii(F.substring(F.col("c_name"), -1, 1)) % 8).alias("bucket"),
        )
        .orderBy("c_custkey")
    )


# --- H11: pivot → unpivot round-trip -----------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_H11_ORACLE = """
SELECT year(o_orderdate) AS yr, o_orderpriority AS priority,
       count(*) AS cnt
FROM orders
GROUP BY 1, 2
ORDER BY yr, priority
"""


@contract("pivot_unpivot", oracle=_H11_ORACLE)
def pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to a wide per-year × priority count matrix (explicit value
    list — never let pivot scan for distinct values at scale), then melt
    back to long form with unpivot. Hash-checked against the direct long
    aggregation, so the round-trip is proven lossless. Empty cells become
    NULL under unpivot and are filtered, matching the group-by's absent
    rows."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    return (
        wide.unpivot("yr", _PRIORITIES, "priority", "cnt")
        .where(F.col("cnt").isNotNull())
        .orderBy("yr", "priority")
    )


# --- H12: outer generator with position ---------------------------------------

_H12_ORACLE = """
WITH s AS (
  SELECT doc_id,
         [x for x in string_split(lower(text), ' ') if len(x) >= 8] AS l
  FROM documents WHERE doc_id < 100
), e AS (
  SELECT doc_id, len(l) AS n,
         unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS tok,
         generate_subscripts(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END, 1)
           AS p
  FROM s
)
SELECT doc_id, CASE WHEN n = 0 THEN NULL ELSE p - 1 END AS pos, tok
FROM e
ORDER BY doc_id, pos
"""


@contract("generator_outer_pos", oracle=_H12_ORACLE)
def generator_outer_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_OUTER: the generator null-semantics trap. A plain
    explode silently DROPS every row whose array is empty (docs with no
    long token here), deflating downstream counts; the outer variant
    keeps the row as (pos NULL, tok NULL). The oracle emulates outer
    unnest with a [NULL] substitution CASE, so the hash check pins the
    exact survivor set and the 0-based position numbering. 100 TB: a
    generator is a zero-shuffle 1→N map either way — the contract is
    about correctness of the row multiplicity, which no plan property
    shows."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.filter(F.split(F.lower("text"), " "),
                    lambda x: F.length(x) >= 8)
    return (
        d.select("doc_id", toks.alias("l"))
        .select("doc_id", F.posexplode_outer("l").alias("pos", "tok"))
        .orderBy("doc_id", "pos")
    )


# --- H13: try_-arithmetic null semantics --------------------------------------

_H13_ORACLE = """
SELECT o_orderkey,
       o_totalprice / nullif(o_custkey % 5, 0) AS safe_ratio,
       CAST(NULL AS BIGINT) AS overflow_add
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
"""


@contract("scalar_try_arith", oracle=_H13_ORACLE)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: ``try_divide`` yields NULL on a zero divisor
    (matching SQL's NULLIF idiom, not an exception and not Inf) and
    ``try_add`` yields NULL on BIGINT overflow (Long.MAX + positive key
    overflows for every row here; the oracle states the expected
    constant NULL since DuckDB would raise instead — the point of the
    contract is that a 100 TB job must NOT die at row 10¹² for a
    poisoned value). Division of identical doubles is IEEE-identical
    cross-engine, so safe_ratio hash-matches exactly."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return (
        o.select(
            "o_orderkey",
            F.try_divide("o_totalprice", F.col("o_custkey") % 5)
            .alias("safe_ratio"),
            F.try_add(F.lit(9223372036854775807), F.col("o_orderkey") + 1)
            .alias("overflow_add"))
        .orderBy("o_orderkey")
    )


# --- H14: URL parsing ---------------------------------------------------------

_H14_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || doc_id
           || '?lang=' || lang AS url
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_q
FROM u
ORDER BY doc_id
"""


@contract("scalar_url_parse", oracle=_H14_ORACLE)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the native ``parse_url`` (HOST / PATH /
    QUERY:key) over deterministic synthesized URLs — the domain-filtering
    primitive of every web-corpus pipeline (per-domain rates in J31
    would key on exactly this HOST). The oracle rebuilds the same parts
    with anchored regexes, pinning parse_url's component semantics
    against an independent implementation. Zero shuffle, scan-rate."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/docs/"), F.col("doc_id"),
                   F.lit("?lang="), F.col("lang"))
    u = d.select("doc_id", url.alias("url"))
    return (
        u.select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_q"))
        .orderBy("doc_id")
    )


# --- H15: radix formatting ----------------------------------------------------

_H15_ORACLE = """
SELECT p_partkey,
       to_base(p_partkey, 16) AS hex_key,
       to_base(p_partkey, 2) AS bin_key,
       to_base(p_partkey, 36) AS b36_key
FROM part WHERE p_partkey < 500
ORDER BY p_partkey
"""


@contract("scalar_radix", oracle=_H15_ORACLE)
def scalar_radix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radix formatting: keys rendered in base 16/2/36 — the id-encoding
    primitive behind compact shard names and fingerprint prefixes
    (J13's SimHash bands render this way at scale). Spark's ``conv``
    against DuckDB's independent ``to_base`` pins digit alphabet and
    case agreement (both uppercase, no padding). Zero shuffle."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return (
        p.select(
            "p_partkey",
            F.conv(F.col("p_partkey").cast("string"), 10, 16).alias("hex_key"),
            F.conv(F.col("p_partkey").cast("string"), 10, 2).alias("bin_key"),
            F.conv(F.col("p_partkey").cast("string"), 10, 36).alias("b36_key"))
        .orderBy("p_partkey")
    )


# --- H16: scalar bit operations -----------------------------------------------

_H16_ORACLE = """
SELECT p_partkey,
       p_partkey & 255 AS low_byte,
       p_partkey | 4096 AS with_flag,
       xor(p_partkey, 170) AS xored,
       p_partkey << 3 AS shl3,
       p_partkey >> 2 AS shr2
FROM part WHERE p_partkey < 400
ORDER BY p_partkey
"""


@contract("scalar_bit_ops", oracle=_H16_ORACLE)
def scalar_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bit twiddling — mask extraction, flag setting, XOR mixing,
    shifts — the key-packing primitives under every fingerprint and
    composite-id scheme (J13 packs SimHash bands exactly this way).
    Pure integer ops, bit-identical everywhere. Zero shuffle."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 400)
    k = F.col("p_partkey")
    return (
        p.select(
            "p_partkey",
            k.bitwiseAND(F.lit(255)).alias("low_byte"),
            k.bitwiseOR(F.lit(4096)).alias("with_flag"),
            k.bitwiseXOR(F.lit(170)).alias("xored"),
            F.shiftleft(k, 3).alias("shl3"),
            F.shiftright(k, 2).alias("shr2"))
        .orderBy("p_partkey")
    )


# --- H17: ISO calendar extraction ---------------------------------------------

_H17_ORACLE = """
SELECT o_orderkey,
       weekofyear(o_orderdate) AS iso_week,
       isodow(o_orderdate) AS iso_dow,
       quarter(o_orderdate) AS qtr
FROM orders WHERE o_orderkey < 1500
ORDER BY o_orderkey
"""


@contract("scalar_datetime_iso", oracle=_H17_ORACLE)
def scalar_datetime_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO calendar fields — the cross-engine numbering trap made
    explicit: Spark's ``dayofweek`` is 1=Sunday while the ISO day the
    oracle's ``isodow`` returns is 1=Monday, so the contract converts
    ((dayofweek+5) % 7)+1 and the hash check proves the mapping on
    every row (weekofyear is ISO in both engines; quarter agrees).
    Shipping the wrong numbering silently shifts every weekly rollup by
    one day — a bug no row count catches. Zero shuffle."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1500)
    iso_dow = ((F.dayofweek("o_orderdate") + 5) % 7) + 1
    return (
        o.select(
            "o_orderkey",
            F.weekofyear("o_orderdate").alias("iso_week"),
            iso_dow.alias("iso_dow"),
            F.quarter("o_orderdate").alias("qtr"))
        .orderBy("o_orderkey")
    )


# --- H18: VARIANT semi-structured access --------------------------------------

# A nested JSON doc is CONSTRUCTED per event (object + array + nested
# object) so the contract exercises path navigation, not just flat
# extraction; DuckDB replicates the same construction and reads it with
# its JSON operators — two independent semi-structured engines pinned to
# one answer.
_H18_ORACLE = """
WITH j AS (
  SELECT event_id,
         json_object('k', CAST(json_extract(props, '$.k') AS INT),
                     'arr', json_array(event_id % 5, user_id % 7),
                     'meta', json_object('t', event_type)) AS doc
  FROM events
)
SELECT event_id,
       CAST(json_extract(doc, '$.k') AS INT) AS k_int,
       CAST(json_extract(doc, '$.arr[1]') AS BIGINT) AS arr1,
       json_extract_string(doc, '$.meta.t') AS meta_t,
       json_extract_string(doc, '$.nope') AS missing
FROM j
WHERE event_id < 500
ORDER BY event_id
"""


@contract("scalar_variant", oracle=_H18_ORACLE)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: ``parse_json`` once per row into the
    binary variant encoding, then typed path access with ``variant_get``
    (object field, array index, nested object) and the NULL-on-miss
    ``try_variant_get``. At scale this is the modern replacement for
    repeated ``get_json_object`` calls — ONE parse per row and O(1)
    binary navigation per path instead of N text re-parses, and a
    variant column persisted to parquet keeps that encoding. The doc is
    built per row (object + array + nested object) so the paths
    exercise real navigation; DuckDB's JSON operators replicate the
    construction and reads. Zero shuffle — pure codegen projection
    around the variant kernel."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    # to_json(struct(...)) rather than string concat: both engines then
    # escape embedded quotes/backslashes in string values identically, so
    # a hostile event_type degrades to a hash comparison instead of a
    # divergent parse_json failure. ignoreNullFields=false keeps
    # "k": null present (to_json drops null fields by default) so the
    # non-try variant_get path below always finds the key.
    doc = F.to_json(
        F.struct(
            k.alias("k"),
            F.array((F.col("event_id") % 5),
                    (F.col("user_id") % 7)).alias("arr"),
            F.struct(F.col("event_type").alias("t")).alias("meta")),
        {"ignoreNullFields": "false"})
    v = F.parse_json(doc)
    return (
        ev.where(F.col("event_id") < 500)
        .select("event_id",
                F.variant_get(v, "$.k", "int").alias("k_int"),
                F.variant_get(v, "$.arr[1]", "bigint").alias("arr1"),
                F.variant_get(v, "$.meta.t", "string").alias("meta_t"),
                F.try_variant_get(v, "$.nope", "string").alias("missing"))
        .orderBy("event_id")
    )


# --- H19: collation-aware comparison / grouping -------------------------------

# Mixed-case variants are PLANTED (each base word appears in three case
# styles), so the collated groupBy has real folding work. The group
# REPRESENTATIVE under a case-insensitive collation is tie-broken
# nondeterministically by both engines, so the output exposes only
# determinate values: the BINARY min of the raw members, the member
# count, and the binary-distinct variant count.
_H19_ORACLE = """
WITH planted AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN base
           WHEN 1 THEN upper(base)
           ELSE upper(substr(base, 1, 1)) || substr(base, 2)
         END AS s
  FROM (
    SELECT doc_id,
           CASE doc_id % 5 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
                           WHEN 2 THEN 'gamma' WHEN 3 THEN 'delta'
                           ELSE 'epsilon' END AS base
    FROM documents
  )
)
SELECT min(s) AS repr,
       count(*) AS members,
       count(DISTINCT s) AS n_case_variants
FROM planted
GROUP BY s COLLATE NOCASE
ORDER BY repr
"""


@contract("scalar_collation", oracle=_H19_ORACLE)
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4's collation surface,
    like H18 is its VARIANT surface): grouping under the UTF8_LCASE
    collation folds case variants into one group WITHOUT rewriting the
    data — the collation travels with the expression, so joins/sorts/
    groupings downstream inherit it, where a lower() rewrite loses the
    original strings. DuckDB runs the same fold through COLLATE NOCASE —
    two independent collation implementations pinned to one grouping.
    The contract deliberately outputs only determinate values (binary
    min representative, member count, binary-distinct variant count):
    the collated group's representative string is tie-broken by
    first-arrival in BOTH engines, the classic nondeterminism trap this
    contract documents. Zero shuffle before the 5-group aggregate."""
    d = load_table(spark, sf_dir, "documents")
    base = (F.when(F.col("doc_id") % 5 == 0, "alpha")
            .when(F.col("doc_id") % 5 == 1, "beta")
            .when(F.col("doc_id") % 5 == 2, "gamma")
            .when(F.col("doc_id") % 5 == 3, "delta")
            .otherwise("epsilon"))
    s = (F.when(F.col("doc_id") % 3 == 0, base)
         .when(F.col("doc_id") % 3 == 1, F.upper(base))
         .otherwise(F.initcap(base)))
    return (
        d.select(s.alias("s"))
        .groupBy(F.collate(F.col("s"), "UTF8_LCASE").alias("sc"))
        .agg(F.min(F.collate(F.col("s"), "UTF8_BINARY")).alias("repr"),
             F.count(F.lit(1)).alias("members"),
             F.countDistinct(
                 F.collate(F.col("s"), "UTF8_BINARY"))
             .alias("n_case_variants"))
        .select("repr", "members", "n_case_variants")
        .orderBy("repr")
    )
