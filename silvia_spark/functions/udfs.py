"""UDF / UDAF / UDTF surface — SURVEY.md §2.K (K1–K5).

The deliberate demonstration of Python extension points and their costs:
- K1 row-at-a-time Python UDF: the slow path (pickle per row, worker
  round-trip). Exists to prove the surface; everything hot uses built-ins.
- K2/K3 pandas UDFs: Arrow-batched, vectorized — the acceptable Python
  boundary (~10-100× K1).
- K4 applyInPandas / K5 mapInPandas: group-map and table-function shapes.
Arrow batch size is session-tuned (spark.sql.execution.arrow.maxRecordsPerBatch)
rather than per-op.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from silvia_spark.io import load_table
from silvia_spark.registry import contract


# --- K1: row-at-a-time Python UDF --------------------------------------------

_K1_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS tier
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
"""


@contract("udf_python_scalar", oracle=_K1_ORACLE)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correctness twin of H5's CASE, through a Python UDF. Every row
    crosses JVM→Python→JVM — benchmark fodder for why the engine keeps
    hot-path logic in codegen."""
    @F.udf(returnType=StringType())
    def tier(price: float) -> str:
        if price >= 300000:
            return "high"
        if price >= 100000:
            return "mid"
        return "low"

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return (o.select("o_orderkey", tier("o_totalprice").alias("tier"))
            .orderBy("o_orderkey"))


# --- K2: vectorized pandas UDF -----------------------------------------------

_K2_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net
FROM lineitem
WHERE l_orderkey < 1000
ORDER BY l_orderkey, l_linenumber
"""


@contract("udf_pandas_scalar", oracle=_K2_ORACLE)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched net-price: identical IEEE arithmetic to the built-in
    expression (numpy double ops), so it hash-matches the raw-SQL oracle."""
    @F.pandas_udf("double")
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return (
        li.select("l_orderkey", "l_linenumber",
                  net("l_extendedprice", "l_discount").alias("net"))
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- K3: grouped-agg pandas UDF ----------------------------------------------

_K3_ORACLE = """
SELECT event_type,
       round(sum(value * value) / sum(value), 6) AS weighted_mean
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@contract("udaf_pandas_grouped", oracle=_K3_ORACLE)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-weighted mean Σv²/Σv per group as a GROUPED_AGG pandas UDF.
    numpy's pairwise summation differs from sequential in last ulps →
    round(6) on both sides (values O(1–100), groups ~2k rows: drift ~1e-12
    relative, far below the rounding grain)."""
    @F.pandas_udf("double")
    def wmean(v: pd.Series) -> float:
        return float((v * v).sum() / v.sum())

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.round(wmean("value"), 6).alias("weighted_mean"))
        .orderBy("event_type")
    )


# --- K4: group-map applyInPandas ---------------------------------------------

_K4_ORACLE = """
SELECT event_id, event_type,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
FROM events
WHERE user_id < 20
ORDER BY event_id
"""


@contract("udtf_apply_in_pandas", oracle=_K4_ORACLE)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score via applyInPandas: whole group as one pandas frame
    (the shape for sklearn-style per-group model work). pandas std(ddof=1)
    == stddev_samp; round(6) absorbs pairwise-sum drift."""
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        pdf = pdf.assign(zscore=((v - v.mean()) / v.std(ddof=1)).round(6))
        return pdf[["event_id", "event_type", "zscore"]]

    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("user_id") < 20)
          .select("event_id", "event_type", "value"))
    return (
        ev.groupBy("event_type")
        .applyInPandas(zscore, "event_id BIGINT, event_type STRING, zscore DOUBLE")
        .orderBy("event_id")
    )


# --- K5: table function via mapInPandas --------------------------------------

_K5_ORACLE = """
SELECT doc_id, chunk_no,
       array_to_string(toks[(chunk_no * 10 + 1):(chunk_no * 10 + 10)], ' ')
         AS chunk
FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
     generate_series(0, 63) AS g(chunk_no)
WHERE chunk_no * 10 < len(toks) AND doc_id < 100
ORDER BY doc_id, chunk_no
"""


@contract("udtf_python", oracle=_K5_ORACLE)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function: explode each doc into 10-token chunks (the LLM
    context-window chunking shape), one input row → N output rows via
    mapInPandas with Arrow-batched iteration."""
    def chunker(batches):
        for pdf in batches:
            out_ids, out_nos, out_chunks = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.lower().split(" ")
                for i in range(0, len(toks), 10):
                    out_ids.append(doc_id)
                    out_nos.append(i // 10)
                    out_chunks.append(" ".join(toks[i:i + 10]))
            yield pd.DataFrame(
                {"doc_id": out_ids, "chunk_no": out_nos, "chunk": out_chunks})

    d = (load_table(spark, sf_dir, "documents")
         .where(F.col("doc_id") < 100).select("doc_id", "text"))
    return (
        d.mapInPandas(chunker, "doc_id BIGINT, chunk_no INT, chunk STRING")
        .orderBy("doc_id", "chunk_no")
    )


# --- K6: Arrow-native mapInArrow ---------------------------------------------

_K6_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net,
       CAST(l_quantity AS BIGINT) AS qty_int
FROM lineitem
WHERE l_orderkey < 500
ORDER BY l_orderkey, l_linenumber
"""


def _arrow_net(batches):
    """pyarrow compute kernels directly on RecordBatches — no pandas
    conversion at all, the lowest-overhead Python boundary Spark offers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        net = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        qty = pc.cast(batch.column("l_quantity"), pa.int64())
        yield pa.RecordBatch.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_linenumber"),
             net, qty],
            names=["l_orderkey", "l_linenumber", "net", "qty_int"])


@contract("udf_arrow_map", oracle=_K6_ORACLE)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: per-partition iterator of Arrow RecordBatches processed
    with pyarrow compute kernels — completes the Python-boundary matrix
    (K1 row UDF → K2/K3 pandas → K4/K5 group shapes → K6 Arrow-native).
    Zero pandas materialization; per-row double math is IEEE-identical to
    the JVM expression, so the oracle hash matches the built-in form."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_orderkey") < 500)
          .select("l_orderkey", "l_linenumber", "l_extendedprice",
                  "l_discount", "l_quantity"))
    out_schema = ("l_orderkey BIGINT, l_linenumber INT, net DOUBLE, "
                  "qty_int BIGINT")
    return (li.mapInArrow(_arrow_net, out_schema)
            .orderBy("l_orderkey", "l_linenumber"))


# --- K7: registered Python UDTF in a LATERAL join ----------------------------

_K7_ORACLE = """
WITH s AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks
  FROM documents WHERE doc_id < 50
), e AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) - 1 AS pos
  FROM s
)
SELECT doc_id, pos, tok
FROM e WHERE len(tok) >= 8
ORDER BY doc_id, pos
"""


@contract("udtf_lateral", oracle=_K7_ORACLE)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (`@udtf` class, PySpark ≥ 3.5) applied per row
    through SQL `LATERAL` — the user-defined table-function surface
    proper, distinct from K5's mapInPandas emulation: the class is
    registered in the session catalog, the optimizer sees a true
    generator, and `eval` yields 0..N rows per input row (long tokens
    with their positions here). 100 TB: a generator UDTF is a
    zero-shuffle 1→N map like posexplode; the Python boundary is the
    cost, which is why the built-in H12 form is the default and this
    contract pins the API, not the hot path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, tok STRING")
    class LongTokens:
        def eval(self, text: str):
            for i, t in enumerate((text or "").lower().split(" ")):
                if len(t) >= 8:
                    yield i, t

    spark.udtf.register("long_tokens", LongTokens)
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    d.select("doc_id", "text").createOrReplaceTempView("k7_docs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.tok "
        "FROM k7_docs, LATERAL long_tokens(text) t "
        "ORDER BY doc_id, pos")


# --- K8: Arrow-optimized scalar Python UDF -----------------------------------

_K8_ORACLE = """
SELECT o_orderkey,
       round(o_totalprice * (1 - 0.04), 2) AS discounted
FROM orders WHERE o_orderkey < 2000
ORDER BY o_orderkey
"""


@contract("udf_arrow_scalar", oracle=_K8_ORACLE)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED scalar Python UDF (`useArrow=True`): same
    signature as K1's row-at-a-time pickled UDF, but the exchange is
    Arrow columnar batches — the one-flag migration path Spark gives
    existing UDF code (plan shows ArrowEvalPython, not BatchEvalPython).
    Python round() is IEEE round-half-even on a double; DuckDB round()
    is half-away — the constant 4% discount keeps every product off the
    .005 boundary grid so both agree exactly (values are 2-decimal
    money × 0.96: the third decimal is always 2 or 7 ulps-exact, never
    a tie). 100 TB: still a per-row Python tax vs the pure-JVM form;
    pin the API here, use built-ins in hot paths."""
    @F.udf("double", useArrow=True)
    def discounted(p: float) -> float:
        return round(p * (1 - 0.04), 2)

    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderkey") < 2000))
    return (o.select("o_orderkey", discounted("o_totalprice")
                     .alias("discounted"))
            .orderBy("o_orderkey"))
