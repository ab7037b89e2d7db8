"""Explicit StructType schemas for the ten corpus tables (FIXTURES.md).

Explicit schemas, fail-fast on drift (SURVEY.md §1.3): the engine never
relies on inference for its core tables. The Snowplow canonical enriched
event is a fixed-schema row; we keep the same stance.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

REGION = StructType([
    StructField("r_regionkey", IntegerType()),
    StructField("r_name", StringType()),
])

NATION = StructType([
    StructField("n_nationkey", IntegerType()),
    StructField("n_name", StringType()),
    StructField("n_regionkey", IntegerType()),
])

CUSTOMER = StructType([
    StructField("c_custkey", LongType()),
    StructField("c_name", StringType()),
    StructField("c_nationkey", IntegerType()),
    StructField("c_acctbal", DoubleType()),
    StructField("c_mktsegment", StringType()),
])

SUPPLIER = StructType([
    StructField("s_suppkey", LongType()),
    StructField("s_name", StringType()),
    StructField("s_nationkey", IntegerType()),
    StructField("s_acctbal", DoubleType()),
])

PART = StructType([
    StructField("p_partkey", LongType()),
    StructField("p_name", StringType()),
    StructField("p_brand", StringType()),
    StructField("p_type", StringType()),
    StructField("p_size", IntegerType()),
    StructField("p_retailprice", DoubleType()),
])

ORDERS = StructType([
    StructField("o_orderkey", LongType()),
    StructField("o_custkey", LongType()),
    StructField("o_orderstatus", StringType()),
    StructField("o_totalprice", DoubleType()),
    StructField("o_orderdate", TimestampNTZType()),
    StructField("o_orderpriority", StringType()),
])

LINEITEM = StructType([
    StructField("l_orderkey", LongType()),
    StructField("l_partkey", LongType()),
    StructField("l_suppkey", LongType()),
    StructField("l_linenumber", IntegerType()),
    StructField("l_quantity", DoubleType()),
    StructField("l_extendedprice", DoubleType()),
    StructField("l_discount", DoubleType()),
    StructField("l_tax", DoubleType()),
    StructField("l_returnflag", StringType()),
    StructField("l_linestatus", StringType()),
    StructField("l_shipdate", TimestampNTZType()),
])

# events RAW schema for ns-layout corpora (ts stored TIMESTAMP(NANOS); with
# nanosAsLong=true it reads as LongType and io.load_table rebuilds a
# TimestampNTZType column — §1.2 hazard). µs-layout corpora (the r04
# regeneration) skip this schema entirely: io sniffs the footer and reads
# the EVENTS logical schema directly.
EVENTS_RAW = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),  # nanoseconds since epoch (nanosAsLong)
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

# Logical events schema after the loader's ts reconstruction.
EVENTS = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampNTZType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

DOCUMENTS = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])

EMBEDDINGS = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
    StructField("label", IntegerType()),
])

TABLE_SCHEMAS = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = list(TABLE_SCHEMAS)
