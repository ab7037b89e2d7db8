"""Scale-guard behavior tests — the code paths that only matter on
pathological corpora (degenerate LSH buckets) must demonstrably bound work,
and must be no-ops on this corpus (the contracts' hash-green status already
proves the latter at the driver level).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from silvia_spark.functions.llm_extras import bucket_keys, cap_buckets
from silvia_spark.io import load_table
from tests.conftest import SF_SMALL


def test_cap_buckets_drops_only_oversized(spark):
    df = spark.createDataFrame(
        [(i, 0, 7) for i in range(10)]        # one hot bucket: 10 members
        + [(100 + i, 0, i + 50) for i in range(4)],  # 4 singleton buckets
        "vec_id long, table_id int, bucket_key long")
    capped = cap_buckets(df, cap=5)
    rows = capped.collect()
    assert len(rows) == 4
    assert all(r.bucket_key >= 50 for r in rows)


def test_cap_of_one_kills_all_candidate_pairs(spark):
    e = load_table(spark, SF_SMALL, "embeddings")
    buckets = cap_buckets(bucket_keys(spark, e), cap=1)
    left = buckets.select(F.col("vec_id").alias("a"), "table_id", "bucket_key")
    right = buckets.select(F.col("vec_id").alias("b"), "table_id", "bucket_key")
    pairs = (left.join(right, ["table_id", "bucket_key"])
             .where(F.col("a") < F.col("b")))
    assert pairs.limit(1).count() == 0


def test_production_cap_is_noop_on_corpus(spark):
    e = load_table(spark, SF_SMALL, "embeddings")
    from silvia_spark.functions.llm_extras import _ANN_BUCKET_CAP
    raw = bucket_keys(spark, e)
    assert cap_buckets(raw, _ANN_BUCKET_CAP).count() == raw.count()


def test_dpp_fires_in_scan_dpp_join(spark):
    """L4's contract claim: the fact scan's PartitionFilters must carry a
    runtime dynamicpruningexpression injected from the dim filter."""
    from silvia_spark import registry

    registry.load_all_modules()
    df = registry.QUERIES["scan_dpp_join"](spark, SF_SMALL)
    df.toArrow()  # settle AQE so the final plan is inspectable
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, "DPP did not fire on the fact scan"
