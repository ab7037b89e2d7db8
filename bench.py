#!/usr/bin/env python
"""Benchmark harness — mirrors BASELINE.md's method on the Spark engine.

Runs the 13 headline contract queries (the ones BASELINE.md timed on the
DuckDB oracle) at $SPARK_GRAFT_SF_DIR (default sf0.1) on one warm
SparkSession: 1 warm-up + min of 3 timed runs per query, materialization
(collect) included. Prints ONE JSON line:

    {"metric": "headline_sweep_sec", "value": <total>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Per BASELINE.md §Notes the 2× target is only meetable with an amortized warm
session — cold JVM start (~7 s) and first-query codegen are excluded, exactly
as DuckDB's baseline excluded its own warm-up run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_pricing_summary",
    "q3_shipping_priority",
    "join_5way_star",
    "window_rank_topn",
    "topk_limit",
    "agg_count_distinct",
    "agg_rollup",
    "stream_tumbling_1h",
    "stream_session_30m",
    "scalar_json",
    "sim_topk_cosine",
    "dedup_docs_exact",
    "join_asof",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from silvia_spark.session import get_session
    from silvia_spark import registry
    registry.load_all_modules()

    spark = get_session("silvia_bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).collect()  # warm-up: plan + codegen + IO cache
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_sweep_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
