"""Skew-join evidence under AQE — SCALE.md's claim made measurable.

Builds a zipfian join corpus (one key holding 80% of the fact rows — the
shape where one reducer does 80% of the work), then measures the
UNSALTED sort-merge join with AQE skew-splitting off vs on, asserting
the split marker (`skew=true`) in the final adaptive plan and recording
the wall-clock before/after. Also records the decline case that
justifies L2's explicit salting: when the downstream aggregation groups
on the JOIN key, AQE declines the split (splitting would break the
required distribution), so known-hot-key + same-key-agg plans must salt
— exactly what `join_skew_salted` does.

Writes SKEW_AQE.json at the repo root; bench.py's headline line carries
the compact summary so the per-round artifact holds the before/after.

Run:  python tools/skew_aqe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 4_000_000
HOT_SHARE = 0.8
COLD_KEYS = 64
REPS = 5


def _corpus(spark):
    from pyspark.sql import functions as F

    fact = spark.range(N_ROWS).select(
        F.when(F.col("id") % 10 < int(HOT_SHARE * 10), F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % COLD_KEYS)
                            .cast("string"))).alias("key"),
        (F.col("id") % 1000).cast("double").alias("value"))
    dim = spark.range(COLD_KEYS + 1).select(
        F.when(F.col("id") == COLD_KEYS, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("key"),
        (F.col("id") * 1.5).alias("weight"))
    return fact, dim


def _set_confs(spark, skew_on: bool) -> None:
    # Local-scale analogues of the 100-TB defaults: the production
    # thresholds (256 MB) never trigger on a 64 MB shuffle, so scale
    # them down with the data — factor 2 over a ~1 MB advisory target.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                   str(skew_on).lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                   "2.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def run_unsalted(spark, fact, dim, skew_on: bool):
    """The skew-splittable shape: global aggregate downstream, so AQE is
    free to split the hot partition."""
    from pyspark.sql import functions as F

    _set_confs(spark, skew_on)
    df = (fact.join(dim, "key")
          .agg(F.count(F.lit(1)).alias("c"),
               F.sum(F.col("value") * F.col("weight")).alias("s")))
    t0 = time.perf_counter()
    row = df.collect()[0]
    dt = time.perf_counter() - t0
    return dt, ("skew=true" in _final_plan(df)), (row["c"], round(row["s"]))


def run_agg_on_join_key(spark, fact, dim, skew_on: bool):
    """The decline case: groupBy(join key) downstream — AQE must keep
    the join's hash partitioning, so the hot partition stays whole."""
    from pyspark.sql import functions as F

    _set_confs(spark, skew_on)
    df = (fact.join(dim, "key")
          .groupBy("key").agg(F.count(F.lit(1)).alias("c")))
    df.collect()
    return "skew=true" in _final_plan(df)


def measure(spark) -> dict:
    fact, dim = _corpus(spark)
    run_unsalted(spark, fact, dim, True)  # warm-up
    off = on = float("inf")
    result_off = result_on = None
    split_seen = False
    for _ in range(REPS):  # interleave A/B so machine load hits both
        dt, _, result_off = run_unsalted(spark, fact, dim, False)
        off = min(off, dt)
        dt, split, result_on = run_unsalted(spark, fact, dim, True)
        on = min(on, dt)
        split_seen = split_seen or split
    assert result_off == result_on, "skew split changed the result"
    declined = run_agg_on_join_key(spark, fact, dim, True)
    return {
        "experiment": "aqe_skew_join",
        "n_rows": N_ROWS, "hot_share": HOT_SHARE,
        "unsalted_aqe_off_sec": round(off, 4),
        "unsalted_aqe_on_sec": round(on, 4),
        "speedup": round(off / on, 2),
        "skew_split_marker": split_seen,
        "declines_when_agg_on_join_key": not declined,
        "loadavg": [round(x, 2) for x in os.getloadavg()[:2]],
    }


def main() -> None:
    from silvia_spark.session import get_session

    spark = get_session("silvia_skew_aqe")
    spark.sparkContext.setLogLevel("ERROR")
    doc = measure(spark)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SKEW_AQE.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    sys.exit(main())
