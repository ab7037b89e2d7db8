"""Multiprobe-LSH crossover measurement (r08 verdict item 5).

BENCH_sf1_heavy.json showed multiprobe2 LOSING to base LSH in wall time
at 20k vectors (246 s vs 184 s) despite 4× less GEMM — the docstring's
"same recall at less work" pitch tells only the index-build half of the
story. This tool times the three stages SEPARATELY per variant:

- index  — hyperplane GEMM + bucket-key aggregation (the stage the
  table-count knob shrinks: 64 → 24 → 16 tables);
- cand   — same-bucket self-join + distinct (the stage probe fan-out
  GROWS: 1× → 2× → 4× probe keys on the join side);
- verify — exact-cosine scoring of the distinct candidates (scales with
  candidate count, i.e. with probe fan-out × bucket occupancy).

at sf0.1 (2k vectors) and on the sf1 corpus (20k vectors, the sharded
.bench_sf1_dv copy built by tools/bench_sf1_heavy.py — run that first
if missing). Writes ANN_CROSSOVER.json; conclusions go in SCALE.md §ANN
and the multiprobe contract docstrings.

Run: python tools/ann_crossover.py [--sf01-only]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".bench_sf1_dv")


def _candidates(which: str, buckets):
    """Replicate each contract's candidate construction exactly."""
    from silvia_spark.functions.llm_extras import (_ANN_BUCKET_CAP,
                                                   cap_buckets)

    if which == "base":
        left = buckets.select(F.col("vec_id").alias("vec_a"),
                              "table_id", "bucket_key")
        right = buckets.select(F.col("vec_id").alias("vec_b"),
                               "table_id", "bucket_key")
        return (left.join(right, ["table_id", "bucket_key"])
                .where(F.col("vec_a") < F.col("vec_b"))
                .select("vec_a", "vec_b").distinct())
    base = buckets.select(F.col("vec_id").alias("vec_r"), "table_id",
                          F.col("bucket_key").alias("k"))
    probe_cols = (["probe_key"] if which == "mp1"
                  else ["probe1", "probe2", "probe12"])
    probes = buckets.select(F.col("vec_id").alias("vec_l"), "table_id",
                            F.col("bucket_key").alias("k"))
    for pc in probe_cols:
        probes = probes.union(cap_buckets(
            buckets.select(F.col("vec_id").alias("vec_l"), "table_id",
                           F.col(pc).alias("k")),
            _ANN_BUCKET_CAP, keys=("table_id", "k")))
    return (probes.join(base, ["table_id", "k"])
            .where(F.col("vec_l") != F.col("vec_r"))
            .select(F.least("vec_l", "vec_r").alias("vec_a"),
                    F.greatest("vec_l", "vec_r").alias("vec_b"))
            .distinct())


def _run(spark, e, which: str) -> dict:
    from pyspark import StorageLevel

    from silvia_spark.functions.llm_extras import (
        _ANN_BUCKET_CAP, _verify_candidates, bucket_keys,
        bucket_keys_multiprobe, bucket_keys_multiprobe2, cap_buckets)

    keys_fn = {"base": bucket_keys, "mp1": bucket_keys_multiprobe,
               "mp2": bucket_keys_multiprobe2}[which]
    t0 = time.perf_counter()
    buckets = cap_buckets(keys_fn(spark, e), _ANN_BUCKET_CAP).persist(
        StorageLevel.MEMORY_AND_DISK)
    n_bucket_rows = buckets.count()
    t_index = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand = _candidates(which, buckets).persist(
        StorageLevel.MEMORY_AND_DISK)
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_pairs = _verify_candidates(e, cand).count()
    t_verify = time.perf_counter() - t0

    cand.unpersist()
    buckets.unpersist()
    return {"index_sec": round(t_index, 2), "cand_sec": round(t_cand, 2),
            "verify_sec": round(t_verify, 2),
            "total_sec": round(t_index + t_cand + t_verify, 2),
            "bucket_rows": n_bucket_rows, "candidates": n_cand,
            "true_pairs": n_pairs}


def main() -> None:
    from silvia_spark.io import load_table
    from silvia_spark.session import get_session

    spark = get_session("silvia_ann_crossover")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"configs": {
        "base": {"tables": 64, "probes_per_table": 1},
        "mp1": {"tables": 24, "probes_per_table": 2},
        "mp2": {"tables": 16, "probes_per_table": 4}}, "corpora": {}}
    corpora = {"sf0.1": (SF01, 3)}
    if "--sf01-only" not in sys.argv and os.path.isdir(
            os.path.join(SF1, "embeddings.parquet")):
        corpora["sf1"] = (SF1, 1)
    for label, (path, reps) in corpora.items():
        e = load_table(spark, path, "embeddings")
        e.count()  # warm the scan before any timing
        res: dict = {}
        for which in ("base", "mp1", "mp2"):
            best: dict | None = None
            for _ in range(reps):
                r = _run(spark, e, which)
                if best is None or r["total_sec"] < best["total_sec"]:
                    best = r
            res[which] = best
            print(f"{label} {which}: {best}", flush=True)
        out["corpora"][label] = res

    with open(os.path.join(REPO, "ANN_CROSSOVER.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "ann_crossover", "ok": True}))


if __name__ == "__main__":
    main()
