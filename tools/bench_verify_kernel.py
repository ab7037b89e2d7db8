"""LSH verify-kernel head-to-head (r12, verdict "What's wrong" item 4):
mapInPandas numpy scoring vs the JVM codegen ``zip_with/aggregate``
cosine, at real candidate volumes.

SURVEY §4 named the codegen form preferred-if-close; it was never
measured at sf1 candidate counts. This times the IDENTICAL candidate
set (the base LSH join's output, built once and persisted) through:

- ``mapinpandas``: score_pairs_threshold — one Arrow crossing, numpy
  einsum per batch, threshold inside the kernel (the shipping path);
- ``codegen``: cosine_expr (dot64/norm64 HOF fold) + a plain Filter —
  zero Python, whole-stage codegen, but an interpreted HOF per row;
- ``pandas_udf``: the cosine() scalar pandas_udf + Filter — Arrow
  crossing WITH a Filter-over-UDF shape (included to re-measure the
  r10 double-eval hazard's cost when Catalyst duplicates it).

Counts are asserted equal across kernels before timing (same rows, so
the comparison is kernel cost only). Writes ANN_VERIFY_KERNEL.json.

Run: python tools/bench_verify_kernel.py [sf_dir] (default sf0.1;
pass /root/repo/.bench_sf1_dv for the 10x corpus)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from bench import _load_gate
    gate = _load_gate()
    from silvia_spark.functions.llm_extras import (_ANN_BUCKET_CAP,
                                                   bucket_keys,
                                                   cap_buckets)
    from silvia_spark.functions.llm_ops import (cosine, cosine_expr,
                                                score_pairs_threshold)
    from silvia_spark.io import load_table
    from silvia_spark.session import get_session

    spark = get_session("verify_kernel_bench")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, sf_dir, "embeddings")
    buckets = cap_buckets(bucket_keys(spark, e), _ANN_BUCKET_CAP)
    left = buckets.select(F.col("vec_id").alias("vec_a"),
                          "table_id", "bucket_key")
    right = buckets.select(F.col("vec_id").alias("vec_b"),
                           "table_id", "bucket_key")
    cand = (left.join(right, ["table_id", "bucket_key"])
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b").distinct())
    a = e.select(F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("eb"))
    # persist the 16-byte candidate PAIRS, never the embedding-attached
    # join (at sf1 that is 195M rows x two 64-float vectors ~ 195 GB —
    # the first cut of this tool OOMed caching it); each kernel re-runs
    # the identical embedding join, so the comparison stays apples to
    # apples with the shared join cost included on every side
    cand = cand.persist()
    n_cand = cand.count()

    def _joined():
        return cand.join(a, "vec_a").join(b, "vec_b")

    def k_shipping():
        # whatever score_pairs_threshold currently ships (r13+: the
        # scalar-UDF → DISK_ONLY persist barrier → JVM threshold)
        return score_pairs_threshold(_joined(), slot="vk_bench")

    def k_mapinpandas():
        # the r11–r12 SHIPPED kernel, pinned inline so the tool keeps
        # measuring it after score_pairs_threshold moved on
        from pyspark.sql.types import (DoubleType, StructField,
                                       StructType)

        from silvia_spark.functions.llm_ops import _np_cos

        joined = _joined()
        fields = {f.name: f for f in joined.schema.fields}
        schema = StructType([fields["vec_a"], fields["vec_b"],
                             StructField("cos_raw", DoubleType())])

        def score(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                v = _np_cos(pdf["ea"], pdf["eb"])
                m = v >= 0.4
                if not m.any():
                    continue
                out = pdf.loc[m, ["vec_a", "vec_b"]].copy()
                out["cos_raw"] = v[m]
                yield out

        return (joined.mapInPandas(score, schema)
                .select("vec_a", "vec_b",
                        F.round("cos_raw", 6).alias("cos_sim"))
                .orderBy("vec_a", "vec_b"))

    def k_codegen():
        c = cosine_expr(F.col("ea"), F.col("eb"))
        return (_joined().select("vec_a", "vec_b", c.alias("cos_raw"))
                .where(F.col("cos_raw") >= 0.4)
                .select("vec_a", "vec_b",
                        F.round("cos_raw", 6).alias("cos_sim"))
                .orderBy("vec_a", "vec_b"))

    def k_pandas_udf():
        c = cosine(F.col("ea"), F.col("eb"))
        return (_joined().select("vec_a", "vec_b", c.alias("cos_raw"))
                .where(F.col("cos_raw") >= 0.4)
                .select("vec_a", "vec_b",
                        F.round("cos_raw", 6).alias("cos_sim"))
                .orderBy("vec_a", "vec_b"))

    _singles = []

    def k_pandas_udf_single():
        # r13: SINGLE-eval scalar shape — the scored frame is persisted
        # (MEMORY_AND_DISK) before the threshold filter, so Catalyst's
        # predicate pushdown meets an InMemoryRelation barrier instead
        # of a Project it can substitute the UDF into: ONE
        # ArrowEvalPython, structurally (the r10 double-eval is
        # impossible), no asNondeterministic marker (the r11 heap
        # hazard). Cache payload is (long, long, double) — 24 B/row raw
        # — NOT the embeddings; the filter scans the cached batches
        # with batch-level min/max pruning on cos_raw for free.
        c = cosine(F.col("ea"), F.col("eb"))
        scored = (_joined()
                  .select("vec_a", "vec_b", c.alias("cos_raw"))
                  .persist())
        _singles.append(scored)
        return (scored.where(F.col("cos_raw") >= 0.4)
                .select("vec_a", "vec_b",
                        F.round("cos_raw", 6).alias("cos_sim"))
                .orderBy("vec_a", "vec_b"))

    def k_mapinarrow():
        # single crossing like mapInPandas, but pure Arrow: no pandas
        # DataFrame construction per batch, numpy reads the list
        # arrays' buffers directly
        import numpy as np
        import pyarrow as pa

        j = _joined()
        out_schema = pa.schema([
            pa.field("vec_a", pa.int64()), pa.field("vec_b", pa.int64()),
            pa.field("cos_raw", pa.float64())])

        def score(batches):
            for rb in batches:
                n = rb.num_rows
                if not n:
                    continue
                ea, eb = rb.column(2), rb.column(3)
                A = np.asarray(ea.flatten(), dtype=np.float64
                               ).reshape(n, -1)
                B = np.asarray(eb.flatten(), dtype=np.float64
                               ).reshape(n, -1)
                num = np.einsum("ij,ij->i", A, B)
                den = (np.sqrt(np.einsum("ij,ij->i", A, A))
                       * np.sqrt(np.einsum("ij,ij->i", B, B)))
                v = num / den
                m = v >= 0.4
                if not m.any():
                    continue
                idx = pa.array(np.nonzero(m)[0])
                yield pa.RecordBatch.from_arrays(
                    [rb.column(0).take(idx).cast(pa.int64()),
                     rb.column(1).take(idx).cast(pa.int64()),
                     pa.array(v[m], type=pa.float64())],
                    schema=out_schema)

        from pyspark.sql.types import (DoubleType, LongType, StructField,
                                       StructType)
        sch = StructType([StructField("vec_a", LongType()),
                          StructField("vec_b", LongType()),
                          StructField("cos_raw", DoubleType())])
        return (j.select("vec_a", "vec_b", "ea", "eb")
                .mapInArrow(score, sch)
                .select("vec_a", "vec_b",
                        F.round("cos_raw", 6).alias("cos_sim"))
                .orderBy("vec_a", "vec_b"))

    def k_pandas_udf_mapfilter():
        # r13: the OTHER single-eval shape — scalar-UDF cosine (the
        # pipelined ArrowEvalPython the study measured fastest), then
        # the threshold inside a pass-through mapInArrow stage over
        # the 24 B/row scored triple. No Filter node referencing a UDF
        # exists, so Catalyst has nothing to substitute; no
        # materialization, no cache lifecycle. The second crossing
        # carries (long, long, double) only and filters with a pure
        # pyarrow compute kernel.
        import pyarrow as pa
        import pyarrow.compute as pc

        from pyspark.sql.types import (DoubleType, LongType,
                                       StructField, StructType)

        c = cosine(F.col("ea"), F.col("eb"))
        scored = (_joined()
                  .select("vec_a", "vec_b", c.alias("cos_raw")))

        def thresh(batches):
            for rb in batches:
                if not rb.num_rows:
                    continue
                kept = rb.filter(pc.greater_equal(
                    rb.column(2), pa.scalar(0.4, pa.float64())))
                if kept.num_rows:
                    yield kept

        sch = StructType([StructField("vec_a", LongType()),
                          StructField("vec_b", LongType()),
                          StructField("cos_raw", DoubleType())])
        return (scored.mapInArrow(thresh, sch)
                .select("vec_a", "vec_b",
                        F.round("cos_raw", 6).alias("cos_sim"))
                .orderBy("vec_a", "vec_b"))

    kernels = {"shipping": k_shipping,
               "mapinpandas": k_mapinpandas, "codegen": k_codegen,
               "pandas_udf": k_pandas_udf, "mapinarrow": k_mapinarrow,
               "pandas_udf_single": k_pandas_udf_single,
               "pandas_udf_mapfilter": k_pandas_udf_mapfilter}
    only = os.environ.get("SILVIA_VK_ONLY")
    if only:
        kernels = {k: v for k, v in kernels.items()
                   if k in only.split(",") or k == "shipping"}
    if os.environ.get("SILVIA_VK_ORDER") == "rev":
        # ordering confound control: single-rep sequential sweeps can
        # favor whichever kernel runs on the most-settled box — a
        # reversed pass distinguishes kernel cost from box state
        kernels = dict(reversed(list(kernels.items())))
    def _reset():
        # drop single-eval caches OUTSIDE the timed region — otherwise
        # (a) later reps would sameResult-match the already-built
        # blocks and measure a warm read, or (b) a blocking unpersist
        # inside fn() would bill the PREVIOUS rep's teardown to this
        # one
        while _singles:
            _singles.pop().unpersist(True)
        from silvia_spark.io import clear_caches

        clear_caches()  # k_shipping's managed DISK_ONLY barrier: a
        #                 sameResult-matched rep would read the warm
        #                 blocks instead of paying the kernel

    counts = {}
    for name, fn in kernels.items():
        counts[name] = fn().count()
        _reset()
    assert len(set(counts.values())) == 1, counts

    reps = int(os.environ.get("SILVIA_VK_REPS", "3"))
    times: dict[str, float] = {}
    for name, fn in kernels.items():
        fn().toArrow()  # warm
        best = float("inf")
        for _ in range(reps):
            _reset()
            t0 = time.perf_counter()
            fn().toArrow()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        _reset()
        print(name, times[name], flush=True)

    artifact = {
        "metric": "lsh_verify_kernel_head_to_head",
        "sf_dir": sf_dir,
        "candidates": n_cand,
        "pairs_kept": next(iter(counts.values())),
        "sec": times,
        "per_million_cand_sec": {
            k: round(v / max(n_cand, 1) * 1e6, 3)
            for k, v in times.items()},
        "load_gate": gate,
        "loadavg_end": round(os.getloadavg()[0], 2),
        "note": ("identical persisted candidate input; counts asserted "
                 "equal across kernels before timing"),
    }
    out = os.path.join(REPO, "ANN_VERIFY_KERNEL.json")
    prior = {}
    if os.path.exists(out):
        try:
            prior = json.load(open(out))
        except ValueError:
            prior = {}
    prior[os.path.basename(sf_dir.rstrip("/"))] = artifact
    with open(out, "w") as f:
        json.dump(prior, f, indent=1)
    print(json.dumps(artifact))
    while _singles:
        _singles.pop().unpersist(True)
    cand.unpersist()


if __name__ == "__main__":
    main()
