"""ANN scale paths for the similarity operators — SURVEY.md §2.J addendum.

``sim_join_threshold`` (llm_ops.py, J4) is the exact all-pairs baseline: a
cross join that is quadratic in the corpus and cannot run at 100 TB. This
module holds the scale-shaped variant:

``sim_ann_lsh`` — hyperplane (sign-random-projection) LSH similarity join:

1. Per vector, compute ``T`` bucket keys (one per hash table). A key packs
   ``B`` sign bits; bit *(t,b)* is the sign of a dot product with a
   Rademacher ±1 hyperplane (fixed seed). The dots run as ONE numpy GEMM
   per Arrow batch inside a map-only kernel (``_bucket_keys_np``, r14 —
   measured 22× the r13 JVM GEMM-by-join at sf1; that posexplode ⋈
   broadcast sign-table → hash-aggregate chain is retained as
   ``_quantized_dots``, the reference the equality tests compare
   against). Dot terms are quantized to 1e-9 and summed exactly as
   integers, so the sign bits are bit-reproducible under any
   partitioning and batch split (a double sum's last-ulp order
   sensitivity could otherwise flip a near-zero sign).
2. posexplode keys → self equi-join on ``(table_id, bucket_key)`` — only
   same-bucket pairs are ever materialized. This is the one shuffle that
   grows with candidates, keyed by 16 bytes, never by vectors.
3. ``distinct`` candidate pairs (a pair can collide in many tables), then
   exact-cosine verify against the threshold — identical verify kernel to
   the baseline, so false positives cost compute but never correctness.

Recall: a pair at cosine *c* collides in one table with p = (1 - θ/π)^B,
θ = arccos(c). At the contract threshold 0.4 (θ ≈ 66.4°, per-bit p ≈ 0.631)
with B=4, T=64 the per-pair miss probability is (1-0.631⁴)⁶⁴ ≈ 1.6e-5 —
the pipeline is deterministic (fixed seed + exact decimal sums), and the
contract's oracle is the *exact* all-pairs SQL, so the driver hash-check
proves recall = 1 on this corpus. For production thresholds (≥ 0.8,
per-bit p ≈ 0.8) the same recall needs far fewer tables; tune (B, T) with
the closed form. See SCALE.md §ANN.

At 100 TB: index work is O(n·dim·T·B) multiply-adds at BLAS speed in a
map-only stage — nothing shuffles until the bucket self-join, and the
kernel ships only (vec_id, embedding) across the Arrow boundary (guide
§4.1/§4.2). Bucket skew (dense
clusters) is handled by AQE skew-join splitting PLUS the explicit
``cap_buckets`` guard: buckets over ``_ANN_BUCKET_CAP`` members are excluded
from candidate generation, bounding the worst bucket's pair count at cap²
regardless of corpus pathology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silvia_spark.io import load_table, managed_persist
from silvia_spark.registry import contract

_ANN_BITS = 4     # bits per bucket key (selectivity)
_ANN_TABLES = 64  # OR-ed hash tables (recall)
_ANN_DIM = 64     # embedding dimensionality of the corpus
_ANN_SEED = 101   # seed for the Rademacher hyperplane family

# Degenerate-bucket guard: a bucket of size s yields s² candidate pairs, so
# one boilerplate-heavy bucket of 10⁶ vectors is 10¹² pairs — the classic
# LSH blow-up. Buckets over the cap are EXCLUDED from candidate generation
# (disclosed recall loss on pathological near-constant regions; every vector
# still participates via its other T-1 tables). The cap is far above any
# bucket this corpus produces (max observed ≪ 10³ at sf0.1), so the guarded
# and unguarded outputs are identical here — the exact all-pairs oracle
# stays the correctness gate while the guard rides the production path.
_ANN_BUCKET_CAP = 100_000

_N_PROJ = _ANN_TABLES * _ANN_BITS


def cap_buckets(buckets: DataFrame, cap: int,
                keys: tuple[str, str] = ("table_id", "bucket_key")) -> DataFrame:
    """Drop rows of (key-)buckets larger than ``cap`` members.

    One window count partitioned by the bucket key — hash-partitioned on the
    SAME key as the candidate self-join that follows, so the exchange is
    reused, not added."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (buckets.withColumn("__bn", F.count(F.lit(1)).over(w))
            .where(F.col("__bn") <= cap).drop("__bn"))


def _sign_table(spark: SparkSession, seed: int = _ANN_SEED,
                nproj: int = _N_PROJ) -> DataFrame:
    """(pos, proj_id, sgn ±1.0) Rademacher matrix, generated JVM-side from
    xxhash64 parity — no driver→executor literal transfer (a
    createDataFrame of the 16k tuples measured 3s per call), fully
    deterministic for a fixed seed. One definition serves the base and
    multiprobe hyperplane families (seed/nproj parameters)."""
    return spark.range(_ANN_DIM * nproj).select(
        F.expr(f"CAST(id div {nproj} AS INT)").alias("pos"),
        F.expr(f"CAST(pmod(id, {nproj}) AS INT)").alias("proj_id"),
        F.when(F.pmod(F.xxhash64(F.lit(seed), F.col("id")), 2) == 0,
               1.0).otherwise(-1.0).alias("sgn"),
    )


def _quantized_dots(spark: SparkSession, e: DataFrame, seed: int,
                    nproj: int) -> DataFrame:
    """(vec_id, proj_id, dot_q): integer-quantized hyperplane dot products.

    Dot terms are quantized to 1e-9 and summed as BIGINT: exact and
    order-independent (a codegen long sum, ~10× a decimal sum), and the
    ±3.2e-8 quantization can only flip a sign when |dot| is already that
    close to zero — the same measure-zero class as the hyperplane passing
    through a point. Shared by every hyperplane family (base + multiprobe)
    so the quantization constant and sign derivation have exactly one
    definition to fix.

    r14: this JVM GEMM-by-join is no longer on the query path — the
    bucket producers below moved to ``_bucket_keys_np`` (one numpy GEMM
    per Arrow batch, same quantization, bit-identical outputs pinned in
    tests/test_ann_numpy_kernel.py). Kept as the reference
    implementation the equality test compares against, and as the
    fallback shape documented in the module docstring."""
    hyper = _sign_table(spark, seed, nproj)
    ev = e.select("vec_id", F.posexplode("embedding").alias("pos", "x"))
    return (
        ev.join(F.broadcast(hyper), "pos")
        .groupBy("vec_id", "proj_id")
        .agg(F.sum(F.round(F.col("x").cast("double") * F.col("sgn")
                           * F.lit(1e9)).cast("bigint")).alias("dot_q"))
    )


# Rademacher matrices are pure functions of (seed, nproj) — constants,
# not data — so the collected form is memoized per process. The one
# tiny job that fills a slot is the same collect-at-build pattern as
# the _distinct_pairs sizing job.
_SIGN_CACHE: dict = {}


def _sign_matrix(spark: SparkSession, seed: int, nproj: int):
    """The ``_sign_table`` family as a dim×nproj numpy ±1 matrix (the
    exact same xxhash64-parity values, collected once per (seed, nproj)
    per process — 16 k rows for the base family)."""
    import numpy as np

    key = (seed, nproj)
    mat = _SIGN_CACHE.get(key)
    if mat is None:
        rows = _sign_table(spark, seed, nproj).collect()
        mat = np.zeros((_ANN_DIM, nproj), dtype=np.float64)
        for r in rows:
            mat[r["pos"], r["proj_id"]] = r["sgn"]
        mat.setflags(write=False)
        _SIGN_CACHE[key] = mat
    return mat


def _round_half_up_1e9(X):
    """``F.round(x * 1e9)`` (scale 0) semantics, vectorized: Spark rounds
    doubles as decimal HALF_UP over the shortest decimal representation
    (java BigDecimal.valueOf). copysign(floor(|v|+0.5), v) agrees with
    that everywhere except when |v| sits within a float-add ulp of a
    .5 boundary; those (measure-zero, usually zero per corpus) elements
    are re-done through Python's Decimal(repr(v)) — the same
    shortest-repr digits java's valueOf uses — so the kernel is
    bit-identical to the JVM expression on EVERY input, not just
    almost-every."""
    import numpy as np

    V = X * 1e9
    A = np.abs(V)
    R = np.floor(A + 0.5)
    sus = np.abs(A - (np.floor(A) + 0.5)) <= np.spacing(A) * 4
    if sus.any():
        from decimal import ROUND_HALF_UP, Decimal

        one = Decimal("1")
        flat_idx = np.flatnonzero(sus)
        av = A.reshape(-1)
        rv = R.reshape(-1)
        for i in flat_idx:
            rv[i] = float(Decimal(repr(float(av[i])))
                          .quantize(one, rounding=ROUND_HALF_UP))
    return np.copysign(R, V)


def _bucket_keys_np(spark: SparkSession, e: DataFrame, seed: int,
                    nproj: int, bits: int = _ANN_BITS,
                    sample_proj: int | None = None) -> DataFrame:
    """vec_id → (table_id, bucket_key, w0, w1): the whole hyperplane
    index stage as ONE map-only Arrow/numpy pass (guide §4.2: hand whole
    batches to vectorized native code; §2.4: the explode ⋈ sign-table →
    two-exchange aggregate chain is gone outright — nothing shuffles
    until the bucket self-join).

    Semantics are bit-identical to the ``_quantized_dots`` JVM chain,
    by construction (pinned in tests/test_ann_numpy_kernel.py):

    - same hyperplanes: the collected ``_sign_table`` (xxhash64 parity);
    - same quantization: ``_round_half_up_1e9`` replicates
      ``F.round(x·sgn·1e9)`` exactly, and the int-valued float64 GEMM is
      exact (|dot_q| < 2⁵³ by orders of magnitude), so ``dot_q`` matches
      the JVM long sum bit for bit under any partitioning;
    - same weak-bit order: stable argsort over |dot_q| ties to the lower
      bit index — the JVM's lexicographic (|dot_q|, bit_pos) struct min;
    - same null semantics: NULL/empty embeddings emit no rows (the JVM
      posexplode emits nothing for them), short vectors contribute only
      their present positions (missing terms = 0).

    Measured (sf1, 20 k × 64-dim, 64 tables): 18.8 s JVM chain → 0.9 s
    (see OPTIMIZATION_r14.md §10). w0/w1 are the two weakest bit
    positions; base callers drop them, probe callers fold them into
    probe keys with the same JVM xor expressions as before.
    ``sample_proj`` serves the occupancy estimator: only the FIRST
    ``sample_proj`` projections of the family are computed (the same
    proj_id < n filter the estimator applied to the JVM dots)."""
    # r15 ADVICE hardening: bits < 2 would silently emit w1 == w0 where
    # the JVM reference's weak2[1] is NULL (a self-probe instead of a
    # null-propagating key); no caller uses bits < 2 — refuse loudly.
    if bits < 2:
        raise ValueError("_bucket_keys_np requires bits >= 2 (w1 is "
                         "the rank-2 weak bit; see ADVICE r14)")
    S_full = _sign_matrix(spark, seed, nproj)
    # `is not None`, not truthiness: sample_proj=0 must not silently
    # select the full family (r15 ADVICE).
    if sample_proj is not None:
        if sample_proj <= 0 or sample_proj % bits:
            raise ValueError("sample_proj must be a positive multiple "
                             f"of bits={bits}, got {sample_proj}")
        S = S_full[:, :sample_proj]
    else:
        S = S_full
    tables = S.shape[1] // bits
    dim = S.shape[0]

    def _ann_gemm_gen(batches):
        import numpy as np
        import pandas as pd

        tab_ids = np.arange(tables, dtype=np.int64)
        weights = (np.int64(1) << np.arange(bits, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            embs = pdf["embedding"].to_numpy()
            keep = np.fromiter(
                (v is not None and len(v) > 0 for v in embs),
                dtype=bool, count=len(embs))
            if not keep.all():
                pdf = pdf[keep]
                embs = embs[keep]
            n = len(embs)
            if n == 0:
                continue
            X = np.zeros((n, dim), dtype=np.float64)
            for i, v in enumerate(embs):
                a = np.asarray(v, dtype=np.float64)[:dim]
                X[i, :a.shape[0]] = a
            # NULL ELEMENTS inside a vector contribute 0 in the JVM
            # chain (the long sum skips null terms) — but Arrow ships
            # them to this kernel as NaN, which un-fixed poisons every
            # dot for that vector through the GEMM (r15 ADVICE; pinned
            # in tests/test_ann_numpy_kernel.py). Zero them to match.
            # True NaN elements are indistinguishable from NULL after
            # the Arrow crossing and get the same 0-contribution here;
            # the ANSI JVM reference instead THROWS on them
            # (CAST_OVERFLOW casting NaN to bigint) — disclosed
            # divergence on an input class the reference itself
            # rejects.
            if not np.isfinite(X).all():
                X[np.isnan(X)] = 0.0
            D = (_round_half_up_1e9(X) @ S).astype(np.int64)
            B = D.reshape(n, tables, bits)
            keys = ((B >= 0).astype(np.int64) * weights).sum(
                axis=2, dtype=np.int64)
            order = np.argsort(np.abs(B), axis=2, kind="stable")
            w0 = order[:, :, 0]
            w1 = order[:, :, 1]
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), tables),
                "table_id": np.tile(tab_ids, n),
                "bucket_key": keys.reshape(-1),
                "w0": w0.reshape(-1).astype(np.int32),
                "w1": w1.reshape(-1).astype(np.int32),
            })

    # vec_id keeps the INPUT's type (r15 ADVICE: the replaced JVM
    # aggregate preserved it; hardcoded bigint broke non-bigint corpora
    # at the Arrow boundary).
    vid_t = dict(e.dtypes)["vec_id"]
    return e.select("vec_id", "embedding").mapInPandas(
        _ann_gemm_gen,
        f"vec_id {vid_t}, table_id bigint, bucket_key bigint, "
        "w0 int, w1 int")


# --- ANN variant chooser (r10 verdict item 4) ---------------------------------
# The multiprobe trade pays only while the pipeline is INDEX-bound
# (ANN_CROSSOVER.json + BENCH_sf1_heavy.json, both regimes measured):
# at sf0.1 the GEMM is 85% of base wall time and mp2 wins 2.1×; at sf1
# the corpus is candidate-dense (the same-bucket join + distinct is
# ~95% of wall) and the probe fan-out GROWS the join input — base wins
# by ~25%. The boundary constants below are the geometric midpoints of
# the two measured regimes; the distinct/raw candidate ratio is the
# SAME at both scales (1.94M/8.0M = 194M/800M = 0.243 — a property of
# the hash-family geometry, not the corpus), which is what lets the
# occupancy sampler below estimate distinct candidates near-exactly
# (971 measured vs 972 estimated at sf0.1; 9715 vs 9720 at sf1).

_ANN_CONFIGS = {
    "base": {"tables": 64, "probes_per_table": 1},
    "mp1": {"tables": 24, "probes_per_table": 2},
    "mp2": {"tables": 16, "probes_per_table": 4},
}
_ANN_DISTINCT_RATIO = 0.243
_CAND_PER_VEC_CROSSOVER = 3000.0   # geometric mid of 971 / 9715
_INDEX_SHARE_CROSSOVER = 0.5       # geometric mid of 0.85 / 0.049 ≈ 0.2;
#                                    0.5 keeps a safety margin toward
#                                    base (the variant that never loses
#                                    more than the capped index share)


def choose_ann_variant(est_candidates_per_vec: float | None = None,
                       index_share: float | None = None
                       ) -> tuple[str, dict]:
    """The measured decision rule as code: (variant name, {tables,
    probes_per_table}). INDEX-bound regimes (few candidates per vector
    / GEMM-dominated wall time) take the multiprobe config — fewer
    tables, same recall floor, measured 2.1× at sf0.1; candidate-bound
    regimes take the base tables — the probe fan-out multiplies the
    join input exactly where the join already dominates (sf1: base
    208 s vs mp2 264 s). Pass ``est_candidates_per_vec`` from
    ``estimate_ann_candidates_per_vec`` (preferred — it prices the
    join input the probes multiply) or a known ``index_share`` (GEMM
    fraction of wall time from a prior run's stage split)."""
    if est_candidates_per_vec is None and index_share is None:
        raise ValueError(
            "pass est_candidates_per_vec (estimate_ann_candidates_per_"
            "vec) or index_share — the rule needs one measured signal")
    if est_candidates_per_vec is not None:
        index_bound = est_candidates_per_vec <= _CAND_PER_VEC_CROSSOVER
    else:
        index_bound = index_share >= _INDEX_SHARE_CROSSOVER
    name = "mp2" if index_bound else "base"
    return name, dict(_ANN_CONFIGS[name])


def estimate_ann_candidates_per_vec(spark: SparkSession, e: DataFrame,
                                    sample_tables: int = 2) -> float:
    """Estimate the LSH join's distinct candidates per vector by
    SAMPLING bucket occupancy: hash only the first ``sample_tables``
    tables (a ``sample_tables``/64 slice of the base GEMM), sum each
    bucket's pair mass c·(c−1)/2, scale to the full table count, and
    apply the measured distinct/raw ratio (see module constant). Uses
    ACTUAL occupancy, so skewed corpora (hot buckets) price correctly
    where the uniform n²·2^-B closed form would not."""
    n = e.count()
    if n < 2:
        return 0.0
    # sample the REAL index's hyperplanes: the sign family is keyed on
    # id = pos·nproj + proj_id, so generating a small family
    # (nproj = sample slice) would hash DIFFERENT hyperplanes than the
    # 64-table index actually uses — a skew-aligned corpus would then
    # be priced against buckets that never exist (r11 review finding).
    # sample_proj slices the FULL family's matrix to its first
    # projections, keeping the GEMM cost at the sampled slice while
    # matching bucket_keys bit for bit.
    nsample = sample_tables * _ANN_BITS
    occ = (_bucket_keys_np(spark, e, _ANN_SEED, _N_PROJ,
                           sample_proj=nsample)
           .groupBy("table_id", "bucket_key")
           .agg(F.count(F.lit(1)).alias("c")))
    mass = occ.agg(F.sum(F.col("c") * (F.col("c") - 1) / 2)
                   .alias("m")).collect()[0]["m"] or 0.0
    per_table = mass / sample_tables
    tables = _N_PROJ // _ANN_BITS
    return per_table * tables * _ANN_DISTINCT_RATIO / n


def bucket_keys(spark: SparkSession, e: DataFrame) -> DataFrame:
    """vec_id → (table_id, bucket_key) rows, one per hash table (see
    ``_bucket_keys_np`` for the determinism argument — outputs are
    bit-identical to the r13 JVM aggregate form)."""
    return _bucket_keys_np(spark, e, _ANN_SEED, _N_PROJ).select(
        "vec_id", "table_id", "bucket_key")


# The oracle is the EXACT all-pairs query (same as J4): green hash ⇒ the LSH
# candidate stage achieved recall 1 on this corpus at this threshold.
_ANN_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(
list_sum(list_transform(list_zip(a.embedding, b.embedding),
         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
       , 6) AS cos_sim
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND
list_sum(list_transform(list_zip(a.embedding, b.embedding),
         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
      >= 0.4
ORDER BY vec_a, vec_b
"""


# Candidate-dedup sizing (guide §2.2/§2.5): the family's `.distinct()`
# runs over the RAW same-bucket pair stream — ~800 M 16-byte rows at
# sf1 base — and at the session's default shuffle width each reducer
# hash-aggregates ~25 M rows in one shared-heap task: measured
# page-allocation stalls + spill, 111 s of the 157 s query. Fix: size
# the dedup exchange from the occupancy mass the join is ABOUT to
# produce (Σ|probe_bucket|·|base_bucket| over the persisted bucket
# table — one tiny job, an upper bound within 2× of the raw stream,
# which is all partition sizing needs), and pack the (vec_a, vec_b)
# pair into ONE long when the measured id range allows — half the
# hashed bytes, a codegen long comparator. Measured at sf1 (194.3 M
# distinct of 800 M raw, min of 2, identical counts): 111 s stock →
# 67 s packed → 50 s right-sized → 43 s both (2.6×). 3 M packed rows
# ≈ 24 MB raw per reducer leaves the hash-aggregate's structures
# headroom inside a shared-heap task slot; the floor is the session's
# default parallelism (never fewer tasks than cores — keeps the
# local bench plan at the stock width), the ceiling bounds scheduler
# load at any corpus size.
_PAIR_ROWS_PER_PARTITION = 3_000_000
_MAX_PAIR_PARTITIONS = 65_536


def _distinct_pairs(cand_raw: DataFrame, left: DataFrame,
                    right: DataFrame, keys: tuple,
                    lid: str, rid: str) -> DataFrame:
    """Distinct (vec_a, vec_b) over a raw same-bucket pair stream with
    the dedup exchange right-sized from the join's own inputs (see the
    sizing note above). ``left``/``right`` are the two join sides
    (normally slices of one persisted bucket table — the sizing job is
    a group-count over the cache, not a recompute), ``keys`` the join
    key, ``lid``/``rid`` their vector-id columns. The pair is packed
    into one long iff every id that can reach ``cand_raw`` lies in
    [0, 2³¹) — measured in the same sizing job (ids on keys with no
    match on the other side never reach the join, so the joined bound
    covers exactly the reachable ids); the pack is a bijection there,
    so counts and values are unchanged (asserted at sf1: 194 304 941
    pairs both ways). ``cand_raw`` must be exactly the two pair
    columns, (a, b) order; output schema matches it exactly."""
    import math

    pa, pb = cand_raw.columns
    keys = list(keys)
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("cl"),
                                 F.min(lid).alias("lmin"),
                                 F.max(lid).alias("lmax"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("cr"),
                                  F.min(rid).alias("rmin"),
                                  F.max(rid).alias("rmax"))
    row = (lc.join(rc, keys)
           .agg(F.sum(F.col("cl") * F.col("cr")).alias("mass"),
                F.least(F.min("lmin"), F.min("rmin")).alias("lo"),
                F.greatest(F.max("lmax"), F.max("rmax")).alias("hi"))
           .collect()[0])
    mass = int(row["mass"] or 0)
    spark = cand_raw.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism,
                 min(_MAX_PAIR_PARTITIONS,
                     math.ceil(mass / _PAIR_ROWS_PER_PARTITION)))
    dt = dict(cand_raw.dtypes)
    if row["lo"] is not None and int(row["lo"]) >= 0 \
            and int(row["hi"]) < (1 << 31):
        pk = (F.col(pa).cast("long") * F.lit(1 << 32)
              + F.col(pb).cast("long"))
        return (cand_raw.select(pk.alias("pk"))
                .repartition(nparts, "pk")
                .distinct()
                .select(F.shiftright("pk", 32).cast(dt[pa]).alias(pa),
                        F.col("pk").bitwiseAND(F.lit((1 << 32) - 1))
                        .cast(dt[pb]).alias(pb)))
    return (cand_raw
            .repartition(nparts, pa, pb)
            .distinct())


def _verify_candidates(e: DataFrame, cand: DataFrame,
                       slot: str = "lsh") -> DataFrame:
    """Shared exact-cosine verify tail for the whole LSH family: score
    each candidate (vec_a, vec_b) pair against the raw embeddings, keep
    cosine ≥ 0.4, round for output, order. ONE definition so the
    threshold/rounding contract cannot diverge between the base and
    multiprobe variants (their outputs are asserted set-equal in
    tests/test_properties.py).

    r15: gather-in-kernel first — ship only the id pair to Python and
    row-gather the vectors from a broadcast matrix (the verify stage
    was Arrow-TRANSFER-bound: ~100 GB of shipped embedding pairs at
    sf1's 194 M candidates vs ~3 GB of ids; llm_ops.verify_pairs_gather
    has the numbers and the bit-identity argument). The kernel
    thresholds inside, so the 194 M-row scored barrier AND the pair
    DISK_ONLY stage cut disappear with the transfer — mapInPandas
    replaces its input (no scalar-eval result-rejoin queue, which was
    what the r13 stage cut existed to protect). Corpora over the
    per-task gather bound fall back to the r14 join + scalar-kernel
    shape below, unchanged."""
    from silvia_spark.functions.llm_ops import (score_pairs_threshold,
                                                verify_pairs_gather)

    out = verify_pairs_gather(e, cand, slot=f"verify.{slot}")
    if out is not None:
        return out

    a = e.select(F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("eb"))
    # Stage cut BEFORE the Python eval: persist the 16 B/row candidate
    # PAIRS (DISK_ONLY) so the distinct's shuffle-reduce and the
    # ArrowEvalPython row-queue never share one task's memory. Fused,
    # the scalar eval's result-rejoin queue (it buffers the 1 KB
    # embedding-attached input rows while Python computes) on top of
    # the distinct's hash structures OOMed the 8 g executor at
    # mp2-sf1's 195 M candidates (measured r13, twice); the
    # verify-kernel bench never hit it precisely because it persisted
    # pairs first — this reproduces that measured-safe shape in the
    # shipping path. The old mapInPandas kernel didn't need the cut
    # (map output replaces input, no rejoin queue) but cost 3× the
    # verify time (ANN_VERIFY_KERNEL.json).
    cand = managed_persist(cand, f"verify.{slot}.pairs",
                           level="DISK_ONLY")
    # score_pairs_threshold: scalar-UDF score into a persist barrier,
    # JVM threshold over the cache — ONE ArrowEvalPython structurally
    # (nothing for Catalyst's pushdown to duplicate: it stops at the
    # InMemoryRelation), no asNondeterministic marker (the r11
    # executor-heap hazard). Measured 43 s vs the previous kernel's
    # 145-150 s at sf1's 195 M candidates — ANN_VERIFY_KERNEL.json.
    return score_pairs_threshold(
        cand.join(a, "vec_a").join(b, "vec_b"),
        slot=f"verify.{slot}")


# --- fused per-bucket GEMM candidates + threshold (r15) ------------------------
# The candidate stage used to materialize the raw same-bucket pair
# stream (~800 M 16-byte rows at sf1) into a right-sized packed-key
# distinct exchange, then verify the ~194 M distinct pairs. When the
# corpus matrix is per-task-loadable (the same gather bound as the
# verify kernel), ALL of that collapses into one mapInPandas kernel
# over the GROUPED bucket table: per bucket, gather the members' unit
# rows from the broadcast matrix and take the whole bucket's pair
# cosines as ONE dense dgemm block (guide §4.2 — hand whole batches to
# native code; §2.4 — the 800 M-row exchange and its distinct hash
# aggregate are gone outright; §2.3 — nothing heavier than the n·T
# bucket rows ever shuffles). Only pairs passing the threshold leave
# the kernel — a banding-selected handful — which a tiny distinct
# dedups before the EXACT einsum rescore emits the contract values.
#
# Selection correctness: dgemm and the einsum row-dot may differ in the
# last ulps (~1e-14 on unit vectors), so the kernel thresholds at
# tau − _FUSED_EPS — a deliberate SUPERSET — and the exact rescore
# (bit-identical to the scalar kernel, see llm_ops._gather_score_hits)
# applies the real `>= tau`. A pair the exact kernel accepts cannot be
# missed: that would need |dgemm − einsum| > 1e-9, six orders above the
# worst-case float64 bound for 64-term unit dots. NaN (zero-norm) rows
# propagate NaN through the dgemm and are KEPT, matching Spark's
# NaN-is-largest `>=` semantics in every fallback shape.
#
# Work accounting: the dgemm prices Σ|bucket|² pairs (the RAW mass,
# ~4× the distinct count) — but at BLAS density that is seconds where
# the distinct's exchange was tens of seconds (measured below); the
# duplicate-pair work the distinct used to save is cheaper to redo
# than to dedup. Buckets are capped upstream (cap_buckets), so one
# block is at most cap² comparisons, chunked to _FUSED_CHUNK elements.

_FUSED_EPS = 1e-9
_FUSED_CHUNK = 4_000_000  # max f64 elements per GEMM block (~32 MB)


def _fused_candidate_hits(spark: SparkSession, e: DataFrame,
                          grouped: DataFrame, mode: str,
                          out_a: str, out_b: str, id_t: str,
                          tau: float, slot: str):
    """(survivor-pair DataFrame, shared broadcast) from a grouped
    bucket table, or (None, None) when the corpus can't be gathered.
    ``mode`` 'self': ``grouped`` carries `vids` (bucket self-join,
    emits a < b); 'probe': `pv` + `bv` lists (probe ⋈ base, emits
    least/greatest of l ≠ r). Output pairs are dgemm-thresholded at
    tau − _FUSED_EPS (superset; see the module note) and may repeat
    across buckets — callers dedup then exact-rescore."""
    from silvia_spark.functions.llm_ops import _gather_broadcast

    bc = _gather_broadcast(spark, e, f"verify.{slot}")
    if bc is None:
        return None, None
    thr = float(tau) - _FUSED_EPS

    def _fused_gemm_gen(batches):
        import numpy as np
        import pandas as pd

        ids, M, norms = bc.value
        with np.errstate(invalid="ignore", divide="ignore"):
            Mn = M / norms[:, None]  # unit rows; NaN rows for zero-norm
        hi = len(ids) - 1

        def rows_of(v):
            idx = np.minimum(np.searchsorted(ids, v), hi)
            if not np.array_equal(ids[idx], v):
                raise ValueError(
                    "fused verify: bucket member id not present in the "
                    "corpus the matrix was collected from")
            return Mn[idx]

        for pdf in batches:
            acc_a: list = []
            acc_b: list = []
            if mode == "self":
                pairs_iter = ((v, None) for v in pdf["vids"])
            else:
                pairs_iter = zip(pdf["pv"], pdf["bv"])
            for a_ids, b_ids in pairs_iter:
                va = np.sort(np.asarray(a_ids, dtype=np.int64))
                if mode == "self":
                    s = va.shape[0]
                    if s < 2:
                        continue
                    A = rows_of(va)
                    step = max(1, _FUSED_CHUNK // s)
                    for i0 in range(0, s - 1, step):
                        i1 = min(i0 + step, s)
                        with np.errstate(invalid="ignore"):
                            G = A[i0:i1] @ A.T
                        keep = (G >= thr) | np.isnan(G)
                        ii, jj = np.nonzero(keep)
                        gi = ii + i0
                        m = jj > gi  # strict upper triangle: a < b
                        if m.any():
                            acc_a.append(va[gi[m]])
                            acc_b.append(va[jj[m]])
                else:
                    vb = np.sort(np.asarray(b_ids, dtype=np.int64))
                    p, s = va.shape[0], vb.shape[0]
                    if p == 0 or s == 0:
                        continue
                    P, B = rows_of(va), rows_of(vb)
                    step = max(1, _FUSED_CHUNK // s)
                    for i0 in range(0, p, step):
                        i1 = min(i0 + step, p)
                        with np.errstate(invalid="ignore"):
                            G = P[i0:i1] @ B.T
                        keep = (G >= thr) | np.isnan(G)
                        ii, jj = np.nonzero(keep)
                        lv = va[ii + i0]
                        rv = vb[jj]
                        m = lv != rv
                        if m.any():
                            lv, rv = lv[m], rv[m]
                            acc_a.append(np.minimum(lv, rv))
                            acc_b.append(np.maximum(lv, rv))
            if acc_a:
                yield pd.DataFrame({out_a: np.concatenate(acc_a),
                                    out_b: np.concatenate(acc_b)})

    surv = grouped.mapInPandas(_fused_gemm_gen,
                               f"{out_a} {id_t}, {out_b} {id_t}")
    return surv, bc


def _fused_verify_self(spark: SparkSession, e: DataFrame,
                       buckets: DataFrame, keys: tuple, vid: str,
                       out_a: str, out_b: str, tau: float, slot: str):
    """Fused bucket-SELF-join verify: grouped buckets → per-bucket GEMM
    threshold kernel → tiny distinct → exact einsum rescore. Returns
    the (ida, idb, cos_raw) exact survivors, or None when the corpus
    can't be gathered (callers fall back to the join + distinct +
    verify shape). The groupBy rides the persisted bucket table's
    existing hash partitioning (cap_buckets' window exchange), so no
    new corpus-scale shuffle exists anywhere on this path."""
    from silvia_spark.functions.llm_ops import _gather_score_hits

    grouped = buckets.groupBy(*keys).agg(
        F.collect_list(vid).alias("vids"))
    id_t = dict(buckets.dtypes)[vid]
    surv, bc = _fused_candidate_hits(spark, e, grouped, "self",
                                     out_a, out_b, id_t, tau, slot)
    if surv is None:
        return None
    return _gather_score_hits(e, surv.distinct(), tau,
                              f"verify.{slot}", bc=bc)


def _fused_verify_probe(spark: SparkSession, e: DataFrame,
                        probes: DataFrame, base: DataFrame, keys: tuple,
                        lid: str, rid: str, out_a: str, out_b: str,
                        tau: float, slot: str):
    """Fused probe ⋈ base verify (the multiprobe join shape): tag the
    two sides, group per bucket into probe/base member lists, per-bucket
    P×B GEMM threshold, distinct, exact rescore. None when the corpus
    can't be gathered."""
    from silvia_spark.functions.llm_ops import _gather_score_hits

    keys = list(keys)
    tagged = (probes.select(F.col(lid).alias("v"), *keys,
                            F.lit(True).alias("p"))
              .union(base.select(F.col(rid).alias("v"), *keys,
                                 F.lit(False).alias("p"))))
    grouped = tagged.groupBy(*keys).agg(
        F.collect_list(F.when(F.col("p"), F.col("v"))).alias("pv"),
        F.collect_list(F.when(~F.col("p"), F.col("v"))).alias("bv"))
    id_t = dict(probes.dtypes)[lid]
    surv, bc = _fused_candidate_hits(spark, e, grouped, "probe",
                                     out_a, out_b, id_t, tau, slot)
    if surv is None:
        return None
    return _gather_score_hits(e, surv.distinct(), tau,
                              f"verify.{slot}", bc=bc)


def _finish_pair_hits(hits: DataFrame, out_a: str, out_b: str,
                      slot: str) -> DataFrame:
    """Contract tail over exact (ida, idb, cos_raw) survivors: persist
    the tiny set (the global sort's range-sampling pass re-executes its
    child otherwise), JVM round, order."""
    hits = managed_persist(hits, f"score_pairs.verify.{slot}.hits")
    return (hits.select(out_a, out_b,
                        F.round("cos_raw", 6).alias("cos_sim"))
            .orderBy(out_a, out_b))


@contract("sim_ann_lsh", oracle=_ANN_ORACLE)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH similarity self-join at cosine ≥ 0.4 — the 100-TB
    path for J4 (llm_ops.sim_join_threshold). Same output contract and the
    exact all-pairs oracle; only same-(table, bucket) pairs are scored."""
    e = load_table(spark, sf_dir, "embeddings")
    # Persist the tiny (n·T)-row bucket table so the self-join's two
    # sides read one computed copy — without it Spark plans the whole GEMM
    # lineage twice (measured 2× the stage cost). At cluster scale this is
    # a few GB across executors, the canonical build-side reuse.
    # managed_persist bounds a long-lived session to one live cache here
    # (each run unpersists the previous run's copy).
    buckets = managed_persist(
        cap_buckets(bucket_keys(spark, e), _ANN_BUCKET_CAP),
        "sim_ann_lsh.buckets")
    # r15: fused per-bucket GEMM candidates + threshold (see the fused
    # section note) — the raw-pair exchange and its distinct are gone.
    hits = _fused_verify_self(spark, e, buckets,
                              ("table_id", "bucket_key"), "vec_id",
                              "vec_a", "vec_b", 0.4, slot="lsh")
    if hits is not None:
        return _finish_pair_hits(hits, "vec_a", "vec_b", "lsh")
    left = buckets.select(F.col("vec_id").alias("vec_a"),
                          "table_id", "bucket_key")
    right = buckets.select(F.col("vec_id").alias("vec_b"),
                           "table_id", "bucket_key")
    cand = _distinct_pairs(
        left.join(right, ["table_id", "bucket_key"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b"),
        left, right, ("table_id", "bucket_key"), "vec_a", "vec_b")
    return _verify_candidates(e, cand, slot="lsh")


# --- multiprobe variant: fewer tables, one extra probe per table --------------

_MP_TABLES = 24   # vs 64 base tables: 2.7x less GEMM work...
_MP_SEED = 202    # independent hyperplane family
_MP_NPROJ = _MP_TABLES * _ANN_BITS


def bucket_keys_multiprobe(spark: SparkSession, e: DataFrame) -> DataFrame:
    """vec_id → (table_id, bucket_key, probe_key): the base key plus the
    key with the LOWEST-|margin| bit flipped — the bit most likely to
    have landed on the wrong side of its hyperplane. The weakest bit is
    chosen by lexicographic min over (|dot|, bit_pos), so ties are
    deterministic under any partitioning (a bare min_by would pick the
    first-encountered row — partition-order dependent). The sign/GEMM
    stage is the shared ``_bucket_keys_np`` kernel under the multiprobe
    family's own seed (w0 IS the stable-argsort weakest bit)."""
    return _bucket_keys_np(spark, e, _MP_SEED, _MP_NPROJ).select(
        "vec_id", "table_id", "bucket_key",
        F.expr("bucket_key ^ shiftleft(1, w0)").alias("probe_key"))


@contract("sim_ann_lsh_multiprobe", oracle=_ANN_ORACLE)
def sim_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe hyperplane-LSH similarity self-join at cosine ≥ 0.4 —
    the memory/compute frontier of `sim_ann_lsh`: 24 tables instead of
    64 (2.7× less GEMM, ~25% less candidate shuffle) recover the lost
    recall by ALSO probing each vector's weakest-margin bit flip — the
    bucket it would have landed in had its most borderline hyperplane
    sign gone the other way (Lv et al., multi-probe LSH). Probe keys
    live on ONE side of the self-join only (probe ⋈ base covers both
    directions after the least/greatest normalization), so the index
    size is unchanged — only the probe fan-out doubles. Same exact
    all-pairs oracle as the base contract: green hash ⇒ recall 1 on
    this corpus at 2.7× less INDEX work. Deterministic end-to-end:
    quantized integer dots + lexicographic weakest-bit tiebreak.

    When the knob pays — measured, not argued (ANN_CROSSOVER.json,
    tools/ann_crossover.py): the table/probe trade shrinks the INDEX
    stage only, and the probe fan-out GROWS the candidate-join input.
    Index-bound pipelines (rare candidates: high thresholds, large
    dims, small corpora — sf0.1 here: index = 84% of base wall time)
    win 1.7× end-to-end; candidate-bound ones (dense corpora at low
    thresholds — 20k vectors at 0.4: ~195M distinct candidates, join +
    verify = 95% of wall) LOSE ~25% (259 s vs base 208 s at sf1).
    Estimate the index share first; candidate cost is governed by B
    (bucket occupancy), not by this knob."""
    e = load_table(spark, sf_dir, "embeddings")
    buckets = managed_persist(
        cap_buckets(bucket_keys_multiprobe(spark, e), _ANN_BUCKET_CAP),
        "sim_ann_lsh_multiprobe.buckets")
    # probe side: base key AND flipped key; base side: base key only.
    # The FLIP half gets its own cap pass: base-bucket capping (already
    # applied to ``buckets``) bounds base-key rows per bucket, but a
    # pathological corpus could still focus many vectors' FLIP keys on
    # one hot key (cap·n candidates). Cap the flips SEPARATELY — never
    # the union, which would also drop base rows that a hot flip key
    # lands on and silently lose base-base pairs the base contract
    # keeps — so every bucket's probe rows stay ≤ 2·cap and candidates
    # ≤ 2·cap² per bucket. No-op on this corpus, like every cap here.
    flips = cap_buckets(
        buckets.select(F.col("vec_id").alias("vec_l"), "table_id",
                       F.col("probe_key").alias("k")),
        _ANN_BUCKET_CAP, keys=("table_id", "k"))
    probes = (buckets.select(F.col("vec_id").alias("vec_l"), "table_id",
                             F.col("bucket_key").alias("k"))
              .union(flips))
    base = buckets.select(F.col("vec_id").alias("vec_r"), "table_id",
                          F.col("bucket_key").alias("k"))
    # r15: fused per-bucket P×B GEMM (see the fused section note)
    hits = _fused_verify_probe(spark, e, probes, base,
                               ("table_id", "k"), "vec_l", "vec_r",
                               "vec_a", "vec_b", 0.4, slot="mp1")
    if hits is not None:
        return _finish_pair_hits(hits, "vec_a", "vec_b", "mp1")
    cand = _distinct_pairs(
        probes.join(base, ["table_id", "k"])
        .where(F.col("vec_l") != F.col("vec_r"))
        .select(F.least("vec_l", "vec_r").alias("vec_a"),
                F.greatest("vec_l", "vec_r").alias("vec_b")),
        probes, base, ("table_id", "k"), "vec_l", "vec_r")
    return _verify_candidates(e, cand, slot="mp1")


# --- multiprobe-2 variant: the probe-count knob turned to 2 bits --------------

_MP2_TABLES = 16  # vs 24 multiprobe-1 / 64 base
_MP2_SEED = 303   # independent hyperplane family
_MP2_NPROJ = _MP2_TABLES * _ANN_BITS


def bucket_keys_multiprobe2(spark: SparkSession, e: DataFrame) -> DataFrame:
    """vec_id → (table_id, bucket_key, probe1, probe2, probe12): the base
    key plus the three perturbations of its TWO lowest-|margin| bits —
    each single flip and the double flip, i.e. the first four entries of
    Lv et al.'s success-probability-ordered probe sequence for a 4-bit
    key. The two weakest bits come from sort_array over the per-table
    (|dot|, bit_pos) structs — a full lexicographic sort of 4 elements,
    deterministic under any partition/collection order (same discipline
    as multiprobe-1's min-struct, extended to rank 2; the shared
    ``_bucket_keys_np`` kernel's stable argsort realizes exactly that
    order, w0/w1 = the two weakest bit positions)."""
    return _bucket_keys_np(spark, e, _MP2_SEED, _MP2_NPROJ).select(
        "vec_id", "table_id", "bucket_key",
        F.expr("bucket_key ^ shiftleft(1, w0)").alias("probe1"),
        F.expr("bucket_key ^ shiftleft(1, w1)").alias("probe2"),
        F.expr("bucket_key ^ shiftleft(1, w0)"
               " ^ shiftleft(1, w1)").alias("probe12"))


@contract("sim_ann_lsh_multiprobe2", oracle=_ANN_ORACLE)
def sim_ann_lsh_multiprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-bit multiprobe hyperplane-LSH similarity self-join at cosine ≥
    0.4 — the probe-count knob one notch further than multiprobe-1: 16
    tables instead of 24/64 (1.5× / 4× less GEMM and index), each vector
    probing its base bucket plus the three perturbations of its two
    weakest-margin bits (4× probe fan-out, still on ONE join side, so
    index size is unchanged).

    Closed-form recall model behind the knob (hyperplane LSH, cosine
    threshold c = 0.4 ⇒ per-bit agreement p = 1 − arccos(c)/π ≈ 0.631,
    4-bit keys): a table hits when the key agrees on all 4 bits
    (p⁴ ≈ .159), or differs exactly on a probed weak bit — nominally
    2p³(1−p) ≈ .186 for the single flips and p²(1−p)² ≈ .054 for the
    double, so per-table hit q ≈ .398 vs .25 (1-probe) and .159 (base),
    and T tables miss with (1−q)^T: 16 tables ≈ 3e-4, between base-64
    (2e-5) and 1-probe-24 (1e-3). The nominal flip terms UNDERSTATE the
    true hit rate — disagreeing bits concentrate on the smallest
    margins, which is exactly which bits get probed (Lv et al.'s
    observation) — so the model is a sizing lower bound, and the exact
    all-pairs oracle stays the empirical gate: green hash ⇒ recall 1 on
    this corpus at 4× less GEMM than the base contract.

    4× less GEMM is NOT 4× less work: the crossover is measured in
    ANN_CROSSOVER.json (see multiprobe-1's docstring for the decision
    rule). Index-bound regimes win 2.1× end-to-end (8.6 s vs 17.9 s at
    sf0.1); candidate-bound ones lose ~27% (264 s vs 208 s at 20k
    vectors, threshold 0.4) because the 4× probe fan-out feeds the
    same-bucket join that already dominates.

    Same capping discipline as multiprobe-1: the flip-key union gets its
    own cap pass (never capped together with base rows), bounding every
    bucket's probe rows at 2·cap and candidates at 2·cap² even on a
    corpus that focuses many vectors' flips onto one hot key."""
    e = load_table(spark, sf_dir, "embeddings")
    buckets = managed_persist(
        cap_buckets(bucket_keys_multiprobe2(spark, e), _ANN_BUCKET_CAP),
        "sim_ann_lsh_multiprobe2.buckets")
    flips = cap_buckets(
        buckets.selectExpr(
            "vec_id AS vec_l", "table_id",
            "stack(3, probe1, probe2, probe12) AS k"),
        _ANN_BUCKET_CAP, keys=("table_id", "k"))
    probes = (buckets.select(F.col("vec_id").alias("vec_l"), "table_id",
                             F.col("bucket_key").alias("k"))
              .union(flips))
    base = buckets.select(F.col("vec_id").alias("vec_r"), "table_id",
                          F.col("bucket_key").alias("k"))
    # r15: fused per-bucket P×B GEMM (see the fused section note)
    hits = _fused_verify_probe(spark, e, probes, base,
                               ("table_id", "k"), "vec_l", "vec_r",
                               "vec_a", "vec_b", 0.4, slot="mp2")
    if hits is not None:
        return _finish_pair_hits(hits, "vec_a", "vec_b", "mp2")
    cand = _distinct_pairs(
        probes.join(base, ["table_id", "k"])
        .where(F.col("vec_l") != F.col("vec_r"))
        .select(F.least("vec_l", "vec_r").alias("vec_a"),
                F.greatest("vec_l", "vec_r").alias("vec_b")),
        probes, base, ("table_id", "k"), "vec_l", "vec_r")
    return _verify_candidates(e, cand, slot="mp2")


# --- parameterized probe family: the recall-experiment kernel ----------------


def bucket_keys_probed(spark: SparkSession, e: DataFrame, *,
                       tables: int, probes: int,
                       seed: int = 707,
                       bits: int = _ANN_BITS) -> DataFrame:
    """vec_id → (table_id, bucket_key, probe_keys array): the generic
    (T, probe-depth) point of the family the three contract kernels fix
    at (64, 0) / (24, 1) / (16, 3). ``probes`` ∈ {0, 1, 3}: base key
    only, +weakest-bit flip, +both single flips and the double flip
    (Lv et al.'s probe sequence for a ``bits``-bit key). Same
    determinism discipline as the contract kernels: quantized integer
    dots, lexicographic (|dot|, bit_pos) weak-bit ranking.

    tools/ann_recall.py sweeps this kernel over table counts where the
    closed-form model predicts recall << 1 and compares measured vs
    predicted — the recall<1-regime evidence the hash-green contracts
    (recall 1 on their corpus) structurally cannot provide."""
    if probes not in (0, 1, 3):
        raise ValueError("probes must be 0, 1 or 3")
    nproj = tables * bits
    per_tab = _bucket_keys_np(spark, e, seed, nproj, bits=bits)
    if probes == 0:
        probe_expr = F.expr("array()").cast("array<bigint>")
    elif probes == 1:
        probe_expr = F.expr(
            "array(bucket_key ^ shiftleft(1, w0))")
    else:
        probe_expr = F.expr(
            "array(bucket_key ^ shiftleft(1, w0),"
            "      bucket_key ^ shiftleft(1, w1),"
            "      bucket_key ^ shiftleft(1, w0)"
            "                 ^ shiftleft(1, w1))")
    return per_tab.select("vec_id", "table_id", "bucket_key",
                          probe_expr.alias("probe_keys"))


def probed_candidates(buckets: DataFrame) -> DataFrame:
    """(vec_a < vec_b) candidate pairs from a ``bucket_keys_probed``
    table: probe keys fan out on ONE join side (index size unchanged),
    exactly the contract kernels' join shape."""
    base = buckets.select(F.col("vec_id").alias("vec_r"), "table_id",
                          F.col("bucket_key").alias("k"))
    probes = (buckets.select(F.col("vec_id").alias("vec_l"), "table_id",
                             F.col("bucket_key").alias("k"))
              .union(buckets.select(
                  F.col("vec_id").alias("vec_l"), "table_id",
                  F.explode("probe_keys").alias("k"))))
    return _distinct_pairs(
        probes.join(base, ["table_id", "k"])
        .where(F.col("vec_l") != F.col("vec_r"))
        .select(F.least("vec_l", "vec_r").alias("vec_a"),
                F.greatest("vec_l", "vec_r").alias("vec_b")),
        probes, base, ("table_id", "k"), "vec_l", "vec_r")


@contract("sim_ann_auto", oracle=_ANN_ORACLE)
def sim_ann_auto(spark: SparkSession, sf_dir: str,
                 index_root: str | None = None) -> DataFrame:
    """Chooser-ROUTED ANN join (r12, verdict item 7; index-aware r14,
    item 7): probes the PERSISTED index first — ``index_root``
    argument or ``$SILVIA_ANN_INDEX_ROOT`` — and when
    ``ann_index_fresh`` says the bucket table covers exactly this
    corpus, routes straight through ``sim_ann_lsh_indexed`` with NO
    occupancy estimate at all. That is deliberately simpler than the
    r13 verdict's sketch (estimate FROM the index, then choose): the
    chooser exists to trade GEMM cost against candidate fan-out, and
    a warm index makes the GEMM free — mp2's entire advantage is
    GEMM reduction in index-bound regimes, so indexed-base dominates
    BOTH variants whenever the index is warm (measured: the sf1 warm
    indexed query beats both cold kernels, ANN_INDEX.json). Cold (no
    index / stale / foreign params), the r12 rule stands: price
    occupancy with ``estimate_ann_candidates_per_vec`` (a 2/64 GEMM
    slice), dispatch mp2 in index-bound regimes and base tables in
    candidate-bound ones (ANN_CROSSOVER.json / SCALE.md §ANN). Every
    route ends in the same exact-cosine verify at the same threshold,
    so recall is 1 and the hash is stable whichever path runs."""
    import os as _os

    from silvia_spark.functions.llm_ops import _gather_feasible

    e = load_table(spark, sf_dir, "embeddings")
    index_root = index_root or _os.environ.get("SILVIA_ANN_INDEX_ROOT")
    # r15 re-pricing (ANN_INDEX.json regenerated after the fused
    # kernel): on a GATHERABLE corpus the warm-index route measured 2×
    # the whole compute path at sf1 (warm_query 8.0 s vs cold_base
    # 3.9 s) — the fused/map-only GEMM made the skipped index work
    # (~0.5 s) cheaper than reading the bucket table back from the
    # manifest. The warm index therefore routes ONLY past the gather
    # bound, where the fallback pipeline's GEMM + JVM candidate
    # distinct is still the expensive side the index skips. Every
    # route ends in the same exact verify, so the output is identical
    # whichever path runs (oracle-proven; pinned in
    # tests/test_ann_index.py).
    if index_root and ann_index_fresh(e, index_root) \
            and not _gather_feasible(e):
        return sim_ann_lsh_indexed(spark, sf_dir, index_root)
    est = estimate_ann_candidates_per_vec(spark, e)
    name, _cfg = choose_ann_variant(est_candidates_per_vec=est)
    fn = sim_ann_lsh_multiprobe2 if name == "mp2" else sim_ann_lsh
    return fn(spark, sf_dir)


# --- ANN index persistence (r13, r12 verdict item 8) ---------------------------
# Every sim_ann_* call recomputes the sign-projection GEMM and bucket
# table per query. At 100 TB the index IS the asset: stage the bucket
# table as an L11 manifest table once, append index DELTAS as the
# corpus grows, and let queries skip the GEMM entirely on a warm
# index. The index is ~n·T rows of (vec_id, table_id, bucket_key) —
# 3 longs, ~24 B/row before encoding: 64 tables over 10⁹ vectors is
# ~1.5 TB spread across the cluster, linear in corpus size and tiny
# next to the corpus itself. See SCALE.md §ANN-index.

_ANN_INDEX_NOTE = "_ann_index.json"


def _ann_index_params() -> dict:
    return {"seed": _ANN_SEED, "bits": _ANN_BITS,
            "tables": _ANN_TABLES, "dim": _ANN_DIM}


def _ann_corpus_mark(e: DataFrame) -> dict:
    """Cheap freshness fingerprint: (row count, max vec_id). Exact for
    the append-only corpora the incremental path serves; a corpus that
    mutates in place (deletes, re-embeds) must rebuild — disclosed in
    SCALE.md, enforced by the mark mismatch falling back to compute."""
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.max("vec_id").alias("hi")).collect()[0]
    return {"n_vecs": int(row["n"] or 0),
            "max_vec_id": (None if row["hi"] is None
                           else int(row["hi"]))}


def persist_ann_index(spark: SparkSession, e: DataFrame,
                      index_root: str) -> int:
    """Build or INCREMENTALLY extend the persisted LSH index for
    corpus ``e`` under ``index_root`` (an L11 manifest table
    partitioned by table_id, stats on vec_id). First call stages the
    full bucket table; later calls with a GROWN corpus compute bucket
    keys for the delta ONLY (vec_id above the indexed high-water mark
    — the append-only fast path; the general CDC-driven consumer is a
    design note, SCALE.md §ANN-index) and commit_append them: an
    index update costs O(new vectors), not O(corpus). Returns the
    committed table version."""
    import json as _json
    import os as _os

    from silvia_spark.operators.manifest_table import (FS, _norm,
                                                       commit_append,
                                                       create_table,
                                                       current_version)

    root = _norm(index_root)
    mark = _ann_corpus_mark(e)
    note_path = _os.path.join(root, _ANN_INDEX_NOTE)
    if current_version(root) is None:
        bk = bucket_keys(spark, e)
        create_table(bk, root, "table_id", stats_cols=["vec_id"])
        version = 1
    else:
        note = _json.loads(FS.read_text(note_path))
        if note["params"] != _ann_index_params():
            raise ValueError(
                f"index at {root} was built with a different "
                "hyperplane family — rebuild under a new root")
        hwm = note["mark"]["max_vec_id"]
        if (mark["max_vec_id"] is not None and hwm is not None
                and mark["max_vec_id"] <= hwm):
            return current_version(root)  # nothing new: no-op
        # hwm None means the index was built over an EMPTY corpus —
        # nothing is indexed, so the whole corpus is the delta. The
        # NULL-comparison filter would commit an empty append yet
        # advance the mark, silently serving an empty index (r13
        # ADVICE).
        delta = (e if hwm is None
                 else e.where(F.col("vec_id") > F.lit(hwm)))
        version = commit_append(spark, root,
                                bucket_keys(spark, delta), "table_id")
    FS.put_atomic(note_path, _json.dumps(
        {"params": _ann_index_params(), "mark": mark}))
    return version


def ann_index_fresh(e: DataFrame, index_root: str) -> bool:
    """True iff the persisted index covers EXACTLY this corpus (same
    hyperplane family, same count + high-water mark). A stale or
    foreign index is never silently used — callers fall back to the
    query-time GEMM."""
    import json as _json
    import os as _os

    from silvia_spark.operators.manifest_table import (FS, _norm,
                                                       current_version)

    root = _norm(index_root)
    if current_version(root) is None:
        return False
    try:
        note = _json.loads(FS.read_text(
            _os.path.join(root, _ANN_INDEX_NOTE)))
    except (FileNotFoundError, ValueError):
        return False
    return (note.get("params") == _ann_index_params()
            and note.get("mark") == _ann_corpus_mark(e))


def sim_ann_lsh_indexed(spark: SparkSession, sf_dir: str,
                        index_root: str) -> DataFrame:
    """``sim_ann_lsh`` with the bucket table served from a persisted
    index when fresh: the query plan contains NO hyperplane GEMM (no
    posexplode ⋈ sign table, no hash-aggregate over dot terms) — the
    bucket self-join reads the manifest table and goes straight to
    candidates + exact verify. Falls back to the query-time GEMM on a
    stale/missing index, so the output contract is identical either
    way (asserted in tests/test_ann_index.py)."""
    from silvia_spark.operators.manifest_table import read_snapshot

    e = load_table(spark, sf_dir, "embeddings")
    if ann_index_fresh(e, index_root):
        bk = read_snapshot(spark, index_root)
    else:
        bk = bucket_keys(spark, e)
    buckets = managed_persist(
        cap_buckets(bk, _ANN_BUCKET_CAP), "sim_ann_lsh_indexed.buckets")
    # r15: fused per-bucket GEMM candidates + threshold
    hits = _fused_verify_self(spark, e, buckets,
                              ("table_id", "bucket_key"), "vec_id",
                              "vec_a", "vec_b", 0.4, slot="indexed")
    if hits is not None:
        return _finish_pair_hits(hits, "vec_a", "vec_b", "indexed")
    left = buckets.select(F.col("vec_id").alias("vec_a"),
                          "table_id", "bucket_key")
    right = buckets.select(F.col("vec_id").alias("vec_b"),
                           "table_id", "bucket_key")
    cand = _distinct_pairs(
        left.join(right, ["table_id", "bucket_key"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b"),
        left, right, ("table_id", "bucket_key"), "vec_a", "vec_b")
    return _verify_candidates(e, cand, slot="indexed")


@contract("sim_ann_indexed", oracle=_ANN_ORACLE)
def sim_ann_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-SERVED ANN join as a driver contract (J44, r14 — the r13
    verdict's item 7): persist the LSH bucket table as an L11
    manifest table (no-op when already fresh for this corpus — the
    re-run path a warm session takes), then answer the similarity
    join THROUGH the index: the warm plan contains no hyperplane
    GEMM (pinned in tests/test_ann_index.py), only the manifest
    bucket scan → capped self-join → exact-cosine verify. The hash
    matching the exact all-pairs oracle proves the persisted index
    preserves recall 1 end-to-end. 100 TB: the index is ~24 B/row ×
    n·T — the asset a production corpus amortizes across every
    query; build cost is one base GEMM, refresh cost is
    O(new vectors) via the high-water-mark delta append."""
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    e = load_table(spark, sf_dir, "embeddings")
    root = _os.path.join(
        _tempfile.gettempdir(),
        "silvia_annidx_"
        + _hashlib.sha1(_os.path.abspath(sf_dir).encode()).hexdigest()[:10])
    persist_ann_index(spark, e, root)
    assert ann_index_fresh(e, root), "index not fresh after persist"
    return sim_ann_lsh_indexed(spark, sf_dir, root)
