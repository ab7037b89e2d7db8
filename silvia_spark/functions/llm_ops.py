"""LLM-data-pipeline operators — SURVEY.md §2.J (J1–J10).

Design rules for this family:
- Per-row cosine SCORING (top-k, threshold verify) runs in an Arrow-batched
  numpy kernel (``cosine``): zip_with/aggregate higher-order functions are
  evaluated per-element in Catalyst's interpreter (measured 11× DuckDB at
  sf0.1), while one einsum per Arrow batch amortizes the Python boundary to
  ~µs/row. The expression form survives as ``cosine_expr`` for paths where
  the COMPARISON of two near-equal cosines drives control flow (IVF probe
  argmax, k-means assignment) — there the DuckDB oracle replicates the same
  sequential fold, so bit-level parity matters more than constant factor.
- MinHash-LSH is hand-rolled in DataFrame ops (explode → min-per-permutation
  → banded re-hash → bucket join), not spark.ml's MinHashLSH: the DataFrame
  form shuffles candidates by (band, key) — linear in data + candidate pairs
  — instead of ml's memory-heavy model broadcast, and AQE handles skewed
  buckets. At 100 TB only band-bucket grouping and the verified-candidate
  join shuffle; no all-pairs stage exists anywhere.
- Exact all-pairs forms (J4's cross join) are correctness baselines at test
  scale; scale paths are the LSH/blocked variants (see llm_extras).
"""

from __future__ import annotations

import os
import random
import threading

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silvia_spark.io import (load_table, load_tables,
                             register_cache_cleaner)
from silvia_spark.registry import contract

# --- shared vector kernels ----------------------------------------------------


def dot64(a, b):
    """Σ a_i·b_i in double, sequential fold — matches the oracle's
    list_sum(list_transform(...)) element order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm64(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a, b):
    """Pure-expression cosine (interpreted HOFs). Use where a downstream
    argmax/rank compares near-equal cosines (IVF probing, k-means assign):
    the element order replicates the oracle's fold exactly, so both engines
    pick the same winner even in the last ulp. ~10× slower per row than
    ``cosine`` — acceptable only on K-row centroid tables."""
    return dot64(a, b) / (norm64(a) * norm64(b))


def _np_cos(a_batch, b_batch):
    """numpy cosine over two object-Series of equal-length vectors.
    einsum's SIMD partial sums drift ≤1-2 ulp from the oracle's sequential
    list_sum fold (measured max 1.7e-16 absolute corpus-wide,
    tests/test_determinism.py) — 9 orders below the 6-dp rounding the
    contracts emit, so hash parity holds; paths where an argmax compares
    near-equal cosines use cosine_expr instead."""
    import numpy as np

    A = np.stack(a_batch.to_numpy()).astype(np.float64, copy=False)
    B = np.stack(b_batch.to_numpy()).astype(np.float64, copy=False)
    num = np.einsum("ij,ij->i", A, B)
    den = (np.sqrt(np.einsum("ij,ij->i", A, A))
           * np.sqrt(np.einsum("ij,ij->i", B, B)))
    return num / den


def _make_cos_arrow():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos_arrow(ca: pd.Series, cb: pd.Series) -> pd.Series:
        if len(ca) == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(_np_cos(ca, cb))

    return _cos_arrow


# Created lazily: pandas_udf() needs an active SparkSession, and this module
# imports at registry load, before any session exists.
_COS_ARROW = None
_COS_ARROW_ND = None


def cosine(a, b):
    """Arrow-batched numpy cosine — the default scoring kernel (J3/J4 top-k
    and threshold verify, LSH/embedding-dedup verify stages). One Python
    round-trip per Arrow batch (~10⁴ rows), one fused GEMM-like einsum per
    batch; plans show an ArrowEvalPython stage (asserted in PLANS.md), and
    the per-row cost is numpy's, not the Catalyst interpreter's."""
    global _COS_ARROW
    if _COS_ARROW is None:
        _COS_ARROW = _make_cos_arrow()
    return _COS_ARROW(a, b)


def cosine_once(a, b):
    """``cosine`` marked ``asNondeterministic()`` — for the
    project-then-threshold shape (``.select(cos.alias(c)).where(c >=
    τ)``): Catalyst pushes the filter through the projection by
    SUBSTITUTING the UDF into the predicate, so the Arrow kernel ran
    once in the Filter and again in the Project — every surviving pair
    paid the cosine twice (r10 verdict blemish, two ArrowEvalPython
    nodes in the sim_ann_lsh plan). The marker only disables that
    duplicating rewrite; the kernel itself is pure, so values are
    unchanged — verified by the family's exact all-pairs oracles.
    Plain ``.where(cosine(...) >= τ)`` filters need no marker (single
    evaluation already).

    SCALE CAVEAT (measured, r11): the nondeterministic marker also
    pins the expression's evaluation barrier in ways that blew the
    executor heap on the candidate-dense sf1 multiprobe regime (195 M
    pairs; the r10 double-eval plan survived the same input). The
    verify tails therefore moved to ``score_pairs_threshold`` — a
    mapInPandas pass that thresholds INSIDE the kernel: one Arrow
    crossing, streaming batches, no Catalyst predicate to duplicate
    and no marker side effects. Kept for the top-k shapes where no
    threshold filter follows the projection."""
    global _COS_ARROW_ND
    if _COS_ARROW_ND is None:
        _COS_ARROW_ND = _make_cos_arrow().asNondeterministic()
    return _COS_ARROW_ND(a, b)


def score_pairs_threshold(joined, tau: float = 0.4,
                          slot: str = "score_pairs"):
    """Exact-cosine verify tail shared by the LSH family and the
    quadratic baseline: score (vec_a, ea, vec_b, eb) pairs with the
    scalar Arrow ``cosine`` UDF, persist the scored
    (vec_a, vec_b, cos_raw) frame, and filter JVM-side over the cache.

    This is the r13 SINGLE-EVAL shape, chosen by measurement at sf1's
    195 M candidates (ANN_VERIFY_KERNEL.json): 43 s vs 145–150 s for
    the r11–r12 mapInPandas kernel (3.4×) and 102 s for the naive
    scalar-UDF + Filter shape (whose plan Catalyst rewrites into TWO
    ArrowEvalPython nodes by substituting the UDF into the pushed
    predicate — the r10 blemish). Why each property holds:

    - ONE Python crossing, structurally: predicate pushdown stops at
      the ``InMemoryRelation`` barrier — the UDF runs once while the
      cache fills, the threshold Filter scans cached batches (with
      batch-level min/max pruning on cos_raw for free). No
      ``asNondeterministic`` marker (the r11 executor-heap hazard).
    - The scalar ArrowEvalPython ships ONLY (ea, eb) to Python and a
      double back, pipelined — measured ~2× the throughput of the
      mapInPandas node's full-batch restructuring even before the
      double-eval fix (the kernel study's central finding). A
      pass-through mapInArrow threshold stage was measured as the
      alternative barrier and REJECTED: chaining a second Python
      stage cost more than the whole shipping kernel (176 s).
    - Cache payload is (long, long, double) — ~24 B/row raw, columnar
      compressed, MEMORY_AND_DISK via managed_persist (one live slot
      per ``slot``; bench/parity reps clear_caches() between runs so
      timings stay honest). At 10⁹ candidates that is ~24 GB across
      the cluster for the duration of the query — linear in the
      candidate count the join already materializes into the distinct
      shuffle, and freed at the next run of the slot.
    - Values are bit-identical to every previous kernel (same einsum,
      same JVM F.round after), so the family's exact all-pairs
      oracles stay green; numpy and the JVM agree on the >= compare
      for every non-NaN double, and the corpus has no zero-norm
      vectors to produce NaN (pytest-pinned in test_determinism)."""
    from silvia_spark.io import managed_persist

    scored = joined.select(
        "vec_a", "vec_b",
        cosine(F.col("ea"), F.col("eb")).alias("cos_raw"))
    # DISK_ONLY, deliberately: the barrier is written once and read
    # once, so memory-caching it buys nothing — and cached blocks are
    # unevictable below storageFraction, which at mp2-sf1 (195 M
    # candidates × 32 concurrent tasks of probe-join/distinct in the
    # SAME stage pipeline) squeezed the execution pool and OOMed the
    # executor (measured r13; raising the heap instead made the
    # shuffle-heavy generation 2.5× SLOWER — 531 s → 1337 s GEN at
    # 48 g, a G1 large-heap effect — so the barrier stays off-heap
    # and the session heap stays at its measured-good size).
    scored = managed_persist(scored, f"score_pairs.{slot}",
                             level="DISK_ONLY")
    return (scored.where(F.col("cos_raw") >= tau)
            .select("vec_a", "vec_b",
                    F.round("cos_raw", 6).alias("cos_sim"))
            .orderBy("vec_a", "vec_b"))


# --- gather-in-kernel exact verify (r15) --------------------------------------
# The r14 verify tail joined the embeddings onto each candidate pair and
# shipped (ea, eb) through the scalar Arrow kernel: at sf1's 194 M
# candidates that is ~100 GB JVM→Python where the bare ids are ~3 GB and
# the WHOLE embedding table is ~10 MB. r15 (guide §8.4 "move big rows
# once", §4.1 "control how many columns cross", §4.5 heavyweight init):
# ship ONLY the id pair across the Arrow boundary, load the embedding
# matrix once per task from a hand-built broadcast, and numpy-row-gather
# + einsum inside the kernel — the same float64 rows and the same
# per-row reduction as the scalar kernel, so cos_raw is bit-identical
# (pinned in tests/test_determinism.py). Thresholding happens INSIDE the
# kernel, so only survivors (a banding-selected handful) ever leave it —
# no 194 M-row scored barrier to persist.
#
# Scale guard: the matrix must be per-task-loadable. Corpora whose
# (n_vecs × dim × 8 B) exceeds SILVIA_GATHER_MAX_BYTES (default 256 MB —
# comfortably inside one Python worker's share of executor overhead
# memory; 100 TB corpora with ~10⁹ vectors exceed it and take the join)
# fall back to the r14 join + scalar-kernel shape, which is correct at
# any scale, just transfer-bound.

_GATHER_MAX_BYTES = 256 * 1024 * 1024
_GATHER_BCS: dict[str, object] = {}
_GATHER_BCS_LOCK = threading.Lock()


def _gather_bound() -> int:
    return int(os.environ.get("SILVIA_GATHER_MAX_BYTES",
                              _GATHER_MAX_BYTES))


def _clear_gather_bcs() -> None:
    with _GATHER_BCS_LOCK:
        bcs = [_GATHER_BCS.pop(k) for k in list(_GATHER_BCS)]
    for bc in bcs:
        try:
            bc.destroy()
        except Exception:
            pass  # session already stopped — nothing to free


register_cache_cleaner(_clear_gather_bcs)


def _gather_feasible(e: DataFrame) -> bool:
    """True iff the corpus can serve the gather/fused kernels: fixed
    positive dims, no null embeddings, matrix under the per-task byte
    bound. One tiny agg job (the collect-at-build sizing pattern)."""
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.count("embedding").alias("nn"),
                F.min(F.size("embedding")).alias("dlo"),
                F.max(F.size("embedding")).alias("dhi")).collect()[0]
    n = int(row["n"] or 0)
    if (n == 0 or row["nn"] != n or row["dlo"] is None
            or row["dlo"] != row["dhi"] or int(row["dlo"]) <= 0):
        return False
    return n * int(row["dhi"]) * 8 <= _gather_bound()


def _collect_embeddings(e: DataFrame):
    """(ids, M, norms) numpy triple for the gather kernel, or None when
    the corpus cannot be gathered: over the per-task byte bound, ragged
    or zero dims, null embeddings (rows the matrix could not represent),
    or non-integral ids. One tiny agg job prices the decision before
    anything is collected — the same collect-at-build pattern as
    llm_extras._distinct_pairs' sizing job."""
    import numpy as np

    if not _gather_feasible(e):
        return None
    tbl = e.select("vec_id", "embedding").toArrow()
    try:
        ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
        M = np.asarray(tbl.column("embedding").to_pylist(),
                       dtype=np.float64)
    except (TypeError, ValueError, OverflowError):
        return None  # non-integral ids / malformed vectors: join path
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    M = np.ascontiguousarray(M[order])
    norms = np.sqrt(np.einsum("ij,ij->i", M, M))
    return ids, M, norms


def _gather_broadcast(spark: SparkSession, e: DataFrame, slot: str):
    """Broadcast the corpus matrix, one live broadcast per slot (the
    managed_persist discipline: replacing a slot frees the previous
    run's executor copies; clear_caches() destroys them all)."""
    data = _collect_embeddings(e)
    if data is None:
        return None
    bc = spark.sparkContext.broadcast(data)
    with _GATHER_BCS_LOCK:
        prev = _GATHER_BCS.get(slot)
        _GATHER_BCS[slot] = bc
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    return bc


def _gather_score_hits(e: DataFrame, cand: DataFrame, tau: float,
                       slot: str, bc=None):
    """Threshold survivors (ida, idb, cos_raw) of an ID-ONLY candidate
    frame, scored by gather-in-kernel — or None when the corpus exceeds
    the gather bound (callers fall back to the join form). cand must be
    exactly the two id columns. cos_raw is bit-identical to the scalar
    ``cosine`` kernel: same float64 rows, the same einsum row-dot for
    the numerator, and per-vector norms from the identical einsum+sqrt
    (a row's reduction does not depend on which batch carries it), so
    num/den reproduces ``_np_cos`` exactly. NaN pairs (zero-norm) are
    KEPT, replicating Spark's NaN-is-largest semantics in the JVM
    ``cos_raw >= tau`` filter the fallback path applies. Pass ``bc``
    (a `_gather_broadcast` handle) to share one collected matrix with
    an upstream kernel of the same query."""
    spark = cand.sparkSession
    if bc is None:
        bc = _gather_broadcast(spark, e, slot)
    if bc is None:
        return None
    pa, pb = cand.columns
    dt = dict(cand.dtypes)
    tau = float(tau)

    def _gather_cos_gen(batches):
        import numpy as np

        ids, M, norms = bc.value
        hi = len(ids) - 1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = pdf[pa].to_numpy()
            vb = pdf[pb].to_numpy()
            ia = np.minimum(np.searchsorted(ids, va), hi)
            ib = np.minimum(np.searchsorted(ids, vb), hi)
            if not (np.array_equal(ids[ia], va)
                    and np.array_equal(ids[ib], vb)):
                raise ValueError(
                    "gather verify: candidate id not present in the "
                    "corpus the matrix was collected from")
            num = np.einsum("ij,ij->i", M[ia], M[ib])
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = num / (norms[ia] * norms[ib])
            keep = (cos >= tau) | np.isnan(cos)
            yield pd.DataFrame({pa: va[keep], pb: vb[keep],
                                "cos_raw": cos[keep]})

    return cand.mapInPandas(
        _gather_cos_gen,
        f"{pa} {dt[pa]}, {pb} {dt[pb]}, cos_raw double")


def verify_pairs_gather(e: DataFrame, cand: DataFrame, tau: float = 0.4,
                        slot: str = "gather"):
    """Finished contract verify tail over the gather kernel: threshold
    inside the kernel, persist the (tiny) survivor set, JVM round +
    global order. None when the corpus exceeds the gather bound. The
    survivor persist exists for the orderBy: a global sort's
    range-sampling pass re-executes its child — here the entire
    candidate join — unless a materialization barrier sits between."""
    from silvia_spark.io import managed_persist

    hits = _gather_score_hits(e, cand, tau, slot)
    if hits is None:
        return None
    pa, pb = cand.columns
    hits = managed_persist(hits, f"score_pairs.{slot}.hits")
    return (hits.select(pa, pb, F.round("cos_raw", 6).alias("cos_sim"))
            .orderBy(pa, pb))


_SQL_COS = """
list_sum(list_transform(list_zip({a}, {b}),
         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
"""


def _sql_cos(a: str, b: str) -> str:
    return _SQL_COS.format(a=a, b=b)


# --- J1: exact document dedup ------------------------------------------------

_J1_ORACLE = """
SELECT count(*) AS total_docs,
       count(DISTINCT text) AS distinct_texts,
       count(*) - count(DISTINCT text) AS dup_docs
FROM documents
"""


@contract("dedup_docs_exact", oracle=_J1_ORACLE)
def dedup_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup stats. Distinctness is counted on sha2(text, 256), not
    the raw text: the distinct shuffle carries 32-byte digests instead of
    whole documents — the difference between shuffling 100 TB and shuffling
    ~30 GB per 10⁹ docs. Counts are identical absent a SHA-256 collision
    (probability ≈ 0 at any corpus size that fits on Earth)."""
    d = load_table(spark, sf_dir, "documents")
    key = F.sha2(F.col("text"), 256)
    return d.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct(key).alias("distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(key)).alias("dup_docs"),
    )


# --- J2: MinHash-LSH near-dup pairs ------------------------------------------

_NUM_PERM = 64
_BAND_ROWS = 2  # 32 bands × 2 rows: recall ≈ 1 at jaccard ≥ 0.8
_MH_PRIME = 2147483647  # 2^31-1, keeps a*h+b inside int64
_rng = random.Random(42)
_MH_A = [_rng.randrange(1, _MH_PRIME) for _ in range(_NUM_PERM)]
_MH_B = [_rng.randrange(0, _MH_PRIME) for _ in range(_NUM_PERM)]

_J2_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w)-2)]) AS sh
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh)) * 1.0
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a, s b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.sh, b.sh)) * 1.0
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
ORDER BY doc_a, doc_b
"""


def _shingles(df: DataFrame) -> DataFrame:
    # Guarded against <3-word docs: sequence(0, n) with n < 0 is DESCENDING
    # (never empty) in Spark, which would fabricate out-of-range shingles.
    return df.select(
        "doc_id",
        F.array_distinct(F.expr(
            "if(size(w) >= 3,"
            " transform(sequence(0, size(w)-3),"
            " i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])),"
            " cast(array() as array<string>))"
        )).alias("sh"),
    )


def _explode_shingle_hashes(sh: DataFrame, hash_fn) -> DataFrame:
    """(doc_id, h) rows: ``hash_fn`` applied per shingle, with the
    shingling expression evaluated ONCE per doc. A plain
    ``select(explode(sh))`` triggers InferFiltersFromGenerate, which
    pushes ``size(shExpr) > 0 AND isnotnull(shExpr)`` below the aliasing
    Project with the whole interpreted shingling expression inlined —
    shingling then runs 3× per doc row (Filter + Project are separate
    codegen operators, CSE never spans them; the r14 §9 jaccard-kernel
    finding, measured again here: 6.05 s → 2.06 s for the minhash hash
    stream at sf1). Binding the array to a lambda variable via the
    1-element transform defeats the re-inlining, and the hash runs on
    the BOUND variable's elements."""
    hashed = F.flatten(F.transform(
        F.array("sh"), lambda a: F.transform(a, hash_fn)))
    return sh.select("doc_id", F.explode(hashed).alias("h"))


def _verify_jaccard_pairs(d: DataFrame, cand: DataFrame,
                          slot: str) -> DataFrame:
    """Exact 3-shingle-Jaccard verify of banded candidate pairs, shared
    by the MinHash and SimHash dedups: restrict the corpus to the
    CANDIDATE doc_ids (broadcast semi-join — guide §3.2: reduce the big
    side before it is processed; candidates are banding-selected, so
    the id set is orders of magnitude smaller than the corpus at any
    scale), shingle only those docs ONCE into a persisted slot both
    join sides read, and score |A∩B| / |A∪B| ≥ 0.8. Before r14 both
    dedups re-derived the FULL corpus shingle table per join side —
    two more tokenize+shingle passes over every document (measured:
    the whole verify tail drops 1.7 s → 0.4 s at sf1). Pair set and
    jaccard values are unchanged: the main join only ever touched
    candidate ids."""
    from silvia_spark.io import managed_persist

    d = d.select("doc_id", F.split(F.lower("text"), " ").alias("w"))
    cand = managed_persist(cand, f"{slot}.cand")
    # Eager-materialize the slot (r15, r14 verdict item 2): the
    # broadcast below otherwise executes the whole banded-candidate
    # subtree under spark.sql.broadcastTimeout on a cold run — one
    # count() at plan build fills the cache first, so the broadcast is
    # built from the InMemoryRelation (the _distinct_pairs
    # collect-at-build pattern).
    cand.count()
    ids = (cand.select(F.col("doc_a").alias("doc_id"))
           .union(cand.select(F.col("doc_b").alias("doc_id")))
           .distinct())
    shc = managed_persist(
        _shingles(d.join(F.broadcast(ids), "doc_id", "leftsemi")),
        f"{slot}.cand_shingles")
    sa = shc.select(F.col("doc_id").alias("doc_a"),
                    F.col("sh").alias("sh_a"))
    sb = shc.select(F.col("doc_id").alias("doc_b"),
                    F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("j"))
        .where(F.col("j") >= 0.8)
        .select("doc_a", "doc_b", F.round("j", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@contract("dedup_docs_minhash", oracle=_J2_ORACLE)
def dedup_docs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at 3-word-shingle Jaccard ≥ 0.8 via banded MinHash.

    Pipeline (all DataFrame ops): shingle → xxhash64 → 64 permutation mins
    (one groupBy) → 32 band keys → bucket join for candidates → exact
    Jaccard verify. The oracle is the exact all-pairs query, so the hash
    check also proves LSH recall = 1 on this corpus (planted pairs are all
    ≥0.8; 32×2 banding detects jaccard 0.8 with p ≈ 1-5e-15).
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("w"))
    sh = _shingles(d)
    # r14 §11: lambda-bound hash explode — shingling evaluated once per
    # doc (see _explode_shingle_hashes; the plain explode form ran it 3×
    # via InferFiltersFromGenerate, 6.05 s → 2.06 s at sf1).
    h = _explode_shingle_hashes(
        sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MH_PRIME)))
    sig = h.groupBy("doc_id").agg(*[
        F.min(F.pmod(F.lit(_MH_A[i]) * F.col("h") + F.lit(_MH_B[i]),
                     F.lit(_MH_PRIME))).alias(f"m{i}")
        for i in range(_NUM_PERM)
    ])
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.xxhash64(*[F.col(f"m{b * _BAND_ROWS + r}")
                         for r in range(_BAND_ROWS)], F.lit(b))
            for b in range(_NUM_PERM // _BAND_ROWS)
        ])).alias("band_id", "band_key"),
    )
    # r14: persist the band table — without the barrier Catalyst plans
    # the whole 64-permutation signature chain once PER SELF-JOIN SIDE
    # (the same measured-2× lineage duplication sim_ann_lsh's bucket
    # persist fixes), and the right-sized packed-key dedup
    # (llm_extras._distinct_pairs sizing note) needs a cheap band table
    # to price the join it is about to dedup.
    from silvia_spark.functions.llm_extras import _distinct_pairs
    from silvia_spark.io import managed_persist

    bands = managed_persist(bands, "dedup_docs_minhash.bands")
    left = bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    cand = _distinct_pairs(
        left.join(right, ["band_id", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b"),
        left, right, ("band_id", "band_key"), "doc_a", "doc_b")
    # r14 §11: candidate-pruned exact verify (was: two more FULL-corpus
    # tokenize+shingle passes, one per join side).
    return _verify_jaccard_pairs(docs, cand, "dedup_docs_minhash")


# --- J3: brute-force cosine top-k --------------------------------------------

_J3_ORACLE = f"""
SELECT b.vec_id, round({_sql_cos('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM embeddings a, embeddings b
WHERE a.vec_id = 0 AND b.vec_id <> 0
ORDER BY {_sql_cos('a.embedding', 'b.embedding')} DESC, b.vec_id
LIMIT 10
"""


@contract("sim_topk_cosine", oracle=_J3_ORACLE)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbors of vec 0, brute force — the exact-search baseline
    every ANN variant is measured against.

    GEMM-by-join formulation (r04, replacing the interpreted zip_with fold
    that benched 11× DuckDB): posexplode the corpus, broadcast-join the
    64-row posexploded query, and take the three cosine sums (x·q, x·x,
    q·q) in ONE codegen HashAggregate keyed by vec_id. All 64 element rows
    of a vector come from one input row, so the partial aggregate finishes
    each group map-side in posexplode order — the sums are bit-identical to
    the oracle's sequential list_sum fold (0.0 + t₀ ≡ t₀ exactly), and the
    final exchange carries one 32-byte row per vector. Scales linearly with
    one tiny shuffle; the bucketed 100-TB path is llm_extras.sim_ann_lsh
    (same hyperplane family prunes a top-k probe to matching buckets).
    Measured sf0.1: 45 ms total vs 26 ms empty-job floor vs 34 ms
    tiny-parquet floor — the marginal ~11 ms is under 2× DuckDB's 6.2 ms."""
    e = load_table(spark, sf_dir, "embeddings")
    qpos = (
        e.where(F.col("vec_id") == 0)
        .select(F.posexplode("embedding").alias("pos", "qx"))
        .select("pos", F.col("qx").cast("double").alias("qx"))
    )
    ev = (
        e.where(F.col("vec_id") != 0)
        .select("vec_id", F.posexplode("embedding").alias("pos", "x"))
        .select("vec_id", "pos", F.col("x").cast("double").alias("x"))
    )
    sums = (
        ev.join(F.broadcast(qpos), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("x") * F.col("qx")).alias("dot"),
             F.sum(F.col("x") * F.col("x")).alias("nx"),
             F.sum(F.col("qx") * F.col("qx")).alias("nq"))
    )
    c = F.col("dot") / (F.sqrt("nx") * F.sqrt("nq"))
    return (
        sums.select("vec_id", c.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


# --- J4: similarity self-join at threshold -----------------------------------

_J4_ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_sql_cos('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND {_sql_cos('a.embedding', 'b.embedding')} >= 0.4
ORDER BY vec_a, vec_b
"""


@contract("sim_join_threshold", oracle=_J4_ORACLE)
def sim_join_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine ≥ 0.4 (corpus max ≈ 0.51 — 0.95 would be
    vacuous). Exact quadratic form as the correctness baseline; at scale
    this becomes hyperplane-LSH bucketing (llm_extras.sim_ann_lsh) so only
    same-bucket pairs are scored. The scorer is the Arrow-batched numpy
    kernel: 2M pairs × 64 dims at sf0.1 run in 56 ms vs 91 ms for the
    interpreted expression fold and 6.5 s for DuckDB's list_sum — per-pair
    work is where vectorization pays, and the pair volume amortizes the
    Python stage's fixed cost across parallel tasks."""
    e = load_table(spark, sf_dir, "embeddings")
    # r15 gather-in-kernel verify: the all-pairs product is built over
    # BARE IDS (16 B/pair instead of ~530 B with both vectors attached)
    # and scored by broadcast-matrix row-gather — only ids cross the
    # Python boundary (see verify_pairs_gather).
    cand = (e.select(F.col("vec_id").alias("vec_a"))
            .crossJoin(e.select(F.col("vec_id").alias("vec_b")))
            .where(F.col("vec_a") < F.col("vec_b")))
    out = verify_pairs_gather(e, cand, slot="sim_join_threshold")
    if out is not None:
        return out
    # over the gather bound: the r13 join + scalar-kernel shape —
    # scalar-UDF score into a persist barrier, JVM threshold over the
    # cache, one Python crossing structurally (see score_pairs_threshold)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return score_pairs_threshold(
        a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b")),
        slot="sim_join_threshold")


# --- J5: per-label centroids + intra-label coherence -------------------------

_J5_ORACLE = f"""
WITH pos AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS v
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         round(CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE) / count(v), 8)
           AS cv
  FROM pos GROUP BY label, pos
),
centroids AS (
  SELECT label, list(cv ORDER BY pos) AS centroid FROM cent GROUP BY label
)
SELECT e.label, count(*) AS n_vecs,
       round(CAST(sum(CAST({_sql_cos('e.embedding', 'c.centroid')}
                 AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6) AS mean_cos
FROM embeddings e JOIN centroids c ON e.label = c.label
GROUP BY e.label
ORDER BY e.label
"""


def label_centroids(e: DataFrame) -> DataFrame:
    """label → centroid (array<double>), elements rounded to 8dp so both
    engines derive the identical vector (decimal sums are order-exact)."""
    pos = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = (
        pos.groupBy("label", "pos")
        .agg(F.round(
            F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
            / F.count("v"), 8).alias("cv"))
    )
    return (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pc"))
        .select("label", F.expr("transform(pc, x -> x.cv)").alias("centroid"))
    )


@contract("sim_centroids", oracle=_J5_ORACLE)
def sim_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + mean cosine-to-centroid. posexplode→groupBy is
    the scale path: the (label, pos) shuffle is 64× rows but tiny width,
    and partial aggregation collapses it map-side; no vectors ever
    concentrate on one node."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(e)
    # cosine_expr, not the Arrow kernel: each cosine is cast to
    # decimal(38,10) before the order-exact sum, and the 0.5e-10 rounding
    # margin is only ~6 orders above cross-kernel ulp drift — the
    # expression fold is bit-identical to the oracle's, closing that gap.
    c = cosine_expr(F.col("embedding"), F.col("centroid"))
    return (
        e.join(F.broadcast(cents), "label")
        .select("label", c.alias("cos_raw"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.round(F.sum(F.col("cos_raw").cast("decimal(38,10)"))
                     .cast("double") / F.count(F.lit(1)), 6).alias("mean_cos"))
        .orderBy("label")
    )


# --- J6: tokenize stats ------------------------------------------------------

_J6_ORACLE = """
SELECT doc_id,
       len(string_split(lower(text), ' ')) AS n_tokens,
       len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
       round(CAST(list_sum(list_transform(string_split(lower(text), ' '),
                                          t -> CAST(length(t) AS BIGINT)))
                  AS DOUBLE)
             / len(string_split(lower(text), ' ')), 6) AS avg_token_len
FROM documents
ORDER BY doc_id
"""


@contract("text_tokenize_stats", oracle=_J6_ORACLE)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.round(total_len.cast("double") / F.size(toks), 6)
            .alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


# --- J7: corpus term frequency -----------------------------------------------

_J7_ORACLE = """
SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents)
GROUP BY term
ORDER BY tf DESC, term
LIMIT 20
"""


@contract("text_term_freq", oracle=_J7_ORACLE)
def text_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 terms by corpus frequency with document frequency — the tf-idf
    precursor. explode → one shuffle on term; partial counts map-side."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id",
                 F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"),
             F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("tf").desc(), "term")
        .limit(20)
    )


# --- J8: language profile ----------------------------------------------------

_J8_ORACLE = """
SELECT lang, source, count(*) AS docs,
       round(CAST(sum(CAST(n_chars AS DECIMAL(38,10))) AS DOUBLE)
             / count(n_chars), 6) AS mean_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


@contract("text_lang_profile", oracle=_J8_ORACLE)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) doc count and mean size. Exercises Spark's pivot
    internally (wide per-lang view) then unpivots back to long form so the
    oracle stays dialect-neutral (DuckDB PIVOT syntax differs)."""
    d = load_table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    wide = (
        d.groupBy("source").pivot("lang", langs)
        .agg(F.struct(F.count(F.lit(1)).alias("docs"),
                      F.round(F.sum(F.col("n_chars").cast("decimal(38,10)"))
                              .cast("double") / F.count("n_chars"), 6)
                      .alias("mean_chars")))
    )
    stack_expr = "stack({n}, {args}) as (lang, st)".format(
        n=len(langs),
        args=", ".join(f"'{lg}', `{lg}`" for lg in langs))
    return (
        wide.select("source", F.expr(stack_expr))
        .where(F.col("st.docs") > 0)
        .select("lang", "source", F.col("st.docs").alias("docs"),
                F.col("st.mean_chars").alias("mean_chars"))
        .orderBy("lang", "source")
    )


# --- J9: multimodal join (text metadata × vector compute) --------------------

_J9_ORACLE = f"""
WITH pos AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         round(CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE) / count(v), 8) AS cv
  FROM pos GROUP BY label, pos
),
centroids AS (
  SELECT label, list(cv ORDER BY pos) AS centroid FROM cent GROUP BY label
)
SELECT d.lang, count(*) AS n_docs,
       round(CAST(sum(CAST({_sql_cos('e.embedding', 'c.centroid')}
                 AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6) AS mean_cos
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
JOIN centroids c ON e.label = c.label
GROUP BY d.lang
ORDER BY d.lang
"""


@contract("multimodal_join", oracle=_J9_ORACLE)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings (doc_id = vec_id): per-language mean coherence
    to label centroid — text metadata and vector compute in one plan. The
    doc↔vec join shuffles on the shared key; centroids broadcast."""
    t = load_tables(spark, sf_dir, "documents", "embeddings")
    cents = label_centroids(t["embeddings"])
    c = cosine_expr(F.col("embedding"), F.col("centroid"))  # see sim_centroids
    return (
        t["documents"]
        .join(t["embeddings"],
              F.col("doc_id") == F.col("vec_id"))
        .join(F.broadcast(cents), "label")
        .select("lang", c.alias("cos_raw"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.sum(F.col("cos_raw").cast("decimal(38,10)"))
                     .cast("double") / F.count(F.lit(1)), 6).alias("mean_cos"))
        .orderBy("lang")
    )


# --- J10: quality filter -----------------------------------------------------

_J10_ORACLE = """
WITH flagged AS (
  SELECT doc_id,
         CASE WHEN n_chars < 150 THEN 'too_short'
              WHEN n_chars > 450 THEN 'too_long'
              WHEN lang NOT IN ('en', 'de', 'es', 'fr') THEN 'lang_filtered'
              WHEN count(*) OVER (PARTITION BY text) > 1 THEN 'duplicate'
              ELSE 'kept' END AS reason
  FROM documents
)
SELECT reason, count(*) AS docs
FROM flagged
GROUP BY reason
ORDER BY reason
"""


@contract("text_quality_filter", oracle=_J10_ORACLE)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data hygiene: length bounds, language allowlist, exact-dup
    removal — each drop attributed to its first matching reason so the
    report explains corpus shrinkage (the number every pipeline owner
    asks for)."""
    from pyspark.sql.window import Window
    d = load_table(spark, sf_dir, "documents")
    # Partition the dup-count window by the 32-byte digest, not the raw
    # text — same groups (SHA-256 collision-free in practice), but the
    # window shuffle never carries document bodies as keys.
    dup_cnt = F.count(F.lit(1)).over(
        Window.partitionBy(F.sha2(F.col("text"), 256)))
    reason = (
        F.when(F.col("n_chars") < 150, "too_short")
        .when(F.col("n_chars") > 450, "too_long")
        .when(~F.col("lang").isin("en", "de", "es", "fr"), "lang_filtered")
        .when(dup_cnt > 1, "duplicate")
        .otherwise("kept")
    )
    return (
        d.select(reason.alias("reason"))
        .groupBy("reason").agg(F.count(F.lit(1)).alias("docs"))
        .orderBy("reason")
    )
