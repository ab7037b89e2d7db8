"""r14 ANN index-stage kernel swap — equality guard.

The hyperplane bucket producers moved from the JVM GEMM-by-join
(`_quantized_dots`: posexplode ⋈ broadcast sign table → long-sum
hash-aggregate → per-table regroup, two exchanges of n·nproj rows) to
ONE map-only numpy GEMM per Arrow batch (`_bucket_keys_np` — guide
§4.2), measured 12.2 s → 0.55 s on the 20 k-vector sf1 corpus. The swap
is only admissible because the outputs are BIT-identical; this suite
pins that claim:

- bucket keys, weak-bit ranks and dtypes equal the retained JVM
  reference chain for all three hyperplane families on a real corpus;
- the rounding helper replicates `F.round(x·1e9)` (decimal HALF_UP over
  the shortest repr) on adversarial .5-boundary doubles, where
  floor(|v|+0.5) alone would disagree;
- NULL/empty embeddings emit no rows (posexplode semantics) and short
  vectors contribute only their present positions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import silvia_spark.functions.llm_extras as lx
from silvia_spark.io import load_table

SF = "/root/testdata/sf0.01"


def _jvm_bucket_keys(spark, e, seed, nproj, bits=lx._ANN_BITS):
    """The r13 JVM chain, kept verbatim as the reference semantics."""
    dots = lx._quantized_dots(spark, e, seed, nproj)
    bit_pos = F.expr(f"CAST(pmod(proj_id, {bits}) AS INT)")
    bit_val = F.when(
        F.col("dot_q") >= 0,
        F.expr(f"shiftleft(1, pmod(proj_id, {bits}))")).otherwise(0)
    return (
        dots.select("vec_id",
                    F.expr(f"proj_id div {bits}").alias("table_id"),
                    bit_val.alias("bv"),
                    F.struct(F.abs("dot_q").alias("m"),
                             bit_pos.alias("p")).alias("margin"))
        .groupBy("vec_id", "table_id")
        .agg(F.sum("bv").alias("bucket_key"),
             F.slice(F.sort_array(F.collect_list("margin")), 1, 2)
             .alias("weak2"))
        .select("vec_id", "table_id", "bucket_key",
                F.col("weak2")[0]["p"].alias("w0"),
                F.col("weak2")[1]["p"].alias("w1")))


@pytest.mark.parametrize("seed,nproj", [
    (lx._ANN_SEED, lx._N_PROJ),      # base: 64 tables
    (lx._MP_SEED, lx._MP_NPROJ),     # multiprobe-1: 24 tables
    (lx._MP2_SEED, lx._MP2_NPROJ),   # multiprobe-2: 16 tables
], ids=["base", "mp1", "mp2"])
def test_numpy_kernel_matches_jvm_reference(spark, seed, nproj):
    e = load_table(spark, SF, "embeddings")
    new = lx._bucket_keys_np(spark, e, seed, nproj)
    old = _jvm_bucket_keys(spark, e, seed, nproj)
    assert new.dtypes == old.dtypes
    got = set(map(tuple, new.collect()))
    want = set(map(tuple, old.collect()))
    assert got == want
    assert len(got) == e.count() * (nproj // lx._ANN_BITS)


def test_round_half_up_matches_spark_on_boundaries(spark):
    """Adversarial doubles around k + 0.5 (pre-division by 1e9 so the
    kernel's ×1e9 reproduces them): exact halves, one-ulp neighbours
    (where float |v|+0.5 rounds across the integer but the decimal
    value sits below it), negatives, and plain values."""
    import math

    import numpy as np

    vals = [0.5, 1.5, 2.5, -0.5, -2.5, 0.49999999999999994,
            math.nextafter(2.5, 0.0), math.nextafter(2.5, 10.0),
            math.nextafter(1e8 + 0.5, 0.0), 1e8 + 0.5,
            math.nextafter(1e8 + 0.5, 1e9), -math.nextafter(7.5, 0.0),
            0.0, -0.0, 1.2345678901, -98765.4321000111]
    raw = [v / 1e9 for v in vals]
    jvm = (spark.createDataFrame([(float(v),) for v in raw], "x double")
           .select(F.round(F.col("x") * F.lit(1e9)).cast("bigint")
                   .alias("r")).collect())
    jvm_r = [row["r"] for row in jvm]
    np_r = lx._round_half_up_1e9(np.array(raw, dtype=np.float64))
    assert [int(v) for v in np_r] == jvm_r


def test_null_and_short_embeddings_match_posexplode_semantics(spark):
    rows = [(1, [0.5] * lx._ANN_DIM), (2, None), (3, []),
            (4, [0.25, -0.75])]  # short vector: 2 of 64 positions
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>")
    new = lx._bucket_keys_np(spark, e, lx._ANN_SEED, lx._N_PROJ)
    old = _jvm_bucket_keys(spark, e, lx._ANN_SEED, lx._N_PROJ)
    got = set(map(tuple, new.collect()))
    assert got == set(map(tuple, old.collect()))
    # NULL and empty vectors emit nothing; the others emit one row per
    # table
    assert {r[0] for r in got} == {1, 4}
    assert len(got) == 2 * lx._ANN_TABLES
