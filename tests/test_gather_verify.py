"""r15 gather/fused verify equivalence guards.

The ANN verify family now has three shapes behind one contract:
fused per-bucket GEMM (+ exact rescore), id-gather kernel, and the r14
join + scalar-kernel fallback past the gather bound. The oracle parity
suite proves each against DuckDB; THESE tests pin that the shapes agree
with each other and that the guard actually switches — so a future
change cannot silently leave the fallback diverging (it only runs on
corpora too big for the test matrix otherwise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from silvia_spark.io import clear_caches, load_table

SF = "/root/testdata/sf0.01"


def _rows(spark, name):
    from silvia_spark import registry

    registry.load_all_modules()
    clear_caches()
    return sorted(map(tuple,
                      registry.QUERIES[name](spark, SF).collect()))


def test_fused_and_fallback_agree_self_join(spark, monkeypatch):
    fused = _rows(spark, "sim_ann_lsh")
    monkeypatch.setenv("SILVIA_GATHER_MAX_BYTES", "1")
    fallback = _rows(spark, "sim_ann_lsh")
    assert fused == fallback and len(fused) > 0


def test_fused_and_fallback_agree_probe_join(spark, monkeypatch):
    fused = _rows(spark, "sim_ann_lsh_multiprobe2")
    monkeypatch.setenv("SILVIA_GATHER_MAX_BYTES", "1")
    fallback = _rows(spark, "sim_ann_lsh_multiprobe2")
    assert fused == fallback and len(fused) > 0


def test_gather_and_fallback_agree_all_pairs(spark, monkeypatch):
    gathered = _rows(spark, "sim_join_threshold")
    monkeypatch.setenv("SILVIA_GATHER_MAX_BYTES", "1")
    fallback = _rows(spark, "sim_join_threshold")
    assert gathered == fallback and len(gathered) > 0


def test_fused_and_fallback_agree_dedup_accounting(spark, monkeypatch):
    fused = _rows(spark, "dedup_docs_embedding")
    monkeypatch.setenv("SILVIA_GATHER_MAX_BYTES", "1")
    fallback = _rows(spark, "dedup_docs_embedding")
    assert fused == fallback and len(fused) > 0


def test_guard_actually_switches_shapes(spark, monkeypatch):
    """The bound must really select the shape: under the default the
    plan carries the fused + gather kernels and NO scalar cosine; at
    bound 1 the scalar-kernel fallback (ArrowEvalPython) returns."""
    from silvia_spark import registry

    registry.load_all_modules()
    clear_caches()
    df = registry.QUERIES["sim_ann_lsh"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_fused_gemm_gen" in plan and "_gather_cos_gen" in plan
    assert "ArrowEvalPython [_cos_arrow" not in plan
    monkeypatch.setenv("SILVIA_GATHER_MAX_BYTES", "1")
    clear_caches()
    df2 = registry.QUERIES["sim_ann_lsh"](spark, SF)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "_fused_gemm_gen" not in plan2
    assert "ArrowEvalPython" in plan2 or "_cos_arrow" in plan2


def test_gather_kernel_rejects_foreign_candidate_ids(spark):
    """The gather kernel must fail LOUDLY (not score a wrong row) when
    a candidate id is absent from the collected corpus."""
    import pytest

    from silvia_spark.functions.llm_ops import _gather_score_hits

    e = load_table(spark, SF, "embeddings")
    bogus = spark.createDataFrame(
        [(10**12, 10**12 + 1)], "vec_a bigint, vec_b bigint")
    hits = _gather_score_hits(e, bogus, 0.4, slot="test.foreign")
    with pytest.raises(Exception, match="not present in the corpus"):
        hits.collect()
    clear_caches()
