"""ANN recall in the <1 regime — the evidence the hash-green contracts
structurally cannot provide (their oracles prove recall = 1 on their
corpus). A planted hard-pair corpus with EXACT numpy ground truth drives
``bucket_keys_probed`` at table counts where the closed-form model
predicts recall 0.5–0.95, and the model's two claims are asserted:

- probes=0: the model is EXACT (independent sign bits), so measured must
  sit within sampling noise of predicted;
- probes>0: the model is a LOWER bound (probes target the weakest-margin
  bits, which are exactly the bits most likely to disagree — Lv et al.),
  so measured must be ≥ predicted − noise, and in practice well above.

CI-mode only (`full`): ~6 bucket-GEMM pipelines. tools/ann_recall.py is
the full-size (≈10⁴ pairs) version whose artifact is ANN_RECALL.json.
"""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.full

from tools.ann_recall import generate_corpus, measure, predicted_recall

CONFIGS = [(4, 0), (8, 0), (4, 1), (4, 3)]


@pytest.fixture(scope="module")
def results(spark):
    mat, truth = generate_corpus(n_pairs=1200)
    rows = measure(spark, mat, truth, configs=CONFIGS)
    return {(r["tables"], r["probes"]): r for r in rows}


def test_sub1_regime_is_actually_reached(results):
    """The whole point: these configs must measurably MISS pairs."""
    assert results[(4, 0)]["measured"] < 0.7
    assert results[(8, 0)]["measured"] < 0.9


def test_probe0_model_is_exact_within_noise(results):
    for cfg in [(4, 0), (8, 0)]:
        r = results[cfg]
        tol = max(5 * r["sigma"], 0.02)  # binomial noise + dim-64
        # Rademacher-vs-Gaussian projection skew
        assert abs(r["measured"] - r["predicted"]) <= tol, r


def test_probed_model_is_a_lower_bound(results):
    for cfg in [(4, 1), (4, 3)]:
        r = results[cfg]
        assert r["measured"] >= r["predicted"] - 3 * r["sigma"], r


def test_probing_monotonically_buys_recall(results):
    assert (results[(4, 0)]["measured"]
            < results[(4, 1)]["measured"]
            < results[(4, 3)]["measured"])


def test_collision_join_equals_candidate_generator(spark):
    """The cheap truth-side collision join the measurement uses must
    define the same recall as the REAL quadratic candidate generator
    (probed_candidates) — proven by set equality on a small corpus."""
    from pyspark.sql import functions as F

    from silvia_spark.functions.llm_extras import (bucket_keys_probed,
                                                   probed_candidates)

    mat, truth = generate_corpus(n_pairs=120)
    e = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    truth_df = spark.createDataFrame(
        [(i, j) for i, j, _ in truth], "vec_a BIGINT, vec_b BIGINT")
    buckets = bucket_keys_probed(spark, e, tables=4, probes=3).persist()

    via_candidates = set(
        (r.vec_a, r.vec_b) for r in
        truth_df.join(probed_candidates(buckets),
                      ["vec_a", "vec_b"], "left_semi").collect())

    ba = buckets.select(F.col("vec_id").alias("vec_a"), "table_id",
                        F.col("bucket_key").alias("k_a"),
                        F.col("probe_keys").alias("pk_a"))
    bb = buckets.select(F.col("vec_id").alias("vec_b"), "table_id",
                        F.col("bucket_key").alias("k_b"),
                        F.col("probe_keys").alias("pk_b"))
    collide = ((F.col("k_a") == F.col("k_b"))
               | F.array_contains("pk_a", F.col("k_b"))
               | F.array_contains("pk_b", F.col("k_a")))
    via_collision = set(
        (r.vec_a, r.vec_b) for r in
        truth_df.join(ba, "vec_a").join(bb, ["vec_b", "table_id"])
        .where(collide).select("vec_a", "vec_b").distinct().collect())
    buckets.unpersist()

    assert via_candidates == via_collision
    assert via_candidates  # non-vacuous


def test_predicted_recall_closed_form_spotcheck():
    """Pin the model arithmetic itself (cos 0.4, B=4): p ≈ 0.6310,
    q₀ = p⁴ ≈ 0.1585, probe terms per the Lv et al. expansion."""
    p = 1 - math.acos(0.4) / math.pi
    one = predicted_recall([0.4], 1, 0)
    assert abs(one - p ** 4) < 1e-12
    one3 = predicted_recall([0.4], 1, 3)
    expect = p ** 4 + 2 * p ** 3 * (1 - p) + (p * (1 - p)) ** 2
    assert abs(one3 - expect) < 1e-12


def test_choose_ann_variant_locks_measured_regimes():
    """r10 verdict item 4: the prose decision rule (SCALE.md §ANN) as
    code, locked against BOTH measured regimes. sf0.1 (ANN_CROSSOVER:
    971 distinct candidates/vector, index 85% of base wall) is
    index-bound → mp2 (measured 2.1× win); sf1 (BENCH_sf1_heavy: 9715
    candidates/vector, index 5%) is candidate-bound → base (mp2
    measured ~25% SLOWER there)."""
    from silvia_spark.functions.llm_extras import choose_ann_variant

    name, cfg = choose_ann_variant(est_candidates_per_vec=971)
    assert (name, cfg) == ("mp2", {"tables": 16, "probes_per_table": 4})
    name, cfg = choose_ann_variant(est_candidates_per_vec=9715)
    assert (name, cfg) == ("base", {"tables": 64,
                                    "probes_per_table": 1})
    # the index-share form of the same rule
    assert choose_ann_variant(index_share=0.85)[0] == "mp2"
    assert choose_ann_variant(index_share=0.049)[0] == "base"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="measured signal"):
        choose_ann_variant()


def test_estimate_candidates_tracks_measured_scale(spark):
    """The occupancy sampler reproduces the measured scale law: the
    estimate is within 2× of the closed-form n²·2^-B·T·ratio/n on the
    near-uniform test corpus, and small corpora land index-bound (the
    regime the sf0.1 measurement pins)."""
    from silvia_spark.functions.llm_extras import (
        _ANN_BITS, _ANN_DISTINCT_RATIO, _N_PROJ, choose_ann_variant,
        estimate_ann_candidates_per_vec)
    from silvia_spark.io import load_table
    from tests.conftest import SF_SMALL

    e = load_table(spark, SF_SMALL, "embeddings")
    n = e.count()
    est = estimate_ann_candidates_per_vec(spark, e)
    tables = _N_PROJ // _ANN_BITS
    uniform = (n * n / (2 ** _ANN_BITS) / 2) * tables \
        * _ANN_DISTINCT_RATIO / n
    assert 0 < est < 2 * uniform + 1, (est, uniform)
    assert choose_ann_variant(est_candidates_per_vec=est)[0] == "mp2"


def test_sim_ann_auto_routes_and_matches_pinned_variant(spark):
    """J43: the routed contract must dispatch through the measured
    rule and emit EXACTLY a pinned variant's output (recall-1 verify
    makes all variants set-equal, so routing can never change the
    hash)."""
    from silvia_spark.functions.llm_extras import (
        choose_ann_variant, estimate_ann_candidates_per_vec,
        sim_ann_auto, sim_ann_lsh)
    from silvia_spark.io import load_table

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings")
    est = estimate_ann_candidates_per_vec(spark, e)
    name, cfg = choose_ann_variant(est_candidates_per_vec=est)
    assert name in ("base", "mp2") and cfg["tables"] in (64, 16)
    got = sorted(map(tuple, sim_ann_auto(spark, sf).collect()))
    want = sorted(map(tuple, sim_ann_lsh(spark, sf).collect()))
    assert got == want
