"""Property tests for J25/J26 beyond the oracle parity gate: planted graph
shapes for the connected-components kernel (transitivity is exactly what the
pair-listing contracts can't express) and Unicode edge cases for NFC."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from silvia_spark.functions.curation_extras import min_label_components


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")


def _clusters(spark, edges) -> dict[int, int]:
    rows = min_label_components(_pairs(spark, edges)).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_cc_transitive_chain_merges(spark):
    """A~B, B~C without an A~C edge must still be ONE cluster — the case
    where cluster dedup differs from pair listing."""
    got = _clusters(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_long_chain_needs_multiple_rounds(spark):
    """A 6-node path: the min label must propagate hop by hop (≥ 5
    propagation rounds), proving the loop iterates past round one."""
    chain = [(i, i + 1) for i in range(10, 15)]
    got = _clusters(spark, chain)
    assert got == {i: 10 for i in range(10, 16)}


def test_cc_separate_components_stay_separate(spark):
    got = _clusters(spark, [(1, 2), (5, 6), (6, 7)])
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5}


def test_cc_nonconvergence_raises_not_truncates(spark):
    """max_iters too small for the diameter must raise — never return
    half-propagated (wrong) labels."""
    chain = [(i, i + 1) for i in range(6)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        min_label_components(_pairs(spark, chain), max_iters=2).collect()


def test_nfc_udf_matches_duckdb_on_edge_cases(spark):
    """Python unicodedata NFC vs DuckDB utf8proc on hand-picked cases:
    combining acute, already-composed input (idempotence), Hangul jamo
    composition, and a non-composing combining mark. Explicit escapes
    throughout — literal non-ASCII in test source could itself be
    normalized by tooling."""
    import duckdb

    cases = [
        "caf\u0065\u0301",        # e + combining acute -> e-acute
        "caf\u00e9",               # already NFC: unchanged
        "\u1100\u1161\u11a8",      # Hangul jamo -> one syllable block
        "x\u0328q",                # ogonek on x: no precomposed form
    ]
    py = [unicodedata.normalize("NFC", c) for c in cases]
    assert py[0] == "caf\u00e9" and py[1] == "caf\u00e9"
    assert py[2] == "\uac01"
    assert py[3] == "x\u0328q"  # NFC must NOT drop the mark
    con = duckdb.connect()
    duck = [con.execute("SELECT nfc_normalize(?)", [c]).fetchone()[0]
            for c in cases]
    con.close()
    assert py == duck
    # and the Arrow-batched kernel path agrees with plain Python
    sdf = spark.createDataFrame([(c,) for c in cases], "raw STRING")

    @F.pandas_udf("string")
    def nfc(s):
        import unicodedata as ud

        return s.map(lambda x: None if x is None else ud.normalize("NFC", x))

    got = [r.n for r in sdf.select(nfc("raw").alias("n")).collect()]
    assert got == py


def test_cc_pointer_jump_handles_long_chain(spark):
    """A 60-node path has diameter 59 — plain propagation cannot finish
    inside the 20-round bound, pointer jumping (O(log d) rounds) must.
    This is the adversarial boilerplate-chain shape the jump step exists
    for."""
    chain = [(i, i + 1) for i in range(100, 159)]
    rows = min_label_components(_pairs(spark, chain)).collect()
    assert {r.doc_id: r.cluster_id for r in rows} == {
        i: 100 for i in range(100, 160)}


def test_cc_plain_propagation_blows_bound_on_long_chain(spark):
    """The same 60-node path WITHOUT the jump step must raise, not return
    half-propagated labels — documents why jump=True is the default."""
    chain = [(i, i + 1) for i in range(100, 159)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        min_label_components(_pairs(spark, chain), jump=False).collect()


def test_cc_jump_and_plain_agree_on_mixed_graph(spark):
    """Jump and plain variants are the same fixpoint on a graph of mixed
    shapes (clique + chain + star + singletons-in-pairs)."""
    edges = ([(1, 2), (2, 3), (1, 3),          # triangle
              (10, 11), (11, 12), (12, 13),    # path
              (20, 21), (20, 22), (20, 23),    # star
              (30, 31)])                       # pair
    a = {r.doc_id: r.cluster_id
         for r in min_label_components(_pairs(spark, edges)).collect()}
    b = {r.doc_id: r.cluster_id
         for r in min_label_components(_pairs(spark, edges),
                                       jump=False).collect()}
    assert a == b
    assert a[13] == 10 and a[23] == 20 and a[31] == 30


def test_cc_empty_pair_list_returns_empty(spark):
    """Zero edges must converge immediately to an empty labeling — not
    loop to the round bound and raise (F.sum over zero rows is NULL; the
    convergence test must read that as 'no changes')."""
    assert min_label_components(_pairs(spark, [])).collect() == []


# --- two-phase CC (r06) ------------------------------------------------------

def _two_phase(spark, edges, **kw) -> dict[int, int]:
    from silvia_spark.functions.curation_extras import two_phase_components

    rows = two_phase_components(_pairs(spark, edges), **kw).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_two_phase_matches_propagation_on_mixed_graph(spark):
    """Both phase-2 finishes (single-task union-find AND the forced
    propagation fallback) compute the same fixpoint as the pure
    propagation loop on a mixed-shape graph."""
    edges = ([(1, 2), (2, 3), (1, 3),          # triangle
              (10, 11), (11, 12), (12, 13),    # path
              (20, 21), (20, 22), (20, 23),    # star
              (30, 31)])                       # pair
    want = _clusters(spark, edges)
    assert _two_phase(spark, edges) == want
    # local_finish_max=0 forces the min-label fallback on the star graph
    assert _two_phase(spark, edges, local_finish_max=0) == want


def test_two_phase_handles_60_node_chain_both_paths(spark):
    """The adversarial diameter-59 chain converges through BOTH phase-2
    paths: phase 1 contracts each partition's sub-chain to a star, so the
    fallback loop sees a shallow graph and the 20-round bound holds."""
    chain = [(i, i + 1) for i in range(100, 159)]
    want = {i: 100 for i in range(100, 160)}
    assert _two_phase(spark, chain) == want
    assert _two_phase(spark, chain, local_finish_max=0) == want


def test_two_phase_cluster_sizes(spark):
    """cluster_size is the component cardinality on both finish paths."""
    from silvia_spark.functions.curation_extras import two_phase_components

    edges = [(1, 2), (2, 3), (10, 11)]
    for kw in ({}, {"local_finish_max": 0}):
        rows = two_phase_components(_pairs(spark, edges), **kw).collect()
        sizes = {r.doc_id: r.cluster_size for r in rows}
        assert sizes == {1: 3, 2: 3, 3: 3, 10: 2, 11: 2}


def test_two_phase_empty_pairs(spark):
    assert _two_phase(spark, []) == {}


def test_two_phase_keeps_self_loop_only_nodes(spark):
    """A node whose ONLY incident pair is a self-loop must come back
    labeled with itself (min_label parity) — phase 1's root self-edges
    are what carry it into the reduced graph."""
    edges = [(7, 7), (1, 2)]
    want = {7: 7, 1: 1, 2: 1}
    assert _two_phase(spark, edges) == want
    assert _two_phase(spark, edges, local_finish_max=0) == want
    assert _clusters(spark, edges) == want  # the contract both paths match
