"""Planted-case unit tests for the training_extras kernels — adversarial
micro-inputs the corpus doesn't contain (exact duplicates across the
train/eval split, degenerate repetition, window-boundary docs, rounding
ties at exactly .5). The oracle-parity suite proves corpus agreement;
these prove the kernels' EDGES behave as documented."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from silvia_spark.functions.training_extras import (
    _KNUTH,
    chunk_windows,
    contamination_scan,
    knuth_draw,
    quantize_int8,
    repetition_stats,
    reservoir_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_contamination_flags_planted_duplicate(spark):
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),   # shares a 5-gram
        (2, "one two three four five six"),           # disjoint vocab
    ])
    ev = _docs(spark, [(97, "alpha beta gamma delta epsilon omega")])
    hits = {r.train_doc: r.n_eval_hits
            for r in contamination_scan(train, ev).collect()}
    assert hits == {1: 1}


def test_contamination_counts_distinct_eval_docs(spark):
    train = _docs(spark, [(1, "a b c d e f")])
    ev = _docs(spark, [(97, "a b c d e x"), (194, "z a b c d e")])
    [row] = contamination_scan(train, ev).collect()
    assert (row.train_doc, row.n_eval_hits) == (1, 2)


def test_repetition_counts_degenerate_and_distinct(spark):
    d = _docs(spark, [
        (1, "a a a a a"),        # 4 bigrams, 1 distinct
        (2, "a b c d e"),        # 4 bigrams, 4 distinct
        (3, "solo"),             # < 2 tokens: excluded
    ])
    rows = {r.doc_id: (r.total_ngrams, r.distinct_ngrams)
            for r in repetition_stats(d, 2).collect()}
    assert rows == {1: (4, 1), 2: (4, 4)}


def test_chunk_windows_boundaries_and_md5(spark):
    toks = [f"t{i}" for i in range(65)]  # one past a full window
    d = _docs(spark, [(7, " ".join(toks))])
    rows = sorted(chunk_windows(d, chunk=64, stride=48).collect(),
                  key=lambda r: r.chunk_idx)
    assert [(r.chunk_start, r.chunk_tokens) for r in rows] == [(0, 64),
                                                               (48, 17)]
    # content pin: md5 of the exact joined token slice
    for r in rows:
        expect = hashlib.md5(
            " ".join(toks[r.chunk_start:r.chunk_start + 64]).encode()
        ).hexdigest()
        assert r.chunk_md5 == expect


def test_quantize_checksum_half_tie_rounds_up(spark):
    # scale = 127/127 = 1.0; -2.54 → floor(-2.04) = -3 (the half-up
    # formula rounds -2.5-ish cases away from the naive truncation),
    # 63.5 → floor(64.0) = 64: an exact .5 tie goes UP in both engines.
    d = spark.createDataFrame([(1, [127.0, -2.54, 63.5])],
                              "vec_id bigint, embedding array<float>")
    [row] = quantize_int8(d).collect()
    assert row.n_dims == 3 and row.scale == 1.0
    assert row.checksum == 127 * 1 + (-3) * 2 + 64 * 3


def test_reservoir_picks_k_smallest_hashes(spark):
    d = spark.createDataFrame(
        [(i, "g") for i in range(20)], "doc_id bigint, source string")
    got = [r.doc_id for r in reservoir_sample(
        d, "source", "doc_id", 3).orderBy("rn").collect()]
    expect = sorted(range(20),
                    key=lambda i: ((i * _KNUTH) % 4_294_967_296, i))[:3]
    assert got == expect


def test_knuth_draw_matches_python(spark):
    df = spark.range(100).select(
        F.col("id"), knuth_draw("id", 1000).alias("d"))
    for r in df.collect():
        assert r.d == (r.id * _KNUTH) % 1000
