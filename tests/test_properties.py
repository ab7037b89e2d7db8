"""Property-based spot checks (SURVEY.md §5.2.4) — hypothesis-generated
small frames, algebraic invariants that must hold for ANY input, not just
the corpus. Each example is a real Spark job, so example counts are kept
small and deadlines disabled; the draw space still covers empties,
single groups, duplicates, and negative values every run."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from silvia_spark.functions.training_extras import chunk_windows

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

_vals = st.lists(st.integers(min_value=-5, max_value=5), max_size=12)


def _df(spark, xs):
    return spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                                 "id bigint, k bigint")


@given(a=_vals, b=_vals)
@settings(**_SETTINGS)
def test_union_all_count_additivity(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert da.unionAll(db).count() == len(a) + len(b)


@given(a=_vals, b=_vals)
@settings(**_SETTINGS)
def test_outer_join_bounds(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    left = da.join(db.withColumnRenamed("id", "id2"), "k", "left").count()
    inner = da.join(db.withColumnRenamed("id", "id2"), "k", "inner").count()
    # every left row survives; inner rows are a subset of left-join rows
    assert left >= len(a) and left >= inner
    semi = da.join(db, "k", "left_semi").count()
    anti = da.join(db, "k", "left_anti").count()
    assert semi + anti == len(a)


@given(a=_vals)
@settings(**_SETTINGS)
def test_rollup_grand_total_equals_ungrouped(spark, a):
    d = _df(spark, a)
    total = d.agg(F.sum("k")).collect()[0][0]
    grand = (d.rollup("k").agg(F.sum("k").alias("s"))
             .where(F.col("k").isNull()).collect())
    if a:
        assert grand and grand[0].s == total
    else:
        assert total is None


@given(n=st.integers(min_value=1, max_value=130),
       chunk=st.integers(min_value=2, max_value=20),
       stride=st.integers(min_value=1, max_value=20))
@settings(**_SETTINGS)
def test_chunk_windows_matches_python_reference(spark, n, chunk, stride):
    toks = [f"w{i}" for i in range(n)]
    d = spark.createDataFrame([(1, " ".join(toks))],
                              "doc_id bigint, text string")
    rows = sorted(chunk_windows(d, chunk=chunk, stride=stride).collect(),
                  key=lambda r: r.chunk_idx)
    expect = []
    for s in range(0, n, stride):
        piece = " ".join(toks[s:s + chunk])
        expect.append((s // stride, s, min(chunk, n - s),
                       hashlib.md5(piece.encode()).hexdigest()))
    got = [(r.chunk_idx, r.chunk_start, r.chunk_tokens, r.chunk_md5)
           for r in rows]
    assert got == expect
