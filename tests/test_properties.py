"""Property-based spot checks (SURVEY.md §5.2.4) — hypothesis-generated
small frames, algebraic invariants that must hold for ANY input, not just
the corpus. Each example is a real Spark job, so example counts are kept
small and deadlines disabled; the draw space still covers empties,
single groups, duplicates, and negative values every run."""

from __future__ import annotations

import hashlib

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from silvia_spark.functions.training_extras import chunk_windows
from tests.conftest import SF_SMALL

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


# --- r05 operator invariants (M19, M20, J35, J36) ----------------------------

def test_funnel_stages_monotone(spark):
    """Each funnel stage can only lose users: n_view ≥ n_click_after_view
    ≥ n_purchase_after_click — violated only if an anchor chain compared
    timestamps the wrong way."""
    from silvia_spark import registry
    registry.load_all_modules()
    r = registry.QUERIES["events_funnel_conversion"](
        spark, SF_SMALL).collect()[0]
    assert r.n_view >= r.n_click_after_view >= r.n_purchase_after_click
    assert r.n_view > 0


def test_attribution_bounded_by_purchases(spark):
    """Total attributed conversions ≤ total purchases (each purchase
    credits at most one touch), and no touch type is 'purchase'."""
    from silvia_spark import registry
    from silvia_spark.io import load_table
    registry.load_all_modules()
    rows = registry.QUERIES["events_attribution_touch"](
        spark, SF_SMALL).collect()
    purchases = (load_table(spark, SF_SMALL, "events")
                 .where(F.col("event_type") == "purchase").count())
    assert sum(r.attributed for r in rows) <= purchases
    assert all(r.touch_type != "purchase" for r in rows)


def test_keep_best_never_removes_both_sides_of_isolated_pair(spark):
    """For a pair with no other near-dup edges, exactly one side may be
    removed — keep-best must keep a survivor per isolated pair."""
    from silvia_spark import registry
    from silvia_spark.functions.training_ops import jaccard_pairs
    from silvia_spark.io import load_table
    registry.load_all_modules()
    sf = "/root/testdata/sf0.01"
    removed = {r.doc_id for r in registry.QUERIES["dedup_near_keep_best"](
        spark, sf).collect()}
    d = load_table(spark, sf, "documents")
    pairs = [(r.doc_a, r.doc_b)
             for r in jaccard_pairs(d.select("doc_id", "text"),
                                    0.8).collect()]
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for a, b in pairs:
        if deg[a] == 1 and deg[b] == 1:     # isolated pair
            assert not (a in removed and b in removed), (a, b)
        assert a in removed or b in removed, (a, b)  # every pair resolved


def test_norm_stats_bounds(spark):
    """min ≤ max per label, and every corpus label is profiled."""
    from silvia_spark import registry
    from silvia_spark.io import load_table
    registry.load_all_modules()
    sf = SF_SMALL
    rows = registry.QUERIES["embed_norm_stats"](spark, sf).collect()
    labels = {r.label for r in
              load_table(spark, sf, "embeddings").select("label")
              .distinct().collect()}
    assert {r.label for r in rows} == labels
    for r in rows:
        assert 0 <= r.min_norm <= r.max_norm
        assert r.n_vecs > 0


def test_multiprobe_equals_base_lsh_output(spark):
    """Both LSH contracts achieve recall 1 on the corpus, so their outputs
    must be identical row sets — a cross-check that ties the 24-table
    multiprobe variant to the 64-table base beyond the shared oracle."""
    from silvia_spark import registry
    registry.load_all_modules()
    sf = SF_SMALL
    base = {(r.vec_a, r.vec_b, r.cos_sim) for r in
            registry.QUERIES["sim_ann_lsh"](spark, sf).collect()}
    multi = {(r.vec_a, r.vec_b, r.cos_sim) for r in
             registry.QUERIES["sim_ann_lsh_multiprobe"](spark, sf).collect()}
    multi2 = {(r.vec_a, r.vec_b, r.cos_sim) for r in
              registry.QUERIES["sim_ann_lsh_multiprobe2"](spark,
                                                          sf).collect()}
    assert base == multi == multi2 and len(base) > 0


def test_funnel_rejects_out_of_order_clicks(spark, tmp_path):
    """Planted micro-case for M19's ordering semantics: a user whose only
    click PRECEDES their first view reaches the view stage but must NOT
    count as click-after-view; a correctly ordered user must."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from silvia_spark import registry
    registry.load_all_modules()
    us = 1_700_000_000_000_000  # µs epoch base
    rows = [
        # user 1: click at t0, view at t1 — out of order, no conversion
        (1, 1, "click", us), (2, 1, "view", us + 60_000_000),
        # user 2: view t0, click t1, purchase t2 — full funnel
        (3, 2, "view", us), (4, 2, "click", us + 60_000_000),
        (5, 2, "purchase", us + 120_000_000),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k":1}'] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    r = registry.QUERIES["events_funnel_conversion"](
        spark, str(tmp_path)).collect()[0]
    assert (r.n_view, r.n_click_after_view, r.n_purchase_after_click) \
        == (2, 1, 1)


# --- r06 kernels: randomized cross-checks ------------------------------------

def _ref_components(edges):
    """Pure-Python reference union-find: node -> component min."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


_edges = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=40).map(
        lambda es: [(a, b) for a, b in es if a != b]).filter(len)


@given(edges=_edges)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_two_phase_cc_matches_reference_union_find(spark, edges):
    """Random graphs (not just planted shapes): the distributed two-phase
    CC must agree with a sequential union-find on every label — both
    phase-2 finishes."""
    from silvia_spark.functions.curation_extras import two_phase_components

    want = _ref_components(edges)
    df = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    got = {r.doc_id: r.cluster_id
           for r in two_phase_components(df).collect()}
    assert got == want
    got_fb = {r.doc_id: r.cluster_id
              for r in two_phase_components(df, local_finish_max=0)
              .collect()}
    assert got_fb == want


_ivals = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2000),
              st.integers(min_value=1, max_value=400)),
    min_size=1, max_size=25)


@given(a=_ivals, b=_ivals)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_banded_interval_overlap_matches_bruteforce(spark, a, b):
    """Random interval sets: the L9 banding (replicate to spanned bands +
    attribution-band emission) must equal the quadratic cross filter
    exactly — no missed pair (band coverage), no double pair
    (attribution uniqueness). Band width 100 is DELIBERATELY smaller
    than the max interval length 400, so intervals span up to 5 bands
    and the exactly-once argument is stressed where it is weakest."""
    width = 100
    aa = [(i, s, s + d) for i, (s, d) in enumerate(a)]
    bb = [(i, s, s + d) for i, (s, d) in enumerate(b)]
    want = sorted((ia, ib, min(ea, eb) - max(sa, sb))
                  for ia, sa, ea in aa for ib, sb, eb in bb
                  if sa <= eb and sb <= ea)
    da = spark.createDataFrame(aa, "a_id BIGINT, sa BIGINT, ea BIGINT")
    db = spark.createDataFrame(bb, "b_id BIGINT, sb BIGINT, eb BIGINT")
    w = F.lit(width)
    ab = da.withColumn("band", F.explode(
        F.sequence(F.floor(F.col("sa") / w), F.floor(F.col("ea") / w))))
    bbd = db.withColumn("band", F.explode(
        F.sequence(F.floor(F.col("sb") / w), F.floor(F.col("eb") / w))))
    sm = F.greatest("sa", "sb")
    got = sorted(
        (r.a_id, r.b_id, r.ov) for r in
        ab.join(bbd, "band")
        .where((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea"))
               & (F.col("band") == F.floor(sm / w)))
        .select("a_id", "b_id", (F.least("ea", "eb") - sm).alias("ov"))
        .collect())
    assert got == want


def test_enrichment_family_conserves_rows(spark):
    """M21/M22/M23 all enrich-then-rollup: the rollup's event/order totals
    must equal the input cardinality exactly — a gap in the geo ranges,
    the rate grid, or a classification chain would silently drop rows,
    the accounting bug the docstrings warn about."""
    from silvia_spark import registry
    from silvia_spark.io import load_table
    registry.load_all_modules()
    sf = SF_SMALL
    n_events = load_table(spark, sf, "events").count()
    n_orders = load_table(spark, sf, "orders").count()
    ua = registry.QUERIES["etl_ua_referer_enrich"](spark, sf).collect()
    assert sum(r.n_events for r in ua) == n_events
    geo = registry.QUERIES["etl_ip_geo_range"](spark, sf).collect()
    assert sum(r.n_events for r in geo) == n_events
    fx = registry.QUERIES["etl_currency_convert"](spark, sf).collect()
    assert sum(r.n_orders for r in fx) == n_orders
    # the geo plant's gaps must actually exercise the miss path
    assert any(r.country == "unknown" for r in geo)


# --- r07: merge_keyed replay vs dict reference --------------------------------

_parts = st.lists(st.sampled_from(["p1", "p 2", "p%3"]),
                  min_size=1, max_size=3, unique=True)
_merge_case = st.tuples(
    # base rows: (key, partition index, value)
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 2),
                       st.integers(-5, 5)),
             min_size=1, max_size=12),
    # ops: (key, partition index, op, value)
    st.lists(st.tuples(st.integers(0, 14), st.integers(0, 2),
                       st.sampled_from(["U", "D", "I"]), st.integers(-5, 5)),
             min_size=1, max_size=8),
    _parts)


@pytest.mark.full  # CI-mode only (suite-time budget): the default run
# keeps the planted merge row-class + crash-path tests (test_r06_semantics)
@given(case=_merge_case)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_merge_keyed_matches_dict_replay(spark, case, tmp_path_factory):
    """Random base tables and op batches — including partition values that
    need percent-escaping in dir names — through the REAL staged-swap
    merge_keyed, compared against a plain dict replay. Also pins the
    swap hygiene: no stage/trash siblings survive a successful merge."""
    import os

    from silvia_spark.operators.scans import merge_keyed

    raw_base, raw_ops, parts = case
    # de-dup base rows per (key, part): a keyed table has unique keys
    base = {}
    for k, pi, v in raw_base:
        base[(k, parts[pi % len(parts)])] = v
    ops, seen = [], set()
    for k, pi, op, v in raw_ops:
        key = (k, parts[pi % len(parts)])
        if key in seen:
            continue  # one op per key per batch, like a compacted CDC feed
        seen.add(key)
        ops.append((key, op, v))

    want = dict(base)
    for (k, p), op, v in ops:
        if op == "D":
            want.pop((k, p), None)
        else:  # U and I both carry the payload; merge upserts either way
            want[(k, p)] = v
    # documented edge (scans.py merge_keyed): a TOUCHED partition whose
    # merge result is EMPTY emits no staged dir and its previous files
    # stay in place — full partition deletes need an explicit drop
    touched = {p for (k, p), _, _ in ops}
    for p in touched:
        if not any(pp == p for (_, pp) in want):
            for (k, pp), v in base.items():
                if pp == p:
                    want[(k, pp)] = v

    root = tmp_path_factory.mktemp("merge_prop")
    out = str(root / "t")
    spark.createDataFrame(
        [(k, p, float(v)) for (k, p), v in sorted(base.items())],
        "k BIGINT, part STRING, v DOUBLE",
    ).write.partitionBy("part").parquet(out)
    chg = spark.createDataFrame(
        [(k, p, float(v), op) for ((k, p), op, v) in ops],
        "k BIGINT, part STRING, v DOUBLE, op STRING")
    merge_keyed(spark, out, chg, ["k", "part"], "part")

    got = {(r.k, r.part): r.v for r in spark.read.parquet(out).collect()}
    assert got == {kp: float(v) for kp, v in want.items()}
    leftovers = [d for d in os.listdir(root)
                 if ".stage-" in d or ".trash-" in d]
    assert leftovers == []


# --- r07: compaction kernel vs file-count bounds ------------------------------

_compact_case = st.lists(
    st.tuples(st.sampled_from(["a", "b c", "d%e"]), st.integers(0, 500)),
    min_size=1, max_size=6)


@given(case=_compact_case, frag=st.integers(min_value=2, max_value=8))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_compact_partitioned_bounds_and_content(spark, case, frag,
                                                tmp_path_factory):
    """Random partition layouts (values needing escaping included, sizes
    from near-empty to multi-file) through the compaction kernel: file
    counts within the returned targets, content identical, partitions
    already compact treated as no-ops (the kernel's own assertions fire
    on violation — this drives them across layouts the corpus doesn't
    have)."""
    from silvia_spark.operators.scale_patterns import compact_partitioned

    rows = []
    rid = 0
    for p, n in case:
        for _ in range(max(1, n)):
            rows.append((rid, p, float(rid % 7)))
            rid += 1
    root = tmp_path_factory.mktemp("compact_prop")
    src, dst = str(root / "src"), str(root / "dst")
    df = spark.createDataFrame(rows, "id BIGINT, part STRING, v DOUBLE")
    df.repartition(frag).write.partitionBy("part").parquet(src)

    stats = compact_partitioned(spark, src, dst, part_col="part",
                                salt_col="id", target_bytes=4 * 1024)
    for key, (nb, na, tgt) in stats.items():
        assert na <= tgt and na <= nb
    got = sorted((r.id, r.part, r.v)
                 for r in spark.read.parquet(dst).collect())
    assert got == sorted(rows)
