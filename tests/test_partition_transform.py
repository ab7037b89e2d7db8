"""Hidden partitioning / partition transforms (L29): the python/Spark
derivation parity that pruning correctness rides on, directory
skipping per transform kind, hidden-column discipline on every read
path, source-named commits, and evolution to/from transforms."""

from __future__ import annotations

import datetime
import os
import tempfile
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from silvia_spark.operators.manifest_table import (
    _make_transform, _transform_expr, _transform_value, commit_append,
    commit_compaction, commit_delete, commit_merge, create_table,
    load_manifest, read_change_feed, read_snapshot,
    set_partition_column)

TS = [Row(k=i, ts=datetime.datetime(2024, 1, 1 + i % 5, 3, 0, 0),
          s=f"w{i % 7:02d}x", v=float(i)) for i in range(1, 21)]


def _mk(spark, tmp_path, **kw):
    root = os.path.join(str(tmp_path), "tbl")
    create_table(spark.createDataFrame(TS), root, kw.pop("src", "ts"),
                 **kw)
    return root


def test_spark_python_derivation_parity(spark):
    """The prune bounds are computed in PYTHON from the same transform
    the STAGING derives in Spark — any drift silently mis-prunes, so
    pin value-level equality for every kind."""
    rows = spark.createDataFrame(TS)
    for kind, n, col, vals in [
        ("days", None, "ts", [r.ts for r in TS]),
        ("bucket", 16, "k", [r.k for r in TS]),
        ("bucket", 4, "s", [r.s for r in TS]),
        ("truncate", 2, "s", [r.s for r in TS]),
    ]:
        pt = _make_transform(kind, col, n, [f for f in rows.columns])
        got = [r["d"] for r in rows.select(
            _transform_expr(pt).alias("d")).collect()]
        exp = [_transform_value(pt, v) for v in vals]
        assert got == exp, (kind, got[:3], exp[:3])


def test_bucket_transform_prunes_equality_only(spark, tmp_path):
    root = _mk(spark, tmp_path, src="k", transform="bucket",
               transform_n=4)
    m = load_manifest(root)
    assert sorted({e["partition"] for e in m["files"]}) <= [
        "0", "1", "2", "3"]
    # equality prune opens only the key's bucket
    got = read_snapshot(spark, root, prune={"k": (7, 7)})
    opened = got.select(F.input_file_name()).distinct().count()
    assert opened < len(m["files"])
    assert [r["v"] for r in got.where("k = 7").collect()] == [7.0]
    # range prune abstains (bucket is not monotone): full scan, still
    # correct
    rng = read_snapshot(spark, root, prune={"k": (1, 20)})
    assert rng.count() == 20


def test_truncate_transform_prefix_range(spark, tmp_path):
    root = _mk(spark, tmp_path, src="s", transform="truncate",
               transform_n=2)
    m = load_manifest(root)
    assert {e["partition"] for e in m["files"]} == {"w0"}
    got = read_snapshot(spark, root, prune={"s": ("w00", "w03")})
    assert got.count() == 20  # one shared prefix: nothing to skip, all kept


def test_hidden_column_never_surfaces_anywhere(spark, tmp_path):
    root = _mk(spark, tmp_path, transform="days", cdf=True)
    assert read_snapshot(spark, root).columns == ["k", "ts", "s", "v"]
    commit_delete(spark, root,
                  spark.createDataFrame([Row(k=3, ts=TS[2].ts)]),
                  ["k", "ts"], "ts")
    feed = read_change_feed(spark, root, 0)
    assert feed.columns == ["k", "ts", "s", "v", "_change_type",
                            "_commit_version"]
    assert feed.where("_change_type = 'delete'").collect()[0]["k"] == 3
    # time travel hides it too
    assert read_snapshot(spark, root,
                         version=1).columns == ["k", "ts", "s", "v"]


def test_commits_name_the_source_column(spark, tmp_path):
    root = _mk(spark, tmp_path, transform="days")
    with pytest.raises(ValueError, match="hidden days transform"):
        commit_append(spark, root,
                      spark.createDataFrame(
                          [Row(k=50, ts=TS[0].ts, s="aa", v=1.0)]),
                      "p_days_ts")
    commit_append(spark, root,
                  spark.createDataFrame(
                      [Row(k=50, ts=TS[0].ts, s="aa", v=1.0)]), "ts")
    m = load_manifest(root)
    assert all(e["path"].startswith("p_days_ts=") for e in m["files"])
    commit_merge(spark, root,
                 spark.createDataFrame(
                     [Row(k=50, ts=TS[0].ts, s="aa", v=2.0, op="U")]),
                 ["k", "ts"], "ts")
    assert read_snapshot(spark, root).where(
        "k = 50").collect()[0]["v"] == 2.0
    commit_compaction(spark, root, "ts")
    assert read_snapshot(spark, root).count() == 21


def test_evolve_to_and_from_transform(spark, tmp_path):
    root = _mk(spark, tmp_path, src="s")  # plain spec on s
    set_partition_column(root, "ts", transform="days")
    commit_append(spark, root,
                  spark.createDataFrame(
                      [Row(k=60, ts=TS[1].ts, s="zz", v=6.0)]), "ts")
    fresh = [e["path"] for e in load_manifest(root)["files"]
             if e["path"].startswith("p_days_ts=")]
    assert fresh
    assert sorted(r["k"] for r in
                  read_snapshot(spark, root).collect()) == sorted(
        [r.k for r in TS] + [60])
    commit_compaction(spark, root, "ts")  # migrate everything
    assert all(e["path"].startswith("p_days_ts=")
               for e in load_manifest(root)["files"])
    # and back to a plain column
    set_partition_column(root, "s")
    commit_compaction(spark, root, "s")
    assert all(e["path"].startswith("s=")
               for e in load_manifest(root)["files"])
    assert read_snapshot(spark, root).count() == 21


def test_null_source_goes_to_default_partition_and_range_skips_it(
        spark, tmp_path):
    rows = TS + [Row(k=99, ts=None, s="nn", v=9.0)]
    root = os.path.join(str(tmp_path), "tbl")
    create_table(spark.createDataFrame(rows), root, "ts",
                 transform="days")
    m = load_manifest(root)
    assert any(e["partition"] == "__HIVE_DEFAULT_PARTITION__"
               for e in m["files"])
    lo = datetime.datetime(2024, 1, 1)
    hi = datetime.datetime(2024, 1, 9)
    got = read_snapshot(spark, root, prune={"ts": (lo, hi)})
    # a range predicate excludes NULL rows anyway; the prune may skip
    # the NULL partition, and the residual filter stays correct
    assert got.where(F.col("ts").isNotNull()).count() == 20


def test_clustered_compaction_zorder_two_dims(spark, tmp_path):
    """OPTIMIZE ZORDER: after a 2-column Morton clustering, narrow
    prunes on EITHER column open fewer files than the unclustered
    layout (a plain sort would only serve its leading column)."""
    from silvia_spark.operators.manifest_table import (
        commit_compaction as cc, create_table as ct,
        read_snapshot as rs)

    rows = [Row(k=i, j=(i * 37) % 100, part="a", v=float(i))
            for i in range(1, 201)]
    root = os.path.join(str(tmp_path), "tblz")
    ct(spark.createDataFrame(rows).repartition(8), root, "part",
       stats_cols=["k", "j"])

    def opened(prune):
        return (rs(spark, root, prune=prune)
                .select(F.input_file_name()).distinct().count())

    b_k, b_j = opened({"k": (1, 20)}), opened({"j": (0, 10)})
    cc(spark, root, "part", target_files=4, order_by=["k", "j"],
       zorder=True)
    a_k, a_j = opened({"k": (1, 20)}), opened({"j": (0, 10)})
    assert a_k < b_k and a_j < b_j, (b_k, a_k, b_j, a_j)
    assert rs(spark, root).count() == 200
    # content identical through the clustering rewrite
    got = sorted((r["k"], r["j"], r["v"]) for r in
                 rs(spark, root).collect())
    assert got == sorted((r.k, r.j, r.v) for r in rows)


def test_truncate_int_source_abstains_not_empty(spark, tmp_path):
    """r12 ADVICE regression: truncate on a NON-string source must
    ABSTAIN from pruning, not prune through stringified numerics —
    truncate(1) of ints 9..12 gives dlo='9' > dhi='1', which pruned
    EVERY partition and silently dropped rows 9..12."""
    root = os.path.join(str(tmp_path), "tbl")
    rows = spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(1, 21)])
    create_table(rows, root, "k", transform="truncate", transform_n=1)
    got = read_snapshot(spark, root, prune={"k": (9, 12)})
    assert sorted(r["k"] for r in
                  got.where("k between 9 and 12").collect()) == \
        [9, 10, 11, 12]
    # negative bounds abstain too
    neg = read_snapshot(spark, root, prune={"k": (-5, 3)})
    assert sorted(r["k"] for r in
                  neg.where("k <= 3").collect()) == [1, 2, 3]
    # string sources still prune (lexicographic monotone is real there)
    assert _transform_value({"kind": "truncate", "n": 2,
                             "source": "s"}, "w03x") == "w0"
    assert _transform_value({"kind": "truncate", "n": 1,
                             "source": "k"}, 9) is None


def test_bucket_bool_source_abstains(spark, tmp_path):
    """r12 ADVICE regression: Python str(True)='True' but Spark casts
    bool to 'true' — the crc32 bucket computed for pruning differed
    from the staged one, so an equality prune skipped the wrong
    bucket. Bool must abstain like float does."""
    pt = {"kind": "bucket", "n": 4, "source": "flag"}
    assert _transform_value(pt, True) is None
    assert _transform_value(pt, False) is None
    root = os.path.join(str(tmp_path), "tbl")
    rows = spark.createDataFrame(
        [Row(k=i, flag=bool(i % 2), v=float(i)) for i in range(1, 11)])
    create_table(rows, root, "flag", transform="bucket", transform_n=2)
    got = read_snapshot(spark, root, prune={"flag": (True, True)})
    assert sorted(r["k"] for r in got.where("flag").collect()) == \
        [1, 3, 5, 7, 9]


def test_mixed_spec_transform_prune_keeps_old_spec_files(spark,
                                                         tmp_path):
    """r12 ADVICE regression (data-losing): after evolving to a days
    transform, OLD-spec files' partition values live in a different
    column's domain ('w00x'), and comparing them lexicographically
    against transformed bounds ('2024-01-03') pruned them out of
    range reads entirely. Old-spec groups must always be kept; the
    residual row filter stays in charge."""
    root = _mk(spark, tmp_path)  # partitioned by s ('w00x'...)
    set_partition_column(root, "ts", transform="days")
    commit_append(spark, root, spark.createDataFrame(
        [Row(k=100 + i,
             ts=datetime.datetime(2024, 1, 1 + i, 12, 0, 0),
             s="zz", v=100.0 + i) for i in range(3)]), "ts")
    lo = datetime.datetime(2024, 1, 1)
    hi = datetime.datetime(2024, 1, 2, 23, 59, 59)
    got = read_snapshot(spark, root, prune={"ts": (lo, hi)})
    want = sorted([r.k for r in TS
                   if lo <= r.ts <= hi] + [100, 101])
    assert sorted(r["k"] for r in got.where(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
        .collect()) == want
    # and the new-spec side still actually prunes directories
    m = load_manifest(root)
    new_spec = [e for e in m["files"] if e["path"].startswith("p_days")]
    assert new_spec, "expected post-evolution files under the transform"
