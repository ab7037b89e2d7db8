"""Shallow clone (L31): zero-copy creation, independent divergence in
both directions, DV interplay, compaction localization, streaming over
a clone, clone-of-clone, and the documented source-vacuum hazard."""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from silvia_spark.operators.manifest_table import (
    clone_table, commit_append, commit_compaction, commit_delete,
    create_table, current_version, load_manifest, read_change_feed,
    read_snapshot, set_partition_column, table_history, vacuum)
from silvia_spark.sources.manifest_stream import read_stream_table


def _mk(spark, tmp_path, name="src", **kw):
    root = os.path.join(str(tmp_path), name)
    df = spark.createDataFrame(
        [Row(k=i, part=("a" if i % 2 else "b"), v=float(i))
         for i in range(1, 11)])
    create_table(df.select("k", "v", "part"), root, "part",
                 stats_cols=["k"], **kw)
    return root


def test_clone_is_zero_copy_and_divergence_is_two_way(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    clone_table(src, dst)
    assert all("base" in e for e in load_manifest(dst)["files"])
    assert sorted(r["k"] for r in
                  read_snapshot(spark, dst).collect()) == list(
        range(1, 11))
    # source-side commit after the clone: the clone must NOT see it
    commit_append(spark, src,
                  spark.createDataFrame([Row(k=50, v=5.0, part="a")]),
                  "part")
    assert read_snapshot(spark, dst).where("k = 50").count() == 0
    # clone-side delete: the source must not see it
    commit_delete(spark, dst,
                  spark.createDataFrame([Row(k=3, part="a")]),
                  ["k", "part"], "part")
    assert read_snapshot(spark, src).where("k = 3").count() == 1
    assert read_snapshot(spark, dst).where("k = 3").count() == 0
    assert [h["op"] for h in table_history(dst)] == ["delete", "clone"]


def test_clone_dv_folds_source_vector_into_owned_one(spark, tmp_path):
    # one file per partition (5 rows each) + a high dv_max_frac, so a
    # 1-row delete stays under the density crossover and records a
    # VECTOR — tiny multi-file fixtures always rewrite instead
    src = os.path.join(str(tmp_path), "src")
    df = spark.createDataFrame(
        [Row(k=i, part=("a" if i % 2 else "b"), v=float(i))
         for i in range(1, 11)]).coalesce(1)
    create_table(df.select("k", "v", "part"), src, "part",
                 stats_cols=["k"])
    commit_delete(spark, src,
                  spark.createDataFrame([Row(k=4, part="b")]),
                  ["k", "part"], "part", dv_max_frac=0.95)
    dst = os.path.join(str(tmp_path), "dst")
    clone_table(src, dst)
    assert read_snapshot(spark, dst).where("k = 4").count() == 0
    # a clone-side delete on the SAME file unions the source's
    # tombstones into an owned vector (dv_base dropped)
    commit_delete(spark, dst,
                  spark.createDataFrame([Row(k=6, part="b")]),
                  ["k", "part"], "part", dv_max_frac=0.95)
    got = sorted(r["k"] for r in read_snapshot(spark, dst).collect())
    assert got == [1, 2, 3, 5, 7, 8, 9, 10]
    dvd = [e for e in load_manifest(dst)["files"] if e.get("dv")]
    assert dvd and all("dv_base" not in e for e in dvd)
    # source still sees only ITS delete
    assert read_snapshot(spark, src).where("k = 6").count() == 1


def test_compaction_localizes_the_clone(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = os.path.join(str(tmp_path), "dst")
    clone_table(src, dst)
    commit_compaction(spark, dst, "part")
    assert all("base" not in e for e in load_manifest(dst)["files"])
    # fully independent now: vacuuming the source away is harmless
    import shutil

    shutil.rmtree(src)
    assert sorted(r["k"] for r in
                  read_snapshot(spark, dst).collect()) == list(
        range(1, 11))


def test_streaming_source_reads_a_clone(spark, tmp_path):
    src = _mk(spark, tmp_path)
    commit_delete(spark, src,
                  spark.createDataFrame([Row(k=2, part="b")]),
                  ["k", "part"], "part")
    dst = os.path.join(str(tmp_path), "dst")
    clone_table(src, dst)
    name = "m" + uuid.uuid4().hex[:10]
    q = (read_stream_table(spark, dst)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", tempfile.mkdtemp())
         .trigger(availableNow=True).start())
    q.awaitTermination(200)
    assert sorted(r["k"] for r in spark.table(name).collect()) == [
        1, 3, 4, 5, 6, 7, 8, 9, 10]


def test_clone_of_clone_points_at_ultimate_owner(spark, tmp_path):
    src = _mk(spark, tmp_path)
    d1 = os.path.join(str(tmp_path), "d1")
    d2 = os.path.join(str(tmp_path), "d2")
    clone_table(src, d1)
    clone_table(d1, d2)
    bases = {e["base"] for e in load_manifest(d2)["files"]}
    assert bases == {src}, bases
    assert read_snapshot(spark, d2).count() == 10


def test_clone_carries_meta_and_refuses_mixed_specs(spark, tmp_path):
    src = _mk(spark, tmp_path, cdf=True)
    from silvia_spark.operators.manifest_table import (
        add_check_constraint)

    add_check_constraint(spark, src, "v_pos", "v > 0")
    dst = os.path.join(str(tmp_path), "dst")
    clone_table(src, dst)
    m = load_manifest(dst)
    assert m["constraints"] == {"v_pos": "v > 0"}
    assert m.get("cdf_enabled") is True
    feed = read_change_feed(spark, dst, 0)
    assert feed.where("_change_type = 'insert'").count() == 10
    # mixed-spec source refuses
    src2 = _mk(spark, tmp_path, name="src2")
    set_partition_column(src2, "k")
    with pytest.raises(ValueError, match="multiple partition specs"):
        clone_table(src2, os.path.join(str(tmp_path), "dst2"))
