"""Partition-spec evolution (L26): metadata-only spec change, correct
mixed-spec reads (batch + streaming), pruning across generations, the
merge/delete refusal, compaction as migration, and time travel."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from silvia_spark.operators.manifest_table import (
    commit_append, commit_compaction, commit_delete, commit_merge,
    create_table, current_version, load_manifest, read_change_feed,
    read_snapshot, set_partition_column)
from silvia_spark.sources.manifest_stream import read_stream_table

ROWS = [Row(k=i, a=("x" if i % 2 else "y"), b=("p" if i % 3 else "q"),
            v=float(i)) for i in range(1, 13)]


def _mk(spark, tmp_path, **kw):
    root = os.path.join(str(tmp_path), "tbl")
    df = spark.createDataFrame(ROWS)
    create_table(df.select("k", "v", "a", "b"), root, "a",
                 stats_cols=["k"], **kw)
    return root


def _vals(df):
    return sorted((r["k"], r["a"], r["b"], r["v"]) for r in df.collect())


EXPECT = sorted((r.k, r.a, r.b, r.v) for r in ROWS)


def test_evolution_is_metadata_only_and_reads_stay_correct(spark,
                                                           tmp_path):
    root = _mk(spark, tmp_path)
    before = {e["path"] for e in load_manifest(root)["files"]}
    v = set_partition_column(root, "b")
    after = {e["path"] for e in load_manifest(root)["files"]}
    assert before == after  # zero data movement
    assert load_manifest(root)["part_col"] == "b"
    assert _vals(read_snapshot(spark, root)) == EXPECT
    # time travel: the pre-evolution snapshot still reads under spec a
    assert load_manifest(root, v - 1)["part_col"] == "a"
    assert _vals(read_snapshot(spark, root, version=v - 1)) == EXPECT


def test_appends_after_evolution_use_new_spec(spark, tmp_path):
    root = _mk(spark, tmp_path)
    set_partition_column(root, "b")
    commit_append(spark, root,
                  spark.createDataFrame([Row(k=100, v=1.5, a="x",
                                             b="p")]), "b")
    m = load_manifest(root)
    new = [e for e in m["files"] if "part-" in e["path"]
           and e["path"].startswith("b=")]
    assert new and all(e["partition"] in ("p", "q") for e in new)
    assert _vals(read_snapshot(spark, root)) == sorted(
        EXPECT + [(100, "x", "p", 1.5)])
    # the OLD spec column now refuses at append time
    with pytest.raises(ValueError, match="current spec"):
        commit_append(spark, root,
                      spark.createDataFrame([Row(k=101, v=1.0, a="x",
                                                 b="q")]), "a")


def test_stats_pruning_spans_both_generations(spark, tmp_path):
    root = _mk(spark, tmp_path)
    set_partition_column(root, "b")
    commit_append(spark, root,
                  spark.createDataFrame([Row(k=100, v=1.5, a="x",
                                             b="p")]), "b")
    got = read_snapshot(spark, root, prune={"k": (100, None)})
    assert _vals(got.where("k >= 100")) == [(100, "x", "p", 1.5)]


def test_merge_delete_refuse_until_migrated(spark, tmp_path):
    root = _mk(spark, tmp_path)
    set_partition_column(root, "b")
    with pytest.raises(ValueError, match="multiple partition specs"):
        commit_merge(spark, root,
                     spark.createDataFrame([Row(k=3, b="p", a="x",
                                                v=0.0, op="U")]),
                     ["k", "b"], "b")
    with pytest.raises(ValueError, match="multiple partition specs"):
        commit_delete(spark, root,
                      spark.createDataFrame([Row(k=3, b="p")]),
                      ["k", "b"], "b")
    # compaction migrates everything under the new spec...
    commit_compaction(spark, root, "b")
    assert all(e["path"].startswith("b=")
               for e in load_manifest(root)["files"])
    assert _vals(read_snapshot(spark, root)) == EXPECT
    # ...and merge/delete work again (k=3 lives in partition p: 3%3=0
    # -> b='q'? no: 3 % 3 == 0 -> 'q')
    key = [r for r in ROWS if r.k == 3][0]
    commit_merge(spark, root,
                 spark.createDataFrame([Row(k=3, b=key.b, a=key.a,
                                            v=77.0, op="U")]),
                 ["k", "b"], "b")
    assert _vals(read_snapshot(spark, root).where("k = 3")) == [
        (3, key.a, key.b, 77.0)]
    # compaction under the OLD column name refuses too
    with pytest.raises(ValueError, match="current spec"):
        commit_compaction(spark, root, "a")


def test_streaming_source_reads_across_specs(spark, tmp_path):
    root = _mk(spark, tmp_path)
    set_partition_column(root, "b")
    commit_append(spark, root,
                  spark.createDataFrame([Row(k=100, v=1.5, a="x",
                                             b="p")]), "b")
    name = "m" + uuid.uuid4().hex[:10]
    q = (read_stream_table(spark, root)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", tempfile.mkdtemp())
         .trigger(availableNow=True).start())
    q.awaitTermination(200)
    assert _vals(spark.table(name)) == sorted(
        EXPECT + [(100, "x", "p", 1.5)])


def test_cdf_feed_crosses_evolution(spark, tmp_path):
    root = _mk(spark, tmp_path, cdf=True)
    v_ev = set_partition_column(root, "b")
    commit_append(spark, root,
                  spark.createDataFrame([Row(k=100, v=1.5, a="x",
                                             b="p")]), "b")
    feed = read_change_feed(spark, root, 0)
    assert feed.where("_change_type = 'insert'").count() == 13
    assert feed.where(
        f"_commit_version = {v_ev}").count() == 0  # metadata: silent


def test_evolution_validation(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already the partition"):
        set_partition_column(root, "a")
    with pytest.raises(ValueError, match="no column"):
        set_partition_column(root, "zzz")
    # evolving BACK to the original column after migration works
    set_partition_column(root, "b")
    commit_compaction(spark, root, "b")
    set_partition_column(root, "a")
    commit_compaction(spark, root, "a")
    assert all(e["path"].startswith("a=")
               for e in load_manifest(root)["files"])
    assert _vals(read_snapshot(spark, root)) == EXPECT
    assert current_version(root) >= 5
