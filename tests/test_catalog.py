"""Persistent catalog (r13 — r12 verdict #5): durable name→root
bindings, attach-at-session-start registration, pinned-version
policies, and mutation semantics of the catalog file."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row

from silvia_spark.catalog import (attach_catalog, catalog_add,
                                  catalog_list, catalog_remove)
from silvia_spark.operators.manifest_table import (commit_append,
                                                   create_table)


def _mk(spark, tmp_path, name="tbl"):
    root = os.path.join(str(tmp_path), name)
    df = spark.createDataFrame(
        [Row(k=i, part=("a" if i % 2 else "b"), v=float(i))
         for i in range(1, 11)])
    create_table(df.select("k", "v", "part"), root, "part")
    return root


def test_catalog_survives_sessions_and_attaches(spark, tmp_path):
    cat = os.path.join(str(tmp_path), "catalog.json")
    r1 = _mk(spark, tmp_path, "orders_t")
    r2 = _mk(spark, tmp_path, "events_t")
    catalog_add("cat_orders", r1, catalog=cat)
    catalog_add("cat_events", r2, catalog=cat)
    # "new session": a fresh attach from the FILE alone re-registers
    # every view without any per-table registration code
    spark.catalog.dropTempView("cat_orders") if any(
        v.name == "cat_orders" for v in spark.catalog.listTables()) \
        else None
    names = attach_catalog(spark, catalog=cat)
    assert names == ["cat_events", "cat_orders"]
    got = spark.sql(
        "SELECT count(*) AS c FROM cat_orders").collect()[0]["c"]
    assert got == 10
    # the file is plain JSON a restarted process reads cold
    doc = json.load(open(cat))
    assert set(doc) == {"cat_orders", "cat_events"}
    assert doc["cat_orders"]["path"] == r1


def test_pinned_version_policy_and_head_follow(spark, tmp_path):
    cat = os.path.join(str(tmp_path), "catalog.json")
    root = _mk(spark, tmp_path)
    catalog_add("cat_pinned", root, catalog=cat, version=1)
    catalog_add("cat_head", root, catalog=cat)
    commit_append(spark, root, spark.createDataFrame(
        [Row(k=99, v=9.0, part="a")]), "part")
    attach_catalog(spark, catalog=cat)
    assert spark.sql("SELECT count(*) c FROM cat_pinned"
                     ).collect()[0]["c"] == 10
    assert spark.sql("SELECT count(*) c FROM cat_head"
                     ).collect()[0]["c"] == 11


def test_catalog_validation_and_removal(spark, tmp_path):
    cat = os.path.join(str(tmp_path), "catalog.json")
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="identifier"):
        catalog_add("bad name", root, catalog=cat)
    with pytest.raises(FileNotFoundError):
        catalog_add("ghost", os.path.join(str(tmp_path), "nope"),
                    catalog=cat)
    with pytest.raises(ValueError, match="not both"):
        catalog_add("t", root, catalog=cat, version=1, timestamp=1.0)
    catalog_add("t", root, catalog=cat)
    assert "t" in catalog_list(catalog=cat)
    catalog_remove("t", catalog=cat)
    assert catalog_list(catalog=cat) == {}
    with pytest.raises(KeyError):
        catalog_remove("t", catalog=cat)


def test_attach_nonstrict_skips_dropped_tables(spark, tmp_path):
    import shutil

    cat = os.path.join(str(tmp_path), "catalog.json")
    r1 = _mk(spark, tmp_path, "alive")
    r2 = _mk(spark, tmp_path, "doomed")
    catalog_add("cat_alive", r1, catalog=cat)
    catalog_add("cat_doomed", r2, catalog=cat)
    shutil.rmtree(r2)
    with pytest.raises(Exception):
        attach_catalog(spark, catalog=cat)  # strict default: loud
    names = attach_catalog(spark, catalog=cat, strict=False)
    assert names == ["cat_alive"]
