"""SQL DML at scale — predicate UPDATE/DELETE and keyed MERGE on a
600k-row lineitem manifest table (r14; SQL_DML_SCALE.json).

The sf0.01 driver contracts prove correctness; this measures the
100 TB-shaped claims on the biggest local corpus:

(lineitem in that layout is the 600k-row sf0.1 table — only the
document/embedding corpora are tiled to sf1 — recorded as such in the
artifact.)

- ``update_1key``: ``UPDATE ... WHERE l_orderkey = <k>`` on a
  range-clustered table — the stats-pruned copy-on-write must CARRY
  almost every file by reference (recorded: files carried/rewritten
  + wall time, pre-scan included).
- ``delete_scattered``: ``DELETE ... WHERE l_orderkey % 1009 = 7``
  (~0.1% of rows, every file hit) — the merge-on-read DV path must
  rewrite ZERO data files (asserted) and append one tombstone
  sidecar; wall time includes the full matching pre-scan.
- ``merge_upsert_scattered``: MERGE of a change batch whose keys are
  UNIFORMLY scattered (k % 997) — deliberately the copy-on-write
  worst case: the per-partition change-key range spans every file,
  so stats pruning cannot carry anything. Recorded as the honest
  bound; a scattered workload belongs on the DV delete path or in
  clustered batches.
- ``merge_upsert_banded``: the same upsert with keys from a NARROW
  key band (~3% of the range) — the shape a CDC consumer commits —
  where the stats-pruned rewrite must carry nearly every file.

Each op runs on a fresh copy of the created-once base table (commits
mutate), and each result is verified by a count/content probe before
its timing is recorded. Run:
    python tools/bench_sql_dml_scale.py   (writes SQL_DML_SCALE.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, ".bench_sf1_dv")
BASE = os.path.join(REPO, ".bench_sf1_dml", "base")


def main() -> None:
    from pyspark.sql import functions as F

    from silvia_spark.io import load_table
    from silvia_spark.operators.manifest_table import (create_table,
                                                       current_version,
                                                       load_manifest,
                                                       read_snapshot)
    from silvia_spark.session import get_session
    from silvia_spark.sources.sql_dml import (delete_sql,
                                              merge_into_sql,
                                              update_sql)

    assert os.path.isdir(DATA_DIR), (
        "run tools/bench_sf1_heavy.py once first (sharded sf1 corpus)")
    spark = get_session("silvia_bench_sql_dml")
    li = (load_table(spark, DATA_DIR, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice", "l_returnflag"))
    if current_version(BASE) is None:
        os.makedirs(os.path.dirname(BASE), exist_ok=True)
        create_table(li.repartitionByRange(32, "l_orderkey"), BASE,
                     "l_returnflag", stats_cols=["l_orderkey"])
    n_rows = read_snapshot(spark, BASE).count()
    files0 = {e["path"] for e in load_manifest(BASE)["files"]}
    out: dict = {"metric": "sql_dml_scale", "corpus": "heavy-bench layout; lineitem is the 600k-row sf0.1 table (only documents/embeddings are tiled to sf1 there)",
                 "rows": n_rows, "base_files": len(files0)}

    def fresh(tag: str) -> str:
        root = os.path.join(tempfile.mkdtemp(
            prefix=f"silvia_dml_{tag}_"), "tbl")
        shutil.copytree(BASE, root)
        return root

    # --- 1-key UPDATE: pruning must carry nearly everything ----------
    root = fresh("upd")
    key = li.agg(F.expr("percentile_approx(l_orderkey, 0.5)")) \
        .collect()[0][0]
    t0 = time.monotonic()
    update_sql(spark, f"UPDATE `{root}` SET l_quantity = l_quantity "
                      f"+ 1000 WHERE l_orderkey = {int(key)}")
    wall = time.monotonic() - t0
    after = {e["path"] for e in load_manifest(root)["files"]}
    hit = read_snapshot(spark, root).where("l_quantity > 900").count()
    exp = li.where(F.col("l_orderkey") == int(key)).count()
    assert hit == exp, (hit, exp)
    out["update_1key"] = {
        "wall_sec": round(wall, 3), "rows_updated": int(exp),
        "files_carried": len(files0 & after),
        "files_rewritten": len(after - files0),
        "carried_frac": round(len(files0 & after) / len(files0), 4)}

    # --- scattered DELETE: zero rewrites, one DV sidecar --------------
    root = fresh("del")
    t0 = time.monotonic()
    delete_sql(spark, f"DELETE FROM `{root}` "
                      "WHERE l_orderkey % 1009 = 7")
    wall = time.monotonic() - t0
    m = load_manifest(root)
    after = {e["path"] for e in m["files"]}
    dvs = {e["dv"] for e in m["files"] if e.get("dv")}
    n_after = read_snapshot(spark, root).count()
    n_match = li.where("l_orderkey % 1009 = 7").count()
    assert n_after == n_rows - n_match, (n_after, n_rows, n_match)
    assert after == files0, "scattered delete rewrote data files"
    dv_bytes = sum(
        os.path.getsize(os.path.join(root, "_deletes", d))
        for d in dvs)
    out["delete_scattered"] = {
        "wall_sec": round(wall, 3), "rows_deleted": int(n_match),
        "files_rewritten": 0, "dv_sidecars": len(dvs),
        "dv_bytes": dv_bytes}

    # --- keyed MERGE upsert through the text entry point --------------
    root = fresh("mrg")
    hi = li.agg(F.max("l_orderkey")).collect()[0][0]
    # the synthetic lineitem has duplicate (orderkey, linenumber,
    # returnflag) groups, so the change batch dedupes on the ON keys —
    # the multi-source-match refusal (SQL standard) is itself pinned
    # by tests/test_sql_dml.py
    upd_half = (li.where(F.col("l_orderkey") % 997 == 3)
                .groupBy("l_orderkey", "l_linenumber", "l_returnflag")
                .agg((F.max("l_quantity") + 500).alias("q2")))
    ins_half = (li.where(F.col("l_orderkey") % 997 == 5)
                .groupBy("l_orderkey", "l_linenumber", "l_returnflag")
                .agg(F.max("l_quantity").alias("q2"))
                .select((F.col("l_orderkey") + int(hi) + 10)
                        .alias("l_orderkey"),
                        "l_linenumber", "l_returnflag", "q2"))
    src = upd_half.unionByName(ins_half)
    src.createOrReplaceTempView("dml_scale_src")
    n_src = src.count()
    t0 = time.monotonic()
    merge_into_sql(spark, f"""
        MERGE INTO `{root}` AS t USING dml_scale_src AS s
        ON t.l_orderkey = s.l_orderkey
           AND t.l_linenumber = s.l_linenumber
           AND t.l_returnflag = s.l_returnflag
        WHEN MATCHED THEN UPDATE SET l_quantity = s.q2
        WHEN NOT MATCHED THEN INSERT
             (l_orderkey, l_linenumber, l_quantity, l_returnflag)
             VALUES (s.l_orderkey, s.l_linenumber, s.q2,
                     s.l_returnflag)""")
    wall = time.monotonic() - t0
    after = {e["path"] for e in load_manifest(root)["files"]}
    n_ins = ins_half.count()
    assert read_snapshot(spark, root).count() == n_rows + n_ins
    out["merge_upsert_scattered"] = {
        "wall_sec": round(wall, 3), "source_rows": int(n_src),
        "files_carried": len(files0 & after),
        "files_rewritten_or_new": len(after - files0),
        "carried_frac": round(len(files0 & after) / len(files0), 4),
        "note": "uniform key scatter = COW worst case by design"}

    # --- banded MERGE: the CDC-shaped batch the pruning serves --------
    root = fresh("mrgb")
    lo, hi_b = (li.agg(
        F.expr("percentile_approx(l_orderkey, 0.40)"),
        F.expr("percentile_approx(l_orderkey, 0.43)")).collect()[0])
    band = (li.where(F.col("l_orderkey").between(int(lo), int(hi_b)))
            .groupBy("l_orderkey", "l_linenumber", "l_returnflag")
            .agg((F.max("l_quantity") + 500).alias("q2")))
    band.createOrReplaceTempView("dml_scale_band")
    n_band = band.count()
    t0 = time.monotonic()
    merge_into_sql(spark, f"""
        MERGE INTO `{root}` AS t USING dml_scale_band AS s
        ON t.l_orderkey = s.l_orderkey
           AND t.l_linenumber = s.l_linenumber
           AND t.l_returnflag = s.l_returnflag
        WHEN MATCHED THEN UPDATE SET l_quantity = s.q2""")
    wall = time.monotonic() - t0
    after = {e["path"] for e in load_manifest(root)["files"]}
    out["merge_upsert_banded"] = {
        "wall_sec": round(wall, 3), "source_rows": int(n_band),
        "files_carried": len(files0 & after),
        "files_rewritten_or_new": len(after - files0),
        "carried_frac": round(len(files0 & after) / len(files0), 4)}
    assert out["merge_upsert_banded"]["carried_frac"] > 0.8, (
        "banded merge failed to prune", out["merge_upsert_banded"])

    try:
        out["loadavg"] = os.getloadavg()[0]
    except OSError:
        pass
    with open(os.path.join(REPO, "SQL_DML_SCALE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
