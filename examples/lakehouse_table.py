#!/usr/bin/env python
"""Worked end-to-end example: a manifest (lakehouse) table's full
lifecycle with the composable facade (``silvia_spark.api``) — create,
streaming-style appends with replay protection, an atomic
multi-partition MERGE, compaction, time travel, the incremental change
feed, stats-pruned reads, and GC.

Every step is a real commit through the snapshot-manifest protocol
(operators/manifest_table.py): immutable commit-named files, one
manifest per snapshot, visibility = one atomic pointer flip. A reader
can never observe a half-applied commit, and every version stays
readable until vacuumed.

Run it on the sf0.001 sample corpus:

    python examples/lakehouse_table.py          # or: <sf_dir>

Executed by tests/test_example_lakehouse.py, so the example cannot rot.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from silvia_spark import api


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = api.get_session("lakehouse-example")
    spark.sparkContext.setLogLevel("ERROR")
    ev = api.load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    root = os.path.join(tempfile.mkdtemp(prefix="lakehouse_"), "events_tbl")

    # 1. create: snapshot v1, partitioned by event_type, with a min/max
    #    index on event_id for pruned reads later
    api.create_table(ev, root, "event_type", stats_cols=["event_id"])

    # 2. streaming-style appends: O(batch) commits; the (app, batch_id)
    #    txn makes a crash-replayed batch a no-op
    batch = ev.where(F.col("event_id") % 97 == 0).withColumn(
        "event_id", F.col("event_id") + 1_000_000)
    v = api.commit_append(spark, root, batch, "event_type",
                          txn=("ingest-demo", 0))
    v_replay = api.commit_append(spark, root, batch, "event_type",
                                 txn=("ingest-demo", 0))
    assert v_replay == v, "replayed batch must not commit again"

    # 3. atomic multi-partition MERGE: update clicks, drop signups —
    #    one pointer flip, no half-merged state ever visible
    chg = (ev.where((F.col("event_type") == "click")
                    & (F.col("event_id") % 10 == 0))
           .select("event_id", "event_type",
                   (F.col("value") * 2).alias("value"),
                   F.lit("U").alias("op"))
           .unionByName(
               ev.where(F.col("event_type") == "signup")
               .select("event_id", "event_type",
                       F.lit(None).cast("double").alias("value"),
                       F.lit("D").alias("op"))))
    v_merge = api.commit_merge(spark, root, chg,
                               keys=["event_id", "event_type"],
                               part_col="event_type")

    # 4. downstream consumers poll the diff, never the bulk
    feed_rows = api.read_changes(spark, root, since=v).count()

    # 5. compaction rides the same commit path; history stays readable
    api.commit_compaction(spark, root, "event_type", target_files=1)
    v1_rows = api.read_snapshot(spark, root, version=1).count()
    cur_rows = api.read_snapshot(spark, root).count()

    # 6. stats-pruned read: the appended batch lives at event_id >= 1e6,
    #    so the manifest index hands Spark only those files
    pruned = api.read_snapshot(spark, root,
                               prune={"event_id": (1_000_000, None)})
    appended_back = pruned.where(F.col("event_id") >= 1_000_000).count()

    # 7. SQL read surface: register snapshots as temp views — current
    #    and as-of v1 side by side — and query them from spark.sql with
    #    plain SQL (snapshot isolation: the views don't shift if another
    #    commit lands; re-register to advance)
    api.register_snapshot_view(spark, root, "events_tbl")
    api.register_snapshot_view(spark, root, "events_tbl_v1", version=1)
    sql_drift = spark.sql("""
        SELECT cur.event_type, cur.cnt - v1.cnt AS drift
        FROM (SELECT event_type, count(*) AS cnt FROM events_tbl
              GROUP BY event_type) cur
        JOIN (SELECT event_type, count(*) AS cnt FROM events_tbl_v1
              GROUP BY event_type) v1 USING (event_type)
        ORDER BY event_type
    """).collect()

    # 7b. The DataSource format path (r12): the same snapshots through
    #     spark.read.format("silvia_manifest") — a REAL Spark source,
    #     so pushed SQL comparison filters prune the manifest's
    #     min/max index before any file opens, and BI tools that only
    #     speak spark.sql reach every table feature (time travel, DV
    #     masking, column mapping) through a registered view
    ds_rows = api.read_table(spark, root).count()
    api.register_table_view(spark, "events_ds_v1", root, version=1)
    ds_v1 = spark.sql(
        "SELECT count(*) AS c FROM events_ds_v1").collect()[0]["c"]

    # 8. GC everything no retained snapshot references
    deleted = api.vacuum(root, keep_versions=1)

    # 9. commit-time data quality: a CHECK constraint validates every
    #    later commit's written rows BEFORE staging — the bad batch
    #    refuses loudly and leaves no trace
    api.add_check_constraint(spark, root, "eid_present",
                             "event_id IS NOT NULL")
    bad = batch.limit(3).withColumn("event_id",
                                    F.lit(None).cast("bigint"))
    try:
        api.commit_append(spark, root, bad, "event_type")
        raise AssertionError("constraint did not enforce")
    except Exception as e:  # ConstraintViolation
        refused = "eid_present" in str(e)

    # 10. row-level CDC: enable the change feed, DV-delete scattered
    #     keys (zero data files rewritten — tombstone sidecars applied
    #     as a broadcast anti-join at read), and replay the per-version
    #     row changes a downstream CDC consumer would stream
    api.enable_cdf(root)
    v_cdf = api.table_history(root, limit=1)[0]["version"]
    keys = (api.read_snapshot(spark, root)
            .where(F.col("event_id") % 101 == 7)
            .select("event_id", "event_type").distinct())
    api.commit_delete(spark, root, keys, ["event_id", "event_type"],
                      "event_type")
    cdc = api.read_change_feed(spark, root, since=v_cdf)
    deleted_rows = cdc.where("_change_type = 'delete'").count()

    # 11. history + RESTORE: the commit log is O(metadata), and a
    #     restore re-points at an earlier snapshot without moving data
    ops = [h["op"] for h in api.table_history(root)]
    api.restore_table(spark, root, v_cdf)
    restored_rows = api.read_snapshot(spark, root).count()

    # 12. hidden partitioning: a second table partitioned by days(ts) —
    #     the day value lives only in the directory layout; a prune on
    #     the RAW timestamp skips to the right day directories
    ev_ts = api.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value")
    troot = os.path.join(tempfile.mkdtemp(prefix="lakehouse_"), "by_day")
    api.create_table(ev_ts, troot, "ts", transform="days")
    import datetime
    week = api.read_snapshot(
        spark, troot,
        prune={"ts": (datetime.datetime(2024, 1, 8),
                      datetime.datetime(2024, 1, 15))})
    week_files = week.select(F.input_file_name()).distinct().count()
    total_files = (api.read_snapshot(spark, troot)
                   .select(F.input_file_name()).distinct().count())

    out = {"v_after_append": v, "v_after_merge": v_merge,
           "ds_rows": ds_rows, "ds_v1_rows": ds_v1,
           "feed_rows": feed_rows, "v1_rows": v1_rows,
           "current_rows": cur_rows, "appended_back": appended_back,
           "sql_drift_rows": len(sql_drift),
           "vacuumed_files": len(deleted),
           "constraint_refused": refused,
           "cdc_deleted_rows": deleted_rows,
           "history_ops": ops, "restored_rows": restored_rows,
           "week_files": week_files, "day_files_total": total_files}
    print(out)
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
