"""Cross-PROCESS manifest concurrency: the thread stress in
test_manifest_table.py shares one interpreter, but the protocol's
serialization primitives (flock flip lock, O_EXCL/link claims) are only
proven honest when the contenders are separate DRIVERS — flock is
per-open-file-description and a threading.Lock would not even exist
across processes. Three independent Spark drivers append concurrently
(each its own JVM) while the parent vacuums; the invariant is the same
as the thread stress: every acknowledged commit's rows are in the final
snapshot, exactly once."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

from silvia_spark.operators import manifest_table as mt

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from silvia_spark.operators import manifest_table as mt

pid = int(sys.argv[1]); root = sys.argv[2]
spark = (SparkSession.builder.master("local[2]")
         .appName(f"mp-appender-{{pid}}")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
acks = {{}}
for j in range(4):
    k = 1000 * pid + j
    b = spark.createDataFrame([(k, "p1", float(j))],
                              "k BIGINT, part STRING, v DOUBLE")
    acks[k] = mt.commit_append(spark, root, b, "part",
                               txn=(f"proc{{pid}}", j))
print("ACKS " + json.dumps(acks))
"""


@pytest.mark.full  # CI-mode only: 3 extra driver JVMs (~60 s)
def test_cross_process_appends_no_loss(spark, tmp_path):
    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "p1", 10.0), (2, "p2", 20.0)],
        "k BIGINT, part STRING, v DOUBLE")
    mt.create_table(base, root, "part")

    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER.format(repo=_REPO), str(i), root],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        cwd=_REPO, text=True) for i in (1, 2, 3)]
    # the parent races vacuum against the three live drivers
    for _ in range(10):
        mt.vacuum(root, keep_versions=2)
        time.sleep(1.0)
    acks: dict[int, int] = {}
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed: {out[-500:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("ACKS ")]
        assert line, out[-500:]
        acks.update({int(k): v
                     for k, v in json.loads(line[-1][5:]).items()})

    assert len(acks) == 12  # 3 drivers x 4 acknowledged batches
    raw = mt.read_snapshot(spark, root).collect()
    assert len(raw) == 2 + 12, (  # EXACTLY once: a replayed commit would
        f"row count {len(raw)} != 14 — duplicate or lost batches")
    rows = {r.k: r.v for r in raw}
    assert len(rows) == len(raw)  # no duplicate keys hiding in the count
    missing = [k for k in acks if k not in rows]
    assert not missing, f"acknowledged batches lost: {missing}"
    # txn replay guard held across processes too: the recorded highest
    # batch ids per app are all 3
    txn = mt._load_doc(root).get("txn", {})
    assert {txn.get(f"proc{i}") for i in (1, 2, 3)} == {3}
