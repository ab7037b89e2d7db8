"""History-resolution cost vs commit count (r12, verdict item 5).

table_history/version_at walked the parent chain O(versions); at the
10^4-10^6 commit counts a years-old streaming table accumulates, that
is 10^4+ file opens per DESCRIBE HISTORY / TIMESTAMP AS OF. The r12
history checkpoint (_manifests/history-ckpt.json, rolled lazily every
_HIST_CKPT_EVERY commits by the read side) makes resolution one
sidecar read + O(delta) doc reads.

This tool fabricates metadata-only chains (no Spark/data — history
reads touch only doc headers) at growing version counts, and measures
cold table_history + version_at with and without the checkpoint.
Appends a "history" section to MANIFEST_SCALE.json.

Run: python tools/bench_history_ckpt.py [counts...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from silvia_spark.operators import manifest_table as mt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fab_chain(root: str, n: int) -> None:
    mt.FS.makedirs(os.path.join(root, mt._MANIFESTS))
    for v in range(1, n + 1):
        doc = {"version": v, "parent": (v - 1 if v > 1 else None),
               "ts": 1000.0 + v, "op": ("create" if v == 1 else "meta"),
               "segments": []}
        mt.FS.put_atomic(mt._manifest_path(root, v), json.dumps(doc))
    mt.FS.put_atomic(os.path.join(root, "_current"), str(n))


def _timed(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [1000, 10_000]
    out: dict[str, dict] = {}
    for n in counts:
        base = tempfile.mkdtemp(prefix="silvia_histbench_")
        root = os.path.join(base, "tbl")
        _fab_chain(root, n)
        # cold, no checkpoint: the full O(versions) walk
        cold = _timed(lambda: mt.table_history(root), reps=1)
        if os.path.exists(mt._hist_ckpt_path(root)):
            os.remove(mt._hist_ckpt_path(root))  # cold again per rep
        cold_va = _timed(lambda: mt.version_at(root, 1000.0 + n // 2),
                         reps=1)
        # checkpointed: one sidecar + O(delta) docs (delta = 0 here;
        # the +delta case is pytest-pinned at <= _HIST_CKPT_EVERY)
        mt.checkpoint_history(root)
        warm = _timed(lambda: mt.table_history(root))
        warm_va = _timed(lambda: mt.version_at(root, 1000.0 + n // 2))
        out[str(n)] = {
            "cold_history_sec": cold,
            "cold_version_at_sec": cold_va,
            "ckpt_history_sec": warm,
            "ckpt_version_at_sec": warm_va,
            "ckpt_bytes": os.path.getsize(mt._hist_ckpt_path(root)),
        }
        print(n, out[str(n)], flush=True)
        shutil.rmtree(base)
    path = os.path.join(REPO, "MANIFEST_SCALE.json")
    with open(path) as f:
        artifact = json.load(f)
    artifact["history"] = {
        "note": ("cold = no checkpoint, full parent-chain walk; ckpt = "
                 "one history-ckpt.json read + O(delta) docs (delta=0 "
                 "at measurement; the delta path is pytest-pinned at "
                 "<= _HIST_CKPT_EVERY doc reads). version_at includes "
                 "the monotone-adjust pass."),
        "configs": out,
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"history": out}))


if __name__ == "__main__":
    main()
