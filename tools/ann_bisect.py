"""ANN regression bisect (r12, verdict item 1): attribute the r11
sf1-heavy ANN deltas (sim_ann_lsh 157.5→229.7 s, multiprobe2
236.4→380.5 s) to BOX vs KERNEL.

The suspect code span is the r11 verify-tail rework
(3dc9602..50ac128: nondeterministic-cosine → mapInPandas
score_pairs_threshold). This script times ONLY the two ANN rows
against the same committed sf1 corpus (.bench_sf1_dv), in one fresh
process per checkout, under bench.py's idle-box gate — run it once
from the HEAD checkout and once from a worktree at 3dc9602^ and the
pair of artifacts is the bisect:

    python tools/ann_bisect.py /root/repo            /tmp/ann_head.json
    python tools/ann_bisect.py /root/repo/.wt_pre    /tmp/ann_pre.json

Same box, back-to-back, loadavg recorded before and after each query
so a co-tenant spike mid-measurement is visible in the artifact.
Timing = warm build (plan + caches) then min over TIMED_REPS fresh
cold-cache executions, matching tools/bench_sf1_heavy.py's method.
"""

from __future__ import annotations

import json
import os
import sys
import time

TIMED_REPS = 2
QUERIES = ("sim_ann_lsh", "sim_ann_lsh_multiprobe2")
DATA = "/root/repo/.bench_sf1_dv"


def main() -> None:
    repo, out = sys.argv[1], sys.argv[2]
    sys.path.insert(0, repo)
    os.chdir(repo)
    from bench import _load_gate
    gate = _load_gate()
    from silvia_spark import registry
    from silvia_spark.session import get_session

    registry.load_all_modules()
    spark = get_session("ann_bisect")
    spark.sparkContext.setLogLevel("ERROR")
    from silvia_spark.io import clear_caches

    res: dict[str, dict] = {}
    for q in QUERIES:
        la0 = round(os.getloadavg()[0], 2)
        clear_caches()
        registry.QUERIES[q](spark, DATA).toArrow()  # warm
        best = float("inf")
        for _ in range(TIMED_REPS):
            clear_caches()
            t0 = time.perf_counter()
            registry.QUERIES[q](spark, DATA).toArrow()
            best = min(best, time.perf_counter() - t0)
        res[q] = {"sec": round(best, 1), "loadavg": [la0, round(
            os.getloadavg()[0], 2)]}
        print(q, res[q], flush=True)

    head = os.popen(f"git -C {repo} rev-parse --short HEAD").read()
    with open(out, "w") as f:
        json.dump({"repo": repo, "commit": head.strip(),
                   "load_gate": gate, "reps": TIMED_REPS,
                   "results": res}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
