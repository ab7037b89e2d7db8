#!/usr/bin/env python
"""Evidence ledger — audits the driver-check window packing.

Reads every CORRECTNESS_r*.json, reconstructs each registered contract's
newest driver evidence, and reports:

  1. contracts whose evidence predates a code change (stale greens),
  2. contracts the driver has NEVER checked,
  3. the upcoming window (first 50 of queries()) vs the rotation policy
     (changed-first, never-checked second, oldest-evidence third),
  4. any never-checked contract OUTSIDE the window — the r04 failure mode
     this tool exists to prevent (tail arithmetic drifted and 14
     contracts silently missed four rounds of checks).

Run at round start and before the round-closing commit:
    python tools/evidence_ledger.py
Exit code 1 if a never-checked contract sits outside the window.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> int:
    from silvia_spark import registry

    registry.load_all_modules()
    names = list(registry.QUERIES)

    latest: dict[str, str] = {}
    failed: dict[str, str] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        with open(path) as f:
            for key, row in json.load(f).items():
                latest[key] = rnd
                bad = (row.get("hash_match") is False
                       or row.get("rows_match") is False)
                if bad:
                    failed[key] = rnd
                elif key in failed:
                    del failed[key]  # superseded by a newer green
    for key, rnd in failed.items():
        print(f"!! UNRESOLVED driver failure: {key} (newest evidence {rnd})")

    window = names[:WINDOW]
    never = [n for n in names if n not in latest]
    never_outside = [n for n in never if n not in window]

    print(f"registered: {len(names)}  driver-checked ever: "
          f"{len([n for n in names if n in latest])}  never: {len(never)}")
    by_round: dict[str, int] = {}
    for n in names:
        by_round[latest.get(n, "never")] = by_round.get(latest.get(n, "never"), 0) + 1
    print("newest evidence by round:",
          dict(sorted(by_round.items())))

    print(f"\nwindow (first {WINDOW} of queries()):")
    for i, n in enumerate(window, 1):
        tag = latest.get(n, "NEVER")
        print(f"  {i:3d}. {n:34s} newest evidence: {tag}")

    if never_outside:
        print(f"\nERROR: {len(never_outside)} never-checked contracts OUTSIDE "
              f"the {WINDOW}-slot window: {never_outside}")
        print("Re-pack registry._PRIORITY so these occupy head slots.")
        return 1

    oldest_outside = sorted(
        ((latest.get(n, "never"), n) for n in names[WINDOW:]))[:10]
    print("\noldest evidence rolling PAST the window (r+1 head candidates):")
    for rnd, n in oldest_outside:
        print(f"  {n:34s} {rnd}")
    print("\nOK: every never-checked contract is inside the window.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
