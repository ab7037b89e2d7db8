"""Dump one query's formatted executed plan (warm, AQE-settled) to a
file — the per-round plans/r{N}/<query>_{before,after}.txt evidence.

Usage: python tools/dump_query_plan.py <query> <out_path> [sf_dir]

Method (matches PLANS.md/dump_plans.py): build the plan, execute once so
AQE settles, REBUILD the same plan (warm caches — both sides of a
before/after pair then see identical cache statistics), execute and dump
`explain("formatted")` of the executed query.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dump(spark, name: str, out_path: str,
         sf_dir: str = "/root/testdata/sf0.01") -> None:
    from silvia_spark import registry

    df = registry.QUERIES[name](spark, sf_dir)
    df.toArrow()  # warm: caches fill, AQE settles
    df2 = registry.QUERIES[name](spark, sf_dir)  # re-derive over warm caches
    df2.toArrow()
    txt = spark._jvm.PythonSQLUtils.explainString(
        df2._jdf.queryExecution(), "formatted")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {out_path} ({len(txt)} chars)")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    name, out_path = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    from silvia_spark import registry
    from silvia_spark.session import get_session

    registry.load_all_modules()
    spark = get_session("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    dump(spark, name, out_path, sf_dir)


if __name__ == "__main__":
    main()
