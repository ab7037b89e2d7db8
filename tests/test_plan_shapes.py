"""Plan-shape regression guard — the PLANS.md audit as a pytest marker.

PLANS.md is regenerated manually (tools/dump_plans.py), so between regens a
plan-shape regression — a lost broadcast, a new exchange, a join degrading
to BroadcastNestedLoopJoin — would only surface in the next manual run.
This suite executes every AUDITED contract and asserts its required plan
operators directly, so the same regression fails a test run instead.

Marked `plans` (excluded from the default run to protect the suite-time
budget — the ~57 plan executions cost minutes): run with
`python -m pytest tests/ -m plans`, or everything via CI mode `-m ""`.
The single source of truth for the required operators stays
tools/dump_plans.py's AUDITED table — this file imports it, so the manual
regen and the pytest guard can never disagree.
"""

from __future__ import annotations

import pytest

from silvia_spark import registry
from tests.conftest import SF_MID

from tools.dump_plans import AUDITED

pytestmark = pytest.mark.plans


@pytest.mark.parametrize(
    "name,required", [(n, r) for n, r, _ in AUDITED],
    ids=[n for n, _, _ in AUDITED])
def test_plan_exhibits_required_operators(spark, name, required):
    registry.load_all_modules()
    df = registry.QUERIES[name](spark, SF_MID)
    df.toArrow()  # execute so AQE settles on the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    missing = [r for r in required if r not in plan]
    assert not missing, (
        f"{name}: plan lost required operator(s) {missing} — a scale "
        "property asserted in PLANS.md regressed (regenerate with "
        "tools/dump_plans.py to inspect the drift)")
