"""AQE skew-join split on a genuinely zipfian corpus — the plan-level
evidence behind SCALE.md's hot-key claims (tools/skew_aqe.py is the
timing half; SKEW_AQE.json the committed artifact).

Three facts pinned:
- with skew-splitting ON the final adaptive plan carries `skew=true`
  (the hot partition really was split) and the result is unchanged;
- with it OFF the marker is absent (the corpus doesn't accidentally
  dodge the skew path);
- when the downstream aggregation groups on the JOIN key, AQE DECLINES
  the split (the join's output partitioning is required downstream) —
  the decline that makes L2's explicit salting necessary for
  known-hot-key + same-key-agg plans rather than a belt-and-braces
  nicety.

CI-mode only (`full`): joins 4M rows several times.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.full

from tools.skew_aqe import (_corpus, run_agg_on_join_key, run_unsalted)


# every conf _set_confs mutates — leaking the aggressive 1m/2m AQE
# tuning into the shared session would change later tests' plans
_MUTATED_CONFS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
)


@pytest.fixture(scope="module")
def corpus(spark):
    fact, dim = _corpus(spark)
    yield fact, dim
    for key in _MUTATED_CONFS:
        spark.conf.unset(key)


def test_skew_split_fires_and_preserves_result(spark, corpus):
    fact, dim = corpus
    _, marker_off, result_off = run_unsalted(spark, fact, dim, False)
    _, marker_on, result_on = run_unsalted(spark, fact, dim, True)
    assert not marker_off
    assert marker_on, "zipfian hot partition was not split by AQE"
    assert result_on == result_off


def test_split_declined_when_agg_groups_on_join_key(spark, corpus):
    fact, dim = corpus
    assert run_agg_on_join_key(spark, fact, dim, True) is False, (
        "AQE split a partition whose partitioning the downstream "
        "aggregation requires — if Spark ever starts doing this "
        "(re-shuffling instead of declining), L2's salting rationale "
        "in SCALE.md needs revisiting")
