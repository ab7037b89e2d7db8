"""The lakehouse example (examples/lakehouse_table.py) must actually run
end to end, and the numbers it prints must satisfy the invariants its
prose claims: replay doesn't double-commit, the change feed covers only
post-append commits, every snapshot stays readable until vacuumed, and
the pruned read recovers exactly the appended batch."""

from __future__ import annotations

import pytest

from examples.lakehouse_table import main
from silvia_spark.io import load_table
from tests.conftest import SF_SMALL

# CI-mode only (suite-time budget): the example is also executable
# directly, and every kernel it drives is covered in the default run by
# tests/test_manifest_table.py.
pytestmark = pytest.mark.full


def test_example_lifecycle_invariants(spark):
    ev = load_table(spark, SF_SMALL, "events")
    n = ev.count()
    n_signup = ev.where("event_type = 'signup'").count()
    n_appended = ev.where("event_id % 97 = 0").count()

    out = main(SF_SMALL)
    assert out["v_after_append"] == 2          # replay did not bump this
    assert out["v_after_merge"] == 3
    assert out["v1_rows"] == n                 # time travel intact
    assert out["current_rows"] == n + n_appended - n_signup
    assert out["appended_back"] == n_appended  # pruned read found them all
    # the feed (since v2) re-delivers the rewritten click partition and
    # nothing from untouched partitions
    assert out["feed_rows"] > 0
    assert out["vacuumed_files"] > 0           # pre-merge versions GC'd


def test_example_r11_surface(spark):
    out = main(SF_SMALL)
    assert out["constraint_refused"] is True
    assert out["cdc_deleted_rows"] > 0
    # the step-8 vacuum truncated history at the retention edge, so
    # the log reaches back to the retained compaction, not to create
    assert out["history_ops"][0] == "delete"
    assert "restore" not in out["history_ops"]  # taken BEFORE restore
    assert out["restored_rows"] == out["current_rows"]  # rollback exact
    assert 0 < out["week_files"] < out["day_files_total"]
