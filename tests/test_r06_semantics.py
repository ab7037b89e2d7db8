"""Planted micro-cases for the r06 contracts — row-level semantics the
corpus-wide hash can't localize when it breaks: MERGE row classes, SCD2
version chains, nearest-as-of tie direction, and the classification
ordering pitfalls. The merge and as-of cases drive the REAL kernels the
contracts are built from (merge_keyed, nearest_asof), so a semantics
regression in the shipped code fails here even if the contract's oracle
is edited in tandem."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_merge_semantics_row_classes(spark, tmp_path):
    """A13's four row classes on a 5-row table through the REAL
    merge_keyed kernel: update applied, delete gone, insert present,
    untouched rows intact — and the untouched PARTITION's files
    physically untouched."""
    import os

    from silvia_spark.operators.scans import merge_keyed

    base = spark.createDataFrame(
        [(1, "p1", 10.0), (2, "p1", 20.0), (3, "p1", 30.0),
         (4, "p2", 40.0), (5, "p2", 50.0)],
        "k BIGINT, part STRING, v DOUBLE")
    out = str(tmp_path / "t")
    base.write.partitionBy("part").parquet(out)
    p2_files = sorted(os.listdir(os.path.join(out, "part=p2")))

    chg = spark.createDataFrame(
        [(1, "p1", 11.0, "U"), (2, "p1", None, "D"), (9, "p1", 90.0, "I")],
        "k BIGINT, part STRING, v DOUBLE, op STRING")
    merge_keyed(spark, out, chg, ["k", "part"], "part")

    got = {(r.k, r.part): r.v for r in spark.read.parquet(out).collect()}
    assert got == {(1, "p1"): 11.0,            # updated
                   (3, "p1"): 30.0,            # untouched same-partition
                   (9, "p1"): 90.0,            # inserted
                   (4, "p2"): 40.0, (5, "p2"): 50.0}  # untouched partition
    assert (2, "p1") not in got                # deleted
    assert sorted(os.listdir(os.path.join(out, "part=p2"))) == p2_files
    # staged-swap hygiene: a successful merge leaves no staging/trash
    # siblings behind
    leftovers = [d for d in os.listdir(tmp_path)
                 if ".stage-" in d or ".trash-" in d]
    assert leftovers == []


def test_merge_keyed_crash_midswap_preserves_previous_copy(
        spark, tmp_path, monkeypatch):
    """The ADVICE r06 data-loss window: merge_keyed must never destroy the
    only copy of a partition. Induce a crash on the SECOND rename of the
    swap (old→trash succeeded, staged→live about to run): the previous
    partition data must survive intact in the trash dir, and nothing may
    have been garbage-collected."""
    import os

    from silvia_spark.operators import scans
    from silvia_spark.operators.scans import merge_keyed

    base = spark.createDataFrame(
        [(1, "p1", 10.0), (2, "p1", 20.0), (4, "p2", 40.0)],
        "k BIGINT, part STRING, v DOUBLE")
    out = str(tmp_path / "t")
    base.write.partitionBy("part").parquet(out)

    chg = spark.createDataFrame(
        [(1, "p1", 11.0, "U")], "k BIGINT, part STRING, v DOUBLE, op STRING")

    real_rename, calls = os.rename, []

    def failing_rename(src, dst):
        calls.append(src)
        if len(calls) == 2:
            raise OSError("induced crash mid-swap")
        real_rename(src, dst)

    monkeypatch.setattr(scans.os, "rename", failing_rename)
    try:
        merge_keyed(spark, out, chg, ["k", "part"], "part")
        raise AssertionError("induced crash did not propagate")
    except OSError:
        pass
    monkeypatch.setattr(scans.os, "rename", real_rename)

    trash = [d for d in os.listdir(tmp_path) if ".trash-" in d]
    assert len(trash) == 1, "trash dir must survive a mid-swap crash"
    saved = spark.read.parquet(str(tmp_path / trash[0] / "part=p1"))
    assert sorted((r.k, r.v) for r in saved.collect()) == [(1, 10.0),
                                                           (2, 20.0)]
    # the staged replacement also survives, so EITHER copy can finish
    # the recovery
    stage = [d for d in os.listdir(tmp_path) if ".stage-" in d]
    assert len(stage) == 1


def test_scd2_version_chain_for_one_key(spark):
    """A14: an updated key must show exactly the closed v1 (valid_to =
    effective date, not current) and the open v2; an untouched key shows
    one open version."""
    from silvia_spark import registry
    registry.load_all_modules()
    rows = registry.QUERIES["sink_merge_scd2"](spark, SF_SMALL).collect()
    k13 = [r for r in rows if r.c_custkey == 13]   # 13 % 13 == 0: updated
    assert len(k13) == 2
    closed, fresh = sorted(k13, key=lambda r: str(r.valid_from))
    assert str(closed.valid_to) == "1996-06-01" and not closed.is_current
    assert fresh.valid_to is None and fresh.is_current
    assert abs(fresh.c_acctbal - (closed.c_acctbal + 100.50)) < 1e-9
    k14 = [r for r in rows if r.c_custkey == 14]   # untouched
    assert len(k14) == 1 and k14[0].is_current and k14[0].valid_to is None


def test_nearest_asof_kernel_tie_and_tolerance(spark):
    """C13's REAL kernel on planted frames: equidistant candidates
    (±1h from the probe) resolve to the EARLIER one; a probe with
    nothing inside the tolerance survives with NULLs."""
    from silvia_spark.operators.joins import nearest_asof

    us = 3_600_000_000
    left = spark.createDataFrame(
        [(1, 10 * us, 7), (2, 50 * us, 7)],
        "eid BIGINT, t BIGINT, b BIGINT")
    right = spark.createDataFrame(
        [(100, 9 * us, 7), (200, 11 * us, 7), (300, 20 * us, 7)],
        "ok BIGINT, ot BIGINT, ob BIGINT")
    out = {r.eid: (r.ok, r.dist_us) for r in
           nearest_asof(left, right, on=("b", "ob"), ts_us=("t", "ot"),
                        left_id="eid", right_order=["ot", "ok"],
                        tol_us=2 * us).collect()}
    assert out[1] == (100, us)        # tie 9h vs 11h → EARLIER (100)
    assert out[2] == (None, None)     # nothing within ±2h of 50h


def test_ua_classification_ordering_pitfalls(spark):
    """M21: a Chrome UA (which contains 'Safari/') must classify chrome;
    an iPhone UA (which contains 'like Mac OS X') must classify ios."""
    from silvia_spark import registry
    registry.load_all_modules()
    rows = registry.QUERIES["etl_ua_referer_enrich"](
        spark, SF_SMALL).collect()
    combos = {(r.browser, r.os, r.device) for r in rows}
    assert ("chrome", "windows", "desktop") in combos
    assert ("safari", "ios", "mobile") in combos
    assert ("safari", "macos", "desktop") in combos
    assert ("bot", "other", "desktop") in combos
    # the pitfalls: no Chrome UA leaked into safari/macos-as-windows rows
    assert not any(b == "safari" and o == "windows" for b, o, _ in combos)
    assert not any(b == "chrome" and o == "ios" for b, o, _ in combos)
