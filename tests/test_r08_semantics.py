"""Planted micro-cases for the r08 ADVICE fixes — behaviors the corpus
hash can't localize: merge_keyed's file:// URI branch, and the
pg-autoboot trust ordering (ownership gate before any socket probe)."""

from __future__ import annotations

import os


def test_merge_keyed_accepts_file_uri(spark, tmp_path):
    """The r07-ADVICE bug: a file:// URI routed to the local staged-swap
    branch, but os.makedirs/os.rename then treated the raw URI string as
    a relative path — FileNotFoundError after writing the stage dir.
    The scheme must be stripped so the merge lands in the real dir and
    leaves no stage/trash siblings behind."""
    from silvia_spark.operators.scans import merge_keyed

    base = spark.createDataFrame(
        [(1, "p1", 10.0), (2, "p1", 20.0), (4, "p2", 40.0)],
        "k BIGINT, part STRING, v DOUBLE")
    out = str(tmp_path / "t")
    base.write.partitionBy("part").parquet(out)

    chg = spark.createDataFrame(
        [(1, "p1", 11.0, "U"), (9, "p2", 90.0, "I")],
        "k BIGINT, part STRING, v DOUBLE, op STRING")
    merge_keyed(spark, "file://" + out, chg, ["k", "part"], "part")

    got = {(r.k, r.part): r.v for r in spark.read.parquet(out).collect()}
    assert got == {(1, "p1"): 11.0, (2, "p1"): 20.0,
                   (4, "p2"): 40.0, (9, "p2"): 90.0}
    leftovers = [d for d in os.listdir(tmp_path)
                 if ".stage-" in d or ".trash-" in d]
    assert leftovers == []


def test_autoboot_never_probes_untrusted_root(monkeypatch, tmp_path):
    """The r07-ADVICE trust-ordering bug: autoboot_host() execd psql
    against the /tmp singleton socket BEFORE checking ownership, running
    SQL against a potentially pre-planted world-writable server. Plant an
    untrusted root and assert the probe is never attempted."""
    from silvia_spark import pg

    planted = tmp_path / "planted_pg"
    planted.mkdir()
    monkeypatch.setattr(pg, "AUTOBOOT_ROOT", str(planted))
    monkeypatch.setattr(pg, "_owned_by_us", lambda path: False)

    def forbidden_alive(root):
        raise AssertionError("_alive() probed an untrusted root")

    monkeypatch.setattr(pg, "_alive", forbidden_alive)
    monkeypatch.setattr(pg, "have_server_binaries", lambda: False)
    assert pg.autoboot_host() is None
