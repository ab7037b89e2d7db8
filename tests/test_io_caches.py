"""managed_persist slot semantics (r06): same-plan reuse, different-plan
replacement. The reuse path is what makes warm re-invocations of the
jaccard/LSH kernels hit their materialized posting lists instead of
unpersist-and-recompute — bench's fresh-build-per-rep iterative timing
depends on it."""

from __future__ import annotations

from pyspark.sql import functions as F

from silvia_spark.io import _LIVE_CACHES, managed_persist


def _fresh(spark, n):
    return spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("x"))


def test_same_plan_returns_live_cache(spark):
    a = managed_persist(_fresh(spark, 10), "test.reuse")
    a.count()
    b = managed_persist(_fresh(spark, 10), "test.reuse")
    assert b is a  # the LIVE frame, not a recomputed twin
    assert a.storageLevel.useMemory
    a.unpersist()
    _LIVE_CACHES.pop("test.reuse", None)


def test_different_plan_replaces_and_unpersists(spark):
    a = managed_persist(_fresh(spark, 10), "test.replace")
    a.count()
    b = managed_persist(_fresh(spark, 20), "test.replace")
    assert b is not a
    assert not a.storageLevel.useMemory  # old cache freed
    assert b.count() == 20
    b.unpersist()
    _LIVE_CACHES.pop("test.replace", None)


def test_local_path_handles_all_file_scheme_spellings():
    """r08 ADVICE: Hadoop renders local URIs as file:/path (single
    slash); the old prefix-strip only knew file:// and passed the rest
    through as a bogus relative path."""
    from silvia_spark.io import local_path

    assert local_path("/a/b") == "/a/b"
    assert local_path("/a/b/") == "/a/b"
    assert local_path("file:/a/b") == "/a/b"
    assert local_path("file:///a/b") == "/a/b"
    assert local_path("file://localhost/a/b") == "/a/b"
    assert local_path("relative/path") == "relative/path"
    assert local_path("s3a://bucket/a") == "s3a://bucket/a"
    # malformed file: URIs fail loudly instead of silently targeting a
    # different absolute location (r09 review finding)
    import pytest

    with pytest.raises(ValueError):
        local_path("file:relative/p")
    with pytest.raises(ValueError):
        local_path("file://host-only")
