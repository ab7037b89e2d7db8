"""Streaming source construction (file | rate | kafka)."""

from silvia_spark.sources.factory import source  # noqa: F401
