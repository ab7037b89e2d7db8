"""silvia_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the Qlean/silvia reference (an ETL pipeline for Snowplow /
Adjust event data to PostgreSQL; see SURVEY.md §0 — the reference checkout is
empty, so parity targets come from SURVEY.md §2's contract inventory).

Design stance (SURVEY.md §7):
- DataFrame API only; Catalyst/Tungsten/AQE do the physical planning.
- No RDDs, no Scala, no custom Catalyst rules.
- Python touches data only via Arrow-batched pandas UDFs where built-ins
  genuinely can't express the semantics (stateful streaming, minhash).
"""

from silvia_spark.session import get_session, configure_session
from silvia_spark.io import load_table, load_tables

__all__ = ["get_session", "configure_session", "load_table", "load_tables"]
__version__ = "0.1.0"
