"""sql_engine_triangle_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities exercised by the reference OLAP lab
``sjksingh/sql-engine-triangle`` (see SURVEY.md): typed scans,
filter/project/join/aggregate/window/sort/set-op pipelines, ingestion
transforms, approximate sketches, plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
plumbing) and a Structured Streaming surface.

Design principles (SURVEY.md §7):
- DataFrame/SQL API everywhere; Catalyst + AQE pick physical plans.
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
  pandas UDFs only where built-ins genuinely can't express semantics.
- Every public operator is registered in ``queries.registry`` with a
  DuckDB oracle SQL twin where SQL-expressible.
"""

from sql_engine_triangle_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
