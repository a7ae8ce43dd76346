"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over ``sql_engine_triangle_spark.queries.registry`` —
every implemented operator from SURVEY.md §2 is registered there with
its DataFrame builder and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sql_engine_triangle_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference Q1 shape) on /root/testdata/sf0.001."""
    from sql_engine_triangle_spark.queries.core import q1_agg_by_type

    return q1_agg_by_type(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return registry.all_oracles()
