"""Engine façade (SURVEY.md §3 Entry C).

One object tying together session, catalog, SQL entry, and the query
registry — what a user of the reference lab would hold instead of a
psql/clickhouse-client connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_engine_triangle_spark.catalog import DEFAULT_SF_DIR, register_views
from sql_engine_triangle_spark.queries import registry
from sql_engine_triangle_spark.session import get_spark


class Engine:
    """Facade over the PySpark-native engine.

    >>> eng = Engine(sf_dir="/root/testdata/sf0.01")
    >>> eng.sql("SELECT count(*) AS n FROM lineitem").show()
    >>> eng.query("q1_agg_by_type").show()
    """

    def __init__(self, spark: SparkSession | None = None, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self._views_registered = False

    # -- Entry A: SQL ------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """spark.sql over the catalog views (registered on first use)."""
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    # -- Entry B: DataFrame -----------------------------------------
    def table(self, name: str) -> DataFrame:
        from sql_engine_triangle_spark.catalog import load_table

        return load_table(self.spark, self.sf_dir, name)

    # -- Entry C: registered operator pipelines ---------------------
    def query(self, name: str) -> DataFrame:
        """Run a registered operator pipeline by name."""
        return registry.get(name).fn(self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        return registry.names()

    def oracle(self, name: str) -> str | None:
        return registry.get(name).oracle
