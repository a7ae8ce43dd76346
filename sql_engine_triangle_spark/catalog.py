"""Catalog: load the driver fixture tables and register SQL views.

The reference lab resolves the same logical tables against four
engines (SURVEY.md §1); here the catalog is a thin layer that maps
table names to Parquet paths under a scale-factor directory and
registers them as temp views so both the DataFrame API and
``spark.sql`` see the same relations (reference: ``init.sql:27-70``
foreign-table registration — ours are external Parquet tables).

Session-timezone contract (tests/test_bare_session.py pins both
directions):
- Integer timestamp DERIVATIVES — gap_us/latency diffs via
  unix_micros, date_trunc bucketing keys, window() boundaries — are
  invariant to ``spark.sql.session.timeZone``: they are computed on
  the UTC-internal micros value.
- RAW TimestampType output columns (e.g. asof_purchase_attribution's
  ts) render in session-local wall clock when collected, so
  hash-parity with the DuckDB oracle (which reads the parquet's
  wall-clock values directly) holds when the session timezone matches
  the timezone the fixtures were written under — UTC. The external
  driver's container is Etc/UTC and a bare session inherits it; the
  repo's tuned session pins UTC explicitly (session.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # events.parquet stores TIMESTAMP(NANOS), which Spark rejects by
    # default. Both confs are runtime-settable, and callers (the
    # driver, notebooks) may hand us a bare SparkSession that never
    # went through session.get_spark — set them here so every session
    # reads the table identically:
    #   - nanosAsLong: accept TIMESTAMP(NANOS) at all;
    #   - inferTimestampNTZ=false: Spark 4 defaults this TRUE, under
    #     which a bare session reads ts as TIMESTAMP_NTZ and every
    #     LTZ-only expression (unix_micros, window, to_utc_timestamp)
    #     throws DATATYPE_MISMATCH (CORRECTNESS_r03: asof/funnel/
    #     interval-join err rows). Pin false so ts is TimestampType
    #     under ANY session, as the repo session already guaranteed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) parquet read via nanosAsLong (see
            # session.py); restore TimestampType at micro precision.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Belt-and-suspenders: if a session ignores the conf pin
            # above (e.g. a future Spark drops it), normalize to the
            # session-TZ-naive-equivalent TimestampType the rest of
            # the engine expects.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; returns the frames."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
