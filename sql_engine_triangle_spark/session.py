"""SparkSession factory.

Mirrors the execution characteristics the reference lab measures
(vectorized scan, partial+final aggregation, runtime re-planning —
SURVEY.md §4) by enabling AQE, CBO, and the vectorized Parquet reader.

Scale notes (100 TB target):
- ``spark.sql.shuffle.partitions`` is a local-mode default only; on a
  real cluster AQE coalescing makes the initial number mostly
  irrelevant as long as it is high enough (set ~2-3x total cores).
- AQE skew-join handling is enabled so skewed group/join keys are
  split at runtime instead of stalling a single task.
- Session timezone is pinned to UTC so timestamp semantics are stable
  across driver, executors, and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sql_engine_triangle_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back
    to ``local[*]``) so tests and bench share one code path.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # Match DuckDB/ANSI timestamp behavior for parquet written
        # without UTC adjustment (the driver fixtures).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Fixture `events.ts` is TIMESTAMP(NANOS) parquet, which the
        # Spark reader rejects by default; read as long, catalog layer
        # converts back to TimestampType (micros).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # local-mode driver JVM == the executor: give the 32 task
        # threads GC headroom (measured ~5% across the bench vs 8g on
        # the 128 GiB test host; harmless on smaller hosts since the
        # heap is reserved lazily).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
