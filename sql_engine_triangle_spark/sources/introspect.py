"""Catalog/size introspection (SURVEY.md §2.1 S10-S11).

Spark analogs of the lab's system.parts / pg_total_relation_size
probes (clickhouse/queries.sql:11-18, postgres/get_size.sql): walk a
parquet dataset's files/partition dirs and report rows/bytes with
pretty-printed sizes."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_triangle_spark.functions.scalar import readable_size


def dataset_files(spark: SparkSession, path: str) -> DataFrame:
    """One row per data file: (partition, file, bytes). Partition is
    the Hive-style subdir chain ('' for unpartitioned datasets)."""
    rows = []
    if os.path.isfile(path):
        rows.append(("", os.path.basename(path), os.path.getsize(path)))
    else:
        for root, _dirs, files in os.walk(path):
            rel = os.path.relpath(root, path)
            part = "" if rel == "." else rel
            for f in files:
                if f.endswith((".parquet", ".csv", ".json", ".orc")):
                    rows.append((part, f, os.path.getsize(os.path.join(root, f))))
    return spark.createDataFrame(rows, "partition string, file string, bytes long")


def partition_stats(spark: SparkSession, path: str) -> DataFrame:
    """system.parts analog: per-partition file count + total bytes +
    pretty size (clickhouse/queries.sql:11-18)."""
    files = dataset_files(spark, path)
    return (
        files.groupBy("partition")
        .agg(F.count("*").alias("n_files"), F.sum("bytes").alias("total_bytes"))
        .withColumn("pretty_size", readable_size(F.col("total_bytes")))
        .orderBy("partition")
    )


def table_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pg_total_relation_size analog over every catalog table
    (postgres/get_size.sql:2-31): rows + bytes + pretty size."""
    from sql_engine_triangle_spark.catalog import TABLES, load_table, table_path

    out = []
    for t in TABLES:
        p = table_path(sf_dir, t)
        n = load_table(spark, sf_dir, t).count()
        size = os.path.getsize(p) if os.path.isfile(p) else sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(p)
            for f in fs
        )
        out.append((t, n, size))
    return (
        spark.createDataFrame(out, "table_name string, n_rows long, bytes long")
        .withColumn("pretty_size", readable_size(F.col("bytes")))
        .orderBy("table_name")
    )
