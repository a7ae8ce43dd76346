"""Table-maintenance operators: small-file compaction.

Training-data pipelines produce many small files (per-micro-batch
appends, per-task outputs at high parallelism); scan efficiency then
degrades — each file costs a footer read, a task, and breaks
row-group-level pushdown locality. The reference lab's analog is the
storage-layout discipline its engines apply on ingest (ClickHouse
merges parts in the background; PG CLUSTER/VACUUM — README.md:337-368);
in a Spark+Parquet engine the equivalent is an explicit compaction
rewrite.

Scale notes (100 TB):
- Compaction is per-partition-directory work: each partition's files
  are coalesced independently (bounded task input), so a 100 TB table
  compacts as thousands of independent jobs — schedulable
  incrementally, partition-by-partition, without a global shuffle.
- `sort_cols` re-sorts rows within output files (sortWithinPartitions
  — no global exchange) to restore min/max-statistics locality for
  predicate pushdown, mirroring the sorted layout the lab's columnar
  DDL pins (clickhouse-init/01-create-table.sql:70-73).
- The rewrite targets a NEW directory (write-audit-publish): readers
  keep the old layout until the swap, and a failed compaction leaves
  the table untouched. A table format with atomic commit (catalog
  swap) replaces the final rename at production scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API (works
    on any FS Spark can read, not just local disk)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def parquet_file_count(spark: SparkSession, path: str) -> int:
    """Number of data files in a parquet directory (metadata files
    excluded)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        f = it.next().getPath().getName()
        if f.endswith(".parquet"):
            n += 1
    return n


def compact_table(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite the parquet table at ``src_dir`` into ``dst_dir`` with
    ceil(total_bytes / target_file_bytes) output files, optionally
    re-sorted within files by ``sort_cols`` for statistics locality.
    Returns the output file count. ``dst_dir`` must not exist (the
    caller publishes by swapping directories after validating)."""
    total = dir_bytes(spark, src_dir)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df: DataFrame = spark.read.parquet(src_dir)
    if sort_cols:
        # range-partition on the sort key, then sort within each file:
        # output files hold DISJOINT key ranges (a clustered layout —
        # the CLUSTER BY analog), so min/max statistics prune point and
        # range predicates to one/few files. A plain repartition would
        # round-robin the keys and give every file the full key span.
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("error").parquet(dst_dir)
    return n_files


def compact_table_zorder(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    col_a: str,
    col_b: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
) -> int:
    """``compact_table`` with a Z-ORDER clustered layout: output files
    cover narrow ranges of BOTH ``col_a`` and ``col_b`` (multi-column
    min/max pruning), vs the single-key clustering of ``sort_cols``.
    Same write-audit-publish contract; returns the file count."""
    from sql_engine_triangle_spark.sources.layout import zorder_cluster

    total = dir_bytes(spark, src_dir)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    zorder_cluster(df, col_a, col_b, n_files, bits=bits).write.mode("error").parquet(
        dst_dir
    )
    return n_files
