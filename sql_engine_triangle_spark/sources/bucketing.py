"""Bucketed tables for co-located (shuffle-free) joins.

The 100 TB lever the prompt-level fixtures can't show on their own:
two fact tables bucketed by the same key into the same bucket count
join WITHOUT a shuffle exchange on either side — the Spark analog of
the reference lab's physical-layout control (MergeTree ORDER BY /
composite B-trees, SURVEY.md §2.11), applied to join locality instead
of point lookups.

Bucketed writes go through saveAsTable (bucket metadata lives in the
catalog); `bucketed_join_plan_has_no_shuffle` is asserted in
tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write df as a bucketed (and optionally sorted) catalog table.
    Matching bucket count + key on both join sides ⇒ Catalyst plans a
    SortMergeJoin with no Exchange."""
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def join_bucketed(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)
