"""Windowed event-stream aggregations — one logical plan, two
execution surfaces.

Each builder takes an events DataFrame that may be a batch frame
(`spark.read.parquet`) or a stream (`spark.readStream`): Spark's
`window()` / `session_window()` aggregations are identical in both
modes, so the batch form doubles as the oracle-checkable twin of the
streaming form (SURVEY.md §2.9). `stream_from_parquet` +
`run_stream_to_memory` exercise the real streaming path: file source →
watermark → stateful windowed agg → availableNow trigger → memory
sink.

Scale notes: watermark bounds state (late rows beyond 10 min are
dropped); tumbling windows shuffle once on (window, key); session
windows use Spark's native session-state merge.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WATERMARK = "10 minutes"


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type counts + value sums."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window counts (each row contributes to width/slide
    windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
        )
    )


def session_windows(events: DataFrame, gap: str = "15 minutes") -> DataFrame:
    """Per-user session windows with a 15-minute inactivity gap —
    the genuinely stateful operator (SURVEY.md §7 hard part 8)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 3).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_keys(events: DataFrame, keys: tuple[str, ...] = ("user_id", "event_type")) -> DataFrame:
    """Exactly-once key dedup — first arrival wins. The same plan
    runs over batch and stream (streaming keeps per-key state and
    emits each key once, the standard at-least-once → exactly-once
    ingestion repair). Scale note: global dropDuplicates state grows
    with |keys|; on an unbounded stream prefer
    `dropDuplicatesWithinWatermark` with an event-time column, which
    bounds state at the cost of re-admitting keys that reappear
    beyond the watermark."""
    return events.select(*keys).dropDuplicates(list(keys))


def stream_from_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture (file source; schema from
    the batch read, including the nanos→micros ts normalization).

    FileStreamSource requires a *directory* to monitor, so the fixture
    file is staged (hard-linked) into a temp dir — in production the
    source would already be a landing directory of arriving files.
    """
    from sql_engine_triangle_spark.catalog import load_table, table_path

    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema

    stage = tempfile.mkdtemp(prefix="events_stream_")
    dst = os.path.join(stage, "events.parquet")
    try:
        os.link(table_path(sf_dir, "events"), dst)
    except OSError:
        import shutil

        shutil.copyfile(table_path(sf_dir, "events"), dst)

    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    assert stream.schema == batch.schema
    return stream


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a streaming aggregation with the availableNow trigger
    (process-everything-then-stop) into a memory sink; returns the
    sink table as a DataFrame."""
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{query_name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(ckpt, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(query_name)
