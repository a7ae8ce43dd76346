"""Salted operators must be pure plan rewrites: identical results to
the unsalted forms on a deliberately skewed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.operators.skew import salted_count_sum, salted_join
from tests.conftest import SF_DIR, assert_frames_match


def _skewed_lineitem(spark):
    """lineitem with l_returnflag collapsed so one key holds ~75% of
    rows — a synthetic hot key."""
    li = load_table(spark, SF_DIR, "lineitem")
    return li.withColumn(
        "hot_key",
        F.when(F.col("l_returnflag").isin("N", "A"), "HOT").otherwise(
            F.col("l_returnflag")
        ),
    )


def test_salted_aggregate_equals_plain(spark):
    df = _skewed_lineitem(spark)
    salted = salted_count_sum(
        df, ["hot_key"], "l_quantity", unique_col="l_orderkey", salt_n=16
    ).orderBy("hot_key")
    plain = (
        df.groupBy("hot_key")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("sum_val"))
        .orderBy("hot_key")
    )
    assert_frames_match(salted.toPandas(), plain.toPandas())


def test_salted_join_equals_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    supp = load_table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    salted = salted_join(
        li.select("l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s_suppkey")),
        supp,
        on="s_suppkey",
        left_unique_col="l_orderkey",
        salt_n=8,
    ).orderBy("l_orderkey", "l_linenumber")
    plain = (
        li.select("l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s_suppkey"))
        .join(supp, "s_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
    )
    assert salted.count() == plain.count()
    assert_frames_match(salted.toPandas(), plain.toPandas())
