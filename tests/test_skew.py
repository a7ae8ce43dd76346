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


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The other half of the skew story: AQE's runtime skew-join
    split (spark.sql.adaptive.skewJoin, on in session.py). Thresholds
    are lowered to fixture scale on a derived session; the final plan
    must carry a `skew=true` shuffle read on the hot partition —
    proof the engine re-plans skew at runtime without manual salting.
    """
    s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    left = s2.range(0, 200_000).select(
        F.when(F.col("id") % 10 == 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
    )
    right = s2.range(0, 1000).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
    j = left.join(right, "k")
    # collect() (not count()) — count() builds its own query execution,
    # leaving j's AQE plan unfinalized (isFinalPlan=false).
    assert len(j.collect()) == 200_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, "AQE did not split the skewed partition"
