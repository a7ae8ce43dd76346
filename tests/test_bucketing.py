"""Bucketed co-located join: same key + bucket count on both sides
must join with NO shuffle exchange (the co-location contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import table_path
from sql_engine_triangle_spark.sources import bucketing, ddl
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = spark.read.parquet(table_path(SF_DIR, "lineitem")).select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(table_path(SF_DIR, "orders")).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    for t in ("b_lineitem", "b_orders"):
        ddl.drop_table_if_exists(spark, t)
    bucketing.write_bucketed(
        li, "b_lineitem", str(tmp_path / "b_li"), "l_orderkey", 8, sort_col="l_orderkey"
    )
    bucketing.write_bucketed(
        orders, "b_orders", str(tmp_path / "b_ord"), "l_orderkey", 8, sort_col="l_orderkey"
    )

    joined = bucketing.join_bucketed(spark, "b_lineitem", "b_orders", "l_orderkey")
    # Force a non-broadcast join so bucketing is what saves the shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.join_bucketed(spark, "b_lineitem", "b_orders", "l_orderkey")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan[:800]}"
        # Same result as the plain join (row count scales with sf).
        plain = li.join(orders, "l_orderkey")
        assert joined.count() == plain.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        for t in ("b_lineitem", "b_orders"):
            ddl.drop_table_if_exists(spark, t)
