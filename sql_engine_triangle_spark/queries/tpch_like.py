"""Classic TPC-H-shaped deep-join queries over the fixture tables.

The driver fixture is TPC-H-ish (TESTDATA.md), so the canonical
multi-join analytics shapes — shipping-priority (Q3-like), local
supplier volume (Q5-like), returned-item reporting (Q10-like) — run
unmodified up to the columns the fixture carries. They complement the
reference's Q1–Q4 with deeper join trees (the reference lab never
joins more than one dimension chain — SURVEY.md §2.3), exercising
Catalyst's join ordering and broadcast selection at depth.

Float discipline: revenue = sum(l_extendedprice * (1-l_discount))
accumulates as DECIMAL(18,4) on both engines (exact,
order-independent), as in j_star_revenue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.queries.registry import register

_REVENUE_SQL = "sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))"


def _revenue_col() -> F.Column:
    return F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
    )


TPCH_Q3_ORACLE = f"""
SELECT l_orderkey,
       CAST(round({_REVENUE_SQL}, 2) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS odate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("tpch_q3_shipping_priority", oracle=TPCH_Q3_ORACLE, tags=("J1", "A4", "O3"))
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: un-shipped high-revenue orders for one market
    segment. customer (filtered, broadcast) ⋈ orders ⋈ lineitem, one
    fact shuffle on the order key, top-10 via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("odate"))
        .agg(F.round(_revenue_col(), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "odate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


TPCH_Q5_ORACLE = f"""
SELECT n_name,
       CAST(round({_REVENUE_SQL}, 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("tpch_q5_local_supplier_volume", oracle=TPCH_Q5_ORACLE, tags=("J1", "A4", "A6"))
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from orders where the supplier and the
    customer share a nation, per nation in one region. Six-table join
    — the join-ordering stress: lineitem⋈orders is the only
    fact-sized exchange; customer/supplier/nation/region broadcast,
    with the local-supplier condition (c_nationkey = s_nationkey)
    applied as a join predicate, not a post-filter."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(_revenue_col(), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


TPCH_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       CAST(round({_REVENUE_SQL}, 2) AS DOUBLE) AS lost_revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


@register("tpch_q10_returned_items", oracle=TPCH_Q10_ORACLE, tags=("J1", "A4", "O3"))
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    in one quarter-window. Returned-flag filter pushes to the
    lineitem scan; dims broadcast; top-20 via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(_revenue_col(), 2).cast("double").alias("lost_revenue"))
        .select("c_custkey", "c_name", "lost_revenue", "n_name")
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )
