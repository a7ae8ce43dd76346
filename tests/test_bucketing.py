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


def test_zorder_cluster_narrows_both_columns(spark, tmp_path):
    """Z-clustered files must each cover a NARROW range of BOTH keys,
    while a single-key-sorted layout leaves the second key's per-file
    range at ~full span — the min/max-pruning rationale for Z-order."""
    import glob as _glob

    from pyspark.sql import functions as F

    from sql_engine_triangle_spark.catalog import load_table
    from sql_engine_triangle_spark.sources.layout import zorder_cluster
    from tests.conftest import SF_DIR_SMALL

    li = load_table(spark, SF_DIR_SMALL, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    glo = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    span_a, span_b = glo[1] - glo[0], glo[3] - glo[2]
    n_files = 16

    def file_spans(path):
        spans = []
        for f in sorted(_glob.glob(f"{path}/*.parquet")):
            r = (
                spark.read.parquet(f)
                .agg(
                    F.min("l_partkey"),
                    F.max("l_partkey"),
                    F.min("l_suppkey"),
                    F.max("l_suppkey"),
                )
                .first()
            )
            spans.append(
                ((r[1] - r[0]) / span_a, (r[3] - r[2]) / span_b)
            )
        return spans

    zdir = str(tmp_path / "zorder")
    zorder_cluster(li, "l_partkey", "l_suppkey", n_files, bits=8).write.parquet(zdir)
    z_spans = file_spans(zdir)
    assert len(z_spans) >= n_files // 2

    sdir = str(tmp_path / "single")
    li.repartitionByRange(n_files, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(sdir)
    s_spans = file_spans(sdir)

    z_a = sum(a for a, _ in z_spans) / len(z_spans)
    z_b = sum(b for _, b in z_spans) / len(z_spans)
    s_a = sum(a for a, _ in s_spans) / len(s_spans)
    s_b = sum(b for _, b in s_spans) / len(s_spans)
    # single-key layout: first key tightly clustered, second ~full span
    assert s_a < 0.25 and s_b > 0.8
    # z-order: BOTH keys' average per-file span well below full
    assert z_a < 0.6 and z_b < 0.6, (z_a, z_b)
    # and the second key improves by at least 25% vs the single-key sort
    assert z_b < 0.75 * s_b
