"""Structural invariants for the warehouse ops (SCD2, sessionize,
winsorize, Q18). Oracle parity runs in the generic registry sweep;
these pin the interval/assignment semantics parity can't see."""

from __future__ import annotations

from sql_engine_triangle_spark.queries import registry
from tests.conftest import SF_DIR_SMALL, assert_frames_match


def test_scd2_intervals_are_valid(spark):
    res = registry.get("w_scd2_history").fn(spark, SF_DIR_SMALL).toPandas()
    # exactly one current row per user
    cur = res.groupby("user_id")["is_current"].sum()
    assert (cur == 1).all()
    for _, g in res.groupby("user_id"):
        g = g.sort_values("version")
        assert list(g["version"]) == list(range(1, len(g) + 1))
        # each row's effective_to equals the next row's effective_from
        nxt = g["effective_from"].shift(-1)
        closed = g["effective_to"].notna()
        assert (g.loc[closed, "effective_to"] == nxt[closed]).all()
        # intervals never go backwards
        assert (
            g.loc[closed, "effective_to"] >= g.loc[closed, "effective_from"]
        ).all()


def test_sessionize_gap_semantics(spark):
    res = registry.get("w_sessionize").fn(spark, SF_DIR_SMALL).toPandas()
    ev_total = res["n_events"].sum()
    from sql_engine_triangle_spark.catalog import load_table

    assert ev_total == load_table(spark, SF_DIR_SMALL, "events").count()
    assert (res["duration_us"] >= 0).all()
    for _, g in res.groupby("user_id"):
        g = g.sort_values("session_id")
        assert list(g["session_id"]) == list(range(1, len(g) + 1))
        # consecutive sessions of one user are separated by > 24h
        gap = (
            g["session_start"].shift(-1) - g["session_end"]
        ).dropna().dt.total_seconds()
        assert (gap > 24 * 3600).all()


def test_winsorize_bounds(spark):
    res = registry.get("f_winsorize").fn(spark, SF_DIR_SMALL).toPandas()
    # clipped mean lies within [p05, p95]; raw mean may not
    assert (res["avg_winsorized"] >= res["p05"] - 1e-9).all()
    assert (res["avg_winsorized"] <= res["p95"] + 1e-9).all()


def test_q18_threshold_and_ordering(spark):
    res = registry.get("tpch_q18_big_orders").fn(spark, SF_DIR_SMALL).toPandas()
    assert (res["sum_qty"] > 250).all()
    assert res["o_totalprice"].is_monotonic_decreasing or len(res) <= 1


def test_warehouse_partition_count_independence(spark):
    for name in ("w_scd2_history", "w_sessionize", "f_winsorize"):
        fn = registry.get(name).fn
        base = fn(spark, SF_DIR_SMALL).toPandas()
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            alt = fn(spark, SF_DIR_SMALL).toPandas()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert_frames_match(base, alt)
