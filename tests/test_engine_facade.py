"""Engine façade + stateful streaming operator tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sql_engine_triangle_spark.engine import Engine
from sql_engine_triangle_spark.streaming import stateful
from sql_engine_triangle_spark.streaming import windows as W
from tests.conftest import SF_DIR, SF_DIR_SMALL


def test_engine_three_entry_points_agree(spark):
    eng = Engine(spark=spark, sf_dir=SF_DIR)
    sql_n = eng.sql("SELECT count(*) AS n FROM lineitem").head().n
    df_n = eng.table("lineitem").count()
    assert sql_n == df_n > 0
    q = eng.query("q1_agg_by_type").toPandas()
    assert list(q.columns) == ["l_returnflag", "cnt", "avg_price", "min_price", "max_price"]
    assert "q1_agg_by_type" in eng.query_names()
    assert eng.oracle("q1_agg_by_type") is not None


def test_stateful_running_totals_matches_batch(spark):
    """applyInPandasWithState running totals: after consuming the
    whole stream, per-user state equals the batch groupBy totals."""
    from sql_engine_triangle_spark.catalog import load_table

    stream = W.stream_from_parquet(spark, SF_DIR_SMALL)
    out = stateful.running_user_totals(stream)
    got = W.run_stream_to_memory(spark, out, "t_stateful", output_mode="update")
    # update mode may emit a row per user per batch; keep the last.
    got_pdf = (
        got.toPandas()
        .sort_values(["user_id", "n_events"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
        .sort_index()
    )

    batch = (
        load_table(spark, SF_DIR_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got_pdf["n_events"] == batch["n_events"]).all()
    pd.testing.assert_series_equal(
        got_pdf["sum_value"], batch["sum_value"], rtol=1e-9, check_names=False
    )
