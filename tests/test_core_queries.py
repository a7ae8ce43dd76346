"""Core-query extras beyond the generic registry sweep: approx-sketch
tolerance (SURVEY.md §5) and SQL-vs-DataFrame entry-point agreement
(SURVEY.md §3 Entry A ≡ Entry B)."""

from __future__ import annotations

from sql_engine_triangle_spark.queries import registry
from tests.conftest import SF_DIR, assert_frames_match


def test_q4_approx_validation_all_true(spark):
    """A10/A11 driver form: the tolerance-validation entry must emit
    within-tolerance TRUE for every nation (matching its oracle's
    asserted expectation)."""
    pdf = registry.get("q4_approx_percentiles").fn(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    assert pdf["p50_within_tol"].all(), pdf[~pdf["p50_within_tol"]]
    assert pdf["uniq_within_tol"].all(), pdf[~pdf["uniq_within_tol"]]


def test_q4_approx_close_to_exact(spark):
    """A10 tolerance: approx_percentile within 5% of exact p50 (the
    lab's CH-vs-PG exact/approx pairing, q4 README.md:64 vs :222)."""
    approx = (
        registry.get("q4_approx_sketch").fn(spark, SF_DIR).toPandas().set_index("nation")
    )
    exact = (
        registry.get("q4_top_nations_percentiles")
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("nation")
    )
    joined = exact.join(approx, how="inner", rsuffix="_a")
    assert len(joined) == len(exact)
    rel = ((joined["p50_approx"] - joined["p50"]).abs() / joined["p50"]).max()
    assert rel < 0.05, f"approx p50 off by {rel:.3%}"


def test_sql_entry_equals_dataframe_entry(spark):
    """spark.sql and the DataFrame API build the same logical plan —
    results must be identical (SURVEY.md §3)."""
    sql_pdf = registry.get("sql_entry_q1").fn(spark, SF_DIR).toPandas()
    df_pdf = registry.get("q1_agg_by_type").fn(spark, SF_DIR).toPandas()
    assert_frames_match(df_pdf, sql_pdf)
