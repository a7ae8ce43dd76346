"""Oracle-parity tests for the core reference-shaped queries
(SURVEY.md §5: oracle differential testing replaces the lab's
four-engine agreement)."""

from __future__ import annotations

import pytest

from tests.conftest import run_parity


@pytest.mark.parametrize(
    "name",
    [
        "q1_agg_by_type",
        "q2_town_month_rollup",
        "q3_yoy_window",
        "q4_top_nations_percentiles",
    ],
)
def test_core_query_parity(spark, ddb, name):
    pdf = run_parity(spark, ddb, name)
    assert len(pdf) > 0


def test_q4_approx_close_to_exact(spark, ddb):
    """A10 tolerance check: approx_percentile within 5% of exact p50
    (the lab's CH-vs-PG exact/approx pairing, q4 README.md:64 vs :222)."""
    from sql_engine_triangle_spark.queries import registry
    from tests.conftest import SF_DIR

    approx = (
        registry.get("q4_approx_percentiles")
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("nation")
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
