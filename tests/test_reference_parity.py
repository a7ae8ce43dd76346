"""Reference-shaped fixture generation + the lab's literal Q1-Q4
differentially tested against DuckDB on that fixture
(FIXTURES.md §1/§5; the four-engine agreement, Spark-vs-DuckDB form)."""

from __future__ import annotations

import duckdb
import pytest

from sql_engine_triangle_spark.fixtures import generate as G
from sql_engine_triangle_spark.queries.reference_parity import REFERENCE_QUERIES
from tests.conftest import assert_frames_match

N_ROWS = 60_000
SEED = 42


@pytest.fixture(scope="session")
def property_sales_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ref_fixture") / "property_sales")
    G.property_sales(spark, N_ROWS, SEED).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="session")
def ref_ddb(property_sales_path):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW property_sales AS "
        f"SELECT * FROM read_parquet('{property_sales_path}/*.parquet')"
    )
    yield con
    con.close()


def test_generation_is_deterministic(spark):
    a = G.property_sales(spark, 1000, SEED).toPandas()
    b = G.property_sales(spark, 1000, SEED).toPandas()
    assert a.equals(b)
    c = G.property_sales(spark, 1000, SEED + 1).toPandas()
    assert not a.equals(c)


def test_fixture_shape_and_probes(spark, property_sales_path):
    ps = spark.read.parquet(property_sales_path)
    probes = G.compute_probes(ps, "date", ["postcode1", "type", "town", "county"])
    assert probes["n_rows"] == N_ROWS
    assert probes["n_type"] == 5
    assert probes["n_town"] == 20
    assert str(probes["min_date"]) >= "1995-01-01"
    # county nullable ~2% (q4 prerequisite)
    nulls = ps.filter(ps.county.isNull()).count()
    assert 0 < nulls < N_ROWS * 0.05
    # q2 towns must carry high mass (zipf head)
    london = ps.filter(ps.town == "LONDON").count()
    assert london > N_ROWS / 20


@pytest.mark.parametrize("name", sorted(REFERENCE_QUERIES))
def test_reference_query_parity(spark, ref_ddb, name, property_sales_path):
    fn, sql = REFERENCE_QUERIES[name]
    spark_pdf = fn(spark, property_sales_path).toPandas()
    oracle_pdf = ref_ddb.execute(sql).fetchdf()
    assert len(spark_pdf) > 0
    assert_frames_match(spark_pdf, oracle_pdf)


def test_retail_sales_and_user_events_shapes(spark):
    rs = G.retail_sales(spark, 2000, SEED)
    assert dict(rs.dtypes)["price"] == "decimal(10,2)"
    assert dict(rs.dtypes)["created_at"] == "timestamp"
    assert rs.count() == 2000

    ue = G.user_events(spark, 2000, SEED)
    assert ue.count() == 2000
    late = ue.filter("event_time < timestamp'2024-01-01'").count()
    assert late >= 0  # late events pulled before window start exist or not; shape check
    assert dict(ue.dtypes)["event_time"] == "timestamp"
