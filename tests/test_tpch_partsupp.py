"""Differential tests for the four partsupp-bound TPC-H shapes
(Q2/Q11/Q16/Q20) — completing 22/22 classic shapes locally.

The driver's testdata carries no partsupp table, so these run
against the deterministic micro-fixture
``fixtures.generate.partsupp``: generated once per session at
sf0.001 scale (200 parts x 4 offers), written to a tmp parquet dir
that BOTH engines read — Spark via the query builders, DuckDB via a
view over the same files. The four query builders are intentionally
outside the driver registry (the external driver would fail them on
the missing table)."""

from __future__ import annotations

import duckdb
import pytest

from sql_engine_triangle_spark.catalog import TABLES, table_path
from sql_engine_triangle_spark.fixtures.generate import partsupp
from sql_engine_triangle_spark.queries.tpch_partsupp import PARTSUPP_QUERIES
from tests.conftest import SF_DIR_SMALL, assert_frames_match


@pytest.fixture(scope="module")
def ps_path(spark, tmp_path_factory):
    n_parts = spark.read.parquet(table_path(SF_DIR_SMALL, "part")).count()
    n_supp = spark.read.parquet(table_path(SF_DIR_SMALL, "supplier")).count()
    out = str(tmp_path_factory.mktemp("partsupp") / "partsupp.parquet")
    partsupp(spark, n_parts, n_supp).write.parquet(out)
    return out


@pytest.fixture(scope="module")
def ddb_ps(ps_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR_SMALL, t)}')"
        )
    con.execute(
        f"CREATE VIEW partsupp AS SELECT * FROM read_parquet('{ps_path}/*.parquet')"
    )
    yield con
    con.close()


def test_partsupp_fixture_shape(spark, ps_path):
    ps = spark.read.parquet(ps_path)
    n_parts = spark.read.parquet(table_path(SF_DIR_SMALL, "part")).count()
    assert ps.count() == n_parts * 4
    # 4 DISTINCT suppliers per part (the TPC-H multiplicity) and keys
    # inside the supplier domain.
    from pyspark.sql import functions as F

    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("n")
    )
    assert per_part.filter(F.col("n") != 4).count() == 0
    n_supp = spark.read.parquet(table_path(SF_DIR_SMALL, "supplier")).count()
    bad = ps.filter(
        (F.col("ps_suppkey") < 0) | (F.col("ps_suppkey") >= n_supp)
    )
    assert bad.count() == 0


def test_partsupp_fixture_deterministic(spark):
    a = partsupp(spark, 50, 10).toPandas().sort_values(
        ["ps_partkey", "ps_suppkey"]
    )
    b = (
        partsupp(spark, 50, 10)
        .repartition(7)
        .toPandas()
        .sort_values(["ps_partkey", "ps_suppkey"])
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


@pytest.mark.parametrize("name", sorted(PARTSUPP_QUERIES))
def test_partsupp_query_parity(spark, ddb_ps, ps_path, name):
    fn, oracle = PARTSUPP_QUERIES[name]
    spark_pdf = fn(spark, SF_DIR_SMALL, ps_path).toPandas()
    oracle_pdf = ddb_ps.execute(oracle).fetchdf()
    assert len(spark_pdf) > 0, f"{name}: degenerate empty result"
    assert_frames_match(spark_pdf, oracle_pdf)
