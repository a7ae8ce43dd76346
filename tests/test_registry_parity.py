"""Generic oracle-parity sweep: every registered query with an oracle
is differentially tested against DuckDB; oracle-less (sketch/stream/
stub) entries get a rows-and-schema smoke check."""

from __future__ import annotations

import pytest

from sql_engine_triangle_spark.queries import registry
from tests.conftest import SF_DIR, run_parity

ORACLE_NAMES = [n for n in registry.names() if registry.get(n).oracle is not None]
ROWS_ONLY_NAMES = [n for n in registry.names() if registry.get(n).oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, ddb, name):
    run_parity(spark, ddb, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_smoke(spark, name):
    df = registry.get(name).fn(spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0
