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


EVENTS_TOUCHING = [
    "w_moving_avg",
    "f_json_extract",
    "asof_purchase_attribution",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
]


@pytest.mark.parametrize("name", EVENTS_TOUCHING)
def test_events_queries_on_driver_like_session(spark, name):
    """The CORRECTNESS driver builds its OWN SparkSession, without
    session.get_spark's builder confs — round 1 lost six entries to
    PARQUET_TYPE_ILLEGAL because nanosAsLong only existed in the
    builder. catalog.load_table must now force the conf itself, so an
    events query has to survive a session where the conf is wrong."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = registry.get(name).fn(s2, SF_DIR)
    assert df.count() >= 0
    assert dict(df.dtypes).get("ts", "timestamp") != "bigint"


PARALLELISM_SENSITIVE = [
    # shuffle-heavy or accumulation-order-prone entries: results must
    # be identical under a different partition count (emulating a
    # different executor layout at scale)
    "text_boilerplate_strip",
    "merge_upsert_snapshot",
    "w_latest_per_key",
    "a_stats_moments",
    "text_repetition_ratio",
    # r5: iterative integer algorithms (per-iteration aggregation
    # layout must not leak into results), bitmap tiles (bit_or merge
    # order), the EMA fold (sort-before-fold), and an Arrow kernel
    # (per-cluster group content must be partitioning-invariant).
    "graph_pagerank",
    "ml_kmeans_int",
    "a_bitmap_distinct",
    "w_ema_int",
    "sim_knn_join_arrow",
]


@pytest.mark.parametrize("name", PARALLELISM_SENSITIVE)
def test_partition_count_independence(spark, name):
    """Same rows under shuffle.partitions=5 as under the default 32 —
    partition-layout-independent results are what make reruns and
    cluster-resize safe."""
    fn = registry.get(name).fn
    base = fn(spark, SF_DIR).toPandas()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        alt = fn(spark, SF_DIR).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    from tests.conftest import assert_frames_match

    assert_frames_match(base, alt)
