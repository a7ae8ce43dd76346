"""Structural invariants for the round-4 curation ops (semantic
dedup, cluster-bounded kNN join, shard layout). Oracle parity for the
same entries runs in the generic registry sweep; these tests pin the
properties parity alone can't see (clustering sanity, rank bounds,
layout balance, partition-count independence)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.operators import similarity
from sql_engine_triangle_spark.queries import registry
from tests.conftest import SF_DIR_SMALL, assert_frames_match


def test_seed_assignment_covers_all_vectors(spark):
    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    asg = similarity.seed_centroid_assign(emb, k=8).select("vec_id", "cid").toPandas()
    assert len(asg) == emb.count()
    assert asg["cid"].between(0, 7).all()
    # each seed vector is its own nearest centroid (cos=1 with itself)
    seeds = asg.nsmallest(8, "vec_id").sort_values("vec_id")
    assert list(seeds["cid"]) == list(range(8))


def test_semantic_dedup_keep_semantics(spark):
    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    res = similarity.semantic_dedup(emb, k=8, eps=0.45).toPandas()
    assert len(res) == emb.count()
    # the lowest vec_id of every cluster can never be pruned
    firsts = res.sort_values("vec_id").groupby("cid").head(1)
    assert firsts["keep"].all()
    # pruned rows must actually have an earlier >= eps neighbor in-cluster
    pairs = similarity.cosine_pairs(emb, threshold=0.45).toPandas()
    cid = dict(zip(res["vec_id"], res["cid"]))
    dropped = set(res.loc[~res["keep"], "vec_id"])
    witnessed = {
        int(r.vec_b)
        for r in pairs.itertuples()
        if cid[r.vec_a] == cid[r.vec_b]
    } | {
        int(r.vec_a)
        for r in pairs.itertuples()
        if cid[r.vec_a] == cid[r.vec_b]
    }
    assert dropped <= witnessed


def test_knn_join_rank_bounds(spark):
    emb = load_table(spark, SF_DIR_SMALL, "embeddings")
    res = similarity.knn_join(emb, k=8, n_neighbors=3).toPandas()
    assert res["rank"].between(1, 3).all()
    # per vec_id: ranks are 1..m with no gaps, cos_sim non-increasing
    for _, g in res.groupby("vec_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["cos_sim"].diff().dropna() <= 1e-12).all()
    # a vector never lists itself
    assert (res["vec_id"] != res["nbr_id"]).all()


def test_shard_layout_balance_and_positions(spark):
    fn = registry.get("pipeline_shard_layout").fn
    res = fn(spark, SF_DIR_SMALL).toPandas()
    docs = load_table(spark, SF_DIR_SMALL, "documents").count()
    assert len(res) == docs
    assert res["doc_id"].is_unique
    # positions are contiguous 1..n within each shard
    for _, g in res.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
        gg = g.sort_values("pos")
        assert gg["file_idx"].is_monotonic_increasing
    # md5 % 8 balances shards: no shard holds more than 3x its fair share
    counts = res.groupby("shard").size()
    assert counts.max() <= 3 * (docs / 8)


def test_curation_partition_count_independence(spark):
    """Window + join results identical under a different shuffle
    layout (cluster-resize safety)."""
    for name in ("dedup_semantic", "sim_knn_join", "pipeline_shard_layout"):
        fn = registry.get(name).fn
        base = fn(spark, SF_DIR_SMALL).toPandas()
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            alt = fn(spark, SF_DIR_SMALL).toPandas()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert_frames_match(base, alt)
